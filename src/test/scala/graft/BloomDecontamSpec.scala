package graft

import org.apache.spark.sql.Row

import ops.TextOps

/** Contracts of the bloom-filter decontamination screen
  * (`dedup_decontaminate_bloom`): exact equivalence to the broadcast
  * twin (the no-false-negative + confirm-join theorem the shared
  * oracle also pins), a measured candidate-selectivity bound (the
  * bloom must actually screen, or the confirm join degenerates to the
  * full corpus join), and the scalar-subquery plan shape.
  */
class BloomDecontamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def sorted(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("bloom pre-screen + exact confirm equals the broadcast-set screen") {
    val exact = TextOps.dedupDecontaminate(spark, sfDir).collect()
    val bloom = TextOps.dedupDecontaminateBloom(spark, sfDir).collect()
    assert(exact.nonEmpty, "fixture yields no contaminated docs — test is vacuous")
    assert(sorted(exact) == sorted(bloom))
  }

  test("the bloom actually screens: candidate spans ≈ true hits + small FP tail") {
    // re-derive the stage boundary the query hides: how many training
    // spans pass might_contain vs how many truly match. With 10
    // bits/item the FP rate is ~1%, so candidates must be well under
    // 10% of the training spans (on this corpus true hits are rare).
    // Register the train/heldout views THIS test depends on (they are
    // a side effect of running the bloom entry) — without this the
    // test only passed when the equivalence test ran first in the
    // same session, an ordering dependency a testOnly -z filter or
    // suite parallelization would expose.
    TextOps.dedupDecontaminateBloom(spark, sfDir).count()
    val grams = spark.sql(
      """SELECT doc_id, ngram FROM graft_decontam_train""")
    val trainSpans = grams.count()
    val candidates = spark.sql(s"""
      SELECT count(*) AS n FROM graft_decontam_train
      WHERE graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(ngram), ${64 * 1024}L, ${640 * 1024}L)
         FROM graft_decontam_heldout),
        xxhash64(ngram))""").head.getLong(0)
    val trueHits = spark.sql(
      """SELECT count(*) AS n FROM graft_decontam_train t
         WHERE EXISTS (SELECT 1 FROM graft_decontam_heldout h
                       WHERE h.ngram = t.ngram)""").head.getLong(0)
    assert(candidates >= trueHits, "bloom produced a false negative — impossible")
    val fpTail = candidates - trueHits
    assert(fpTail <= math.max(50L, trainSpans / 20),
      s"bloom FP tail $fpTail of $trainSpans training spans — " +
        "filter is not screening (sizing bug?)")
  }

  test("the bloom rides as a scalar subquery, not a join on the training side") {
    val df = TextOps.dedupDecontaminateBloom(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the screen stage must reference the bloom via a (reused) subquery
    // result, and the only joins in the plan are the confirm join +
    // aggregation — no join BEFORE the might_contain filter
    assert(plan.contains("graft_might_contain") || plan.contains("might_contain"),
      plan.take(2000))
    assert(plan.contains("Subquery") || plan.contains("subquery"), plan.take(2000))
  }
}
