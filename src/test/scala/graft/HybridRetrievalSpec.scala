package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Filtered ANN search + hybrid RRF fusion — the serving-side retrieval
  * composites. Properties, not golden values: the CORRECTNESS gate
  * hash-matches the full results against DuckDB; these cases pin the
  * semantic contracts the hash cannot articulate (predicate containment,
  * rank-only fusion, arm provenance).
  */
class HybridRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filtered top-k returns only candidates satisfying the predicate") {
    val res = SimilarityOps.annFilteredTopk(spark, dir).cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val offLang = res.join(docs, res("nid") === docs("doc_id"))
      .filter(col("lang") =!= SimilarityOps.FilteredLang).count()
    assert(offLang == 0, s"$offLang neighbors violate the lang predicate")
    // per-query k bound
    val overK = res.groupBy("qid").count()
      .filter(col("count") > SimilarityOps.FilteredTopK).count()
    assert(overK == 0)
    // the predicate must actually bite: the filtered neighbor set differs
    // from the unfiltered same-bucket search for at least one query
    // (vacuously-green filters are the failure mode this pin excludes)
    val unfiltered = SimilarityOps.annIvfLabel(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = res.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered != unfiltered, "filter excluded nothing — predicate dead")
    res.unpersist()
  }

  test("filtered search pre-filters via a semi-join, not post-filtering") {
    val plan = SimilarityOps.annFilteredTopk(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"expected a semi-join applying the predicate to the index side:\n$plan")
  }

  test("RRF fusion: provenance, rank bounds, and the score formula") {
    val rows = SimilarityOps.retrievalHybridRrf(spark, dir).collect()
    assert(rows.nonEmpty)
    val k = SimilarityOps.RrfK
    rows.foreach { r =>
      val (dRk, lRk) = (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
      // every fused row came from at least one arm, within that arm's k
      assert(dRk.nonEmpty || lRk.nonEmpty, s"orphan fused row: $r")
      assert(dRk.forall(x => x >= 1 && x <= SimilarityOps.HybridArmK))
      assert(lRk.forall(x => x >= 1 && x <= SimilarityOps.HybridArmK))
      // the score is exactly the two-term RRF sum of the carried ranks
      val expect = BigDecimal(
        dRk.map(x => 1.0 / (k + x)).getOrElse(0.0) +
          lRk.map(x => 1.0 / (k + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - expect) < 1e-9,
        s"rrf6 ${r.getDouble(4)} != recomputed $expect for $r")
    }
    // both arms matter: the fused lists must contain dense-only rows,
    // lexical-only rows, AND doubly-ranked rows — otherwise the fusion
    // degenerates to a single arm and the entry proves nothing
    def cls(r: org.apache.spark.sql.Row) = (r.isNullAt(2), r.isNullAt(3))
    assert(rows.exists(cls(_) == (false, true)), "no dense-only rows")
    assert(rows.exists(cls(_) == (true, false)), "no lexical-only rows")
    assert(rows.exists(cls(_) == (false, false)), "no doubly-ranked rows")
  }

  test("RRF ranking is monotone in the fused score within each query") {
    val rows = SimilarityOps.retrievalHybridRrf(spark, dir)
      .select("qid", "rk", "rrf6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRk = g.sortBy(_._2).map(_._3)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"rrf6 not non-increasing in rk: ${byRk.mkString(",")}")
    }
  }
}
