package graft

import graft.ops.DedupOps

/** Connected-components loop unit tests on known graphs — the oracle
  * gate cross-checks the full dedup_cluster_reps query against DuckDB's
  * recursive closure; these pin the iterative algorithm itself on
  * shapes the corpus may not produce (chains, merges, singleton pairs).
  */
class DedupClusterSpec extends SparkSpec {

  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("disjoint pairs, a chain, and a merge resolve to min-id labels") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, merge 20-21 + 21-22 + 20-22
    val got = cc((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (pointer jumping beats the diameter)") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = cc(chain: _*)
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("reversed and duplicate edges are harmless") {
    val got = cc((5L, 3L), (3L, 5L), (5L, 3L), (3L, 1L))
    assert(got == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  // --- large-star/small-star alternation (the adversarial-chain path) ---

  test("star contraction: 1k-node shuffled chain converges in < 12 alternations") {
    import spark.implicits._
    // a 1000-node path whose ids are a seeded shuffle — the component
    // minimum sits at a random interior position, so naive min
    // propagation would need ~O(500) rounds; star contraction must
    // finish logarithmically
    val rnd = new scala.util.Random(42)
    val ids = rnd.shuffle((1L to 1000L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val (labels, alternations) = DedupOps.connectedComponentsStar(edges.toDF("a", "b"))
    assert(alternations < 12, s"took $alternations alternations")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1000 && got.values.forall(_ == 1L),
      s"labels not all 1: ${got.values.toSet}")
  }

  test("star contraction handles merges, duplicates, and empty input") {
    import spark.implicits._
    val (labels, _) = DedupOps.connectedComponentsStar(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
        (20L, 21L), (21L, 22L), (20L, 22L), (22L, 20L), (5L, 3L))
        .toDF("a", "b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    val (empty, n) = DedupOps.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(empty.count() == 0 && n == 0)
  }

  test("star contraction agrees with min-label propagation on the real pair graph") {
    val verified = DedupOps.dedupMinhashLsh(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("n_match") >= 12)
      .select("a", "b")
    val prop = DedupOps.connectedComponents(verified)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val (starLabels, _) = DedupOps.connectedComponentsStar(verified)
    val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(prop.nonEmpty && prop == star)
  }

  test("leakage-safe split: no verified near-dup pair straddles a split boundary") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val split = DedupOps.corpusSplitLeakageSafe(spark, dir)
      .select(col("doc_id"), col("split")).cache()
    // THE property: both members of every verified pair share a split —
    // by construction (shared group key), but assert it end-to-end
    val pairs = DedupOps.dedupMinhashLsh(spark, dir)
      .filter(col("n_match") >= DedupOps.MinhashClusterMatches)
      .select(col("a"), col("b"))
    assert(pairs.count() > 0, "no verified pairs — the test is vacuous")
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa"), "a")
      .join(split.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb"), "b")
      .filter(col("sa") =!= col("sb"))
    assert(straddling.count() == 0)
    // exhaustive + disjoint: one assignment per document
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(split.count() == nDocs)
    assert(split.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // ratios near 80/10/10 (hash variance at 500 group keys is wide —
    // just pin that all three splits exist and train dominates)
    val byPart = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPart.keySet == Set("train", "val", "test"))
    assert(byPart("train") > byPart("val") && byPart("train") > byPart("test"))
  }
}
