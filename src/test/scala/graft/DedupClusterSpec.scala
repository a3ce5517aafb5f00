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
}
