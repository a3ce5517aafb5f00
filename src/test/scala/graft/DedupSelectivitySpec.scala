package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Regression guards for LSH selectivity — the property that makes the
  * near-dup path sub-quadratic in practice, not just in shape. Round 2
  * shipped banding that retained 41% of ALL pairs as candidates
  * (51,052 of 124,750 at sf0.01) while every oracle stayed green: hash
  * parity cannot catch a selectivity regression, only a count bound
  * can. */
class DedupSelectivitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("minhash banding keeps candidates far below all-pairs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val allPairs = docs * (docs - 1) / 2
    val candidates = DedupOps.dedupMinhashLsh(spark, dir).count()
    // round-3 banding yields ~2.4k of 124,750 (2%); the guard allows
    // headroom but fails long before quadratic retention (r2 was 41%)
    assert(candidates < allPairs / 10,
      s"$candidates candidates of $allPairs pairs — banding has gone quadratic")
    assert(candidates > 0, "banding produces no candidates at all")
  }

  test("band occupancy surfaces capped degenerate buckets") {
    val occ = DedupOps.minhashBandOccupancy(spark, dir)
    // the synthetic corpus produces at least one oversized bucket per
    // band; the occupancy query is what makes that visible
    val maxBucket = occ.agg(max(col("n_docs"))).collect()(0).getLong(0)
    assert(maxBucket >= 1)
    // and the verified-pair threshold still finds real near-dup pairs
    val verified = DedupOps.dedupMinhashLsh(spark, dir)
      .filter(col("n_match") >= 12).count()
    assert(verified > 0)
  }
}
