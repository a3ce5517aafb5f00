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
    // this corpus genuinely exercises the cap: each band's largest
    // bucket exceeds MinhashMaxBucket (sf0.01: 161 and 141 vs cap 50
    // under the round-7 mod-p permutation family),
    // so the occupancy query demonstrably SEES what the cap drops — a
    // vacuous >= 1 here could not catch an occupancy regression
    val perBandMax = occ.groupBy("bi").agg(max(col("n_docs")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perBandMax.size == DedupOps.MinhashBands.toInt)
    perBandMax.foreach { case (bi, m) =>
      assert(m > DedupOps.MinhashMaxBucket,
        s"band $bi max bucket $m no longer exceeds the ${DedupOps.MinhashMaxBucket} cap — " +
          "either the corpus changed or the occupancy query stopped seeing hot buckets")
    }
    // and the verified-pair threshold still finds real near-dup pairs
    // AFTER those hot buckets are dropped
    val verified = DedupOps.dedupMinhashLsh(spark, dir)
      .filter(col("n_match") >= 12).count()
    assert(verified > 0)
  }
}
