package graft

import graft.ops.DedupOps

/** Statistical contract of the MinHash sketch, measured by
  * `dedup_minhash_accuracy` (estimated vs TRUE token-set Jaccard on the
  * LSH candidate pairs). Hash parity cannot catch a biased sketch —
  * both engines faithfully compute the same wrong number — which is
  * exactly how the pre-round-7 permutation collapse survived six green
  * rounds (no mod in g_i = h1 + i·h2 ⇒ ~2 effective permutations ⇒
  * mean est 0.98 vs true 0.59). These bounds would have failed loudly. */
class MinhashAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // (n_match, est6, true6, err6)
  private lazy val rows =
    SparkEntry.queries("dedup_minhash_accuracy")(spark, dir)
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("structural band guarantee: every candidate shares a full band") {
    assert(rows.nonEmpty, "no candidate pairs — banding broken")
    // a candidate pair exists BECAUSE some band's 8 minima all matched,
    // so its signature agreement is at least rows-per-band
    rows.foreach { case (nm, _, _, _) =>
      assert(nm >= DedupOps.MinhashRowsPerBand,
        s"candidate with n_match=$nm < band width ${DedupOps.MinhashRowsPerBand}")
    }
  }

  test("estimator is near-unbiased with sampling-noise-sized error") {
    val n = rows.length
    val bias = rows.map { case (_, e, t, _) => e - t }.sum / n
    val mae = rows.map(_._4).sum / n
    val meanEst = rows.map(_._2).sum / n
    // 16 permutations give per-pair std <= sqrt(J(1-J)/16) <= 0.125;
    // band selection conditions candidates on a matching band, which
    // biases est UP by a bounded amount (measured +0.08 here). The
    // collapsed pre-fix family read bias +0.40, MAE 0.40, mean est
    // 0.98 — each bound below fails it individually.
    assert(bias > -0.05 && bias < 0.2, s"bias $bias outside (-0.05, 0.2)")
    assert(mae < 0.15, s"MAE $mae >= 0.15 — sketch no longer tracks truth")
    assert(meanEst < 0.95, s"mean est $meanEst — permutation collapse signature")
    rows.foreach { case (_, e, t, _) =>
      assert(e >= 0 && e <= 1 && t > 0 && t <= 1, s"out-of-range est/true: $e, $t")
    }
  }
}
