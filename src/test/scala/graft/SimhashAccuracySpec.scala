package graft

/** Statistical contract of the SimHash sketch, measured by
  * `dedup_simhash_accuracy` (per LSH candidate pair: 32-bit Hamming
  * distance, observed bit-agreement fraction, TRUE token-set cosine).
  * Hash parity cannot catch a mis-built sketch — both engines compute
  * the same bits — so, as with MinHash and HLL, the detection theorem
  * becomes an executable property. Charikar's sign-random-projection
  * theorem says each bit agrees with probability 1 − θ/π where
  * cos θ = |A∩B| / √(|A|·|B|), so over 32 hyperplanes the observed
  * agreement fraction is a binomial estimate of 1 − θ/π (our
  * hyperplanes are md5-parity ±1 Rademacher signs, for which the
  * Gaussian theorem holds approximately in high dimension — measured
  * slack is part of the bound). The 32 hyperplanes are SHARED across
  * pairs, so per-pair errors are correlated and the corpus mean does
  * NOT shrink like 1/√n_pairs: bounds are sized to the 32-bit binomial
  * std √(p(1−p)/32) ≈ 0.07 at the observed p ≈ 0.85, not to n_pairs.
  * Measured at sf0.001: n=1800, bias −0.047, MAE 0.065. A degenerate
  * sketch (constant bits ⇒ hamming 0 everywhere ⇒ agree ≡ 1) reads
  * bias/MAE ≈ +0.15 and zero high/low-cosine separation — each bound
  * below fails it. */
class SimhashAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // (hamming, cos6, agree6)
  private lazy val rows =
    SparkEntry.queries("dedup_simhash_accuracy")(spark, dir)
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))

  test("internal consistency: agreement is a rendering of hamming") {
    assert(rows.nonEmpty, "no candidate pairs — banding broken upstream")
    rows.foreach { case (h, c, a) =>
      assert(h >= 0 && h <= 32, s"hamming $h outside [0, 32]")
      assert(c >= 0 && c <= 1, s"cosine $c outside [0, 1]")
      assert(math.abs(a - (32 - h) / 32.0) < 1e-5, s"agree6 $a != (32-$h)/32")
    }
    assert(rows.exists(_._1 > 0), "all sketches identical — degenerate")
    assert(rows.exists(_._1 <= 4), "no near-identical pair resolves as near")
  }

  test("agreement tracks the Charikar prediction 1 - acos(cos)/pi") {
    val n = rows.length
    val errs = rows.map { case (_, c, a) =>
      a - (1.0 - math.acos(math.min(1.0, c)) / math.Pi)
    }
    val bias = errs.sum / n
    val mae = errs.map(math.abs).sum / n
    assert(math.abs(bias) < 0.12, s"bias $bias outside (-0.12, 0.12)")
    assert(mae < 0.12, s"MAE $mae >= 0.12 — sketch no longer tracks angle")
  }

  test("hamming resolves similarity: high-cosine pairs agree more") {
    val sorted = rows.sortBy(_._2)
    val (lo, hi) = sorted.splitAt(sorted.length / 2)
    val loAgree = lo.map(_._3).sum / lo.length
    val hiAgree = hi.map(_._3).sum / hi.length
    assert(hiAgree > loAgree,
      s"agreement does not separate cosine halves: hi=$hiAgree lo=$loAgree")
  }
}
