package graft

/** Semantic (not parity) assertions for `ann_recall_at_k` — the oracle
  * gate proves both engines compute the same recall table; this proves
  * the table says something true about the index family:
  * the trained coarse quantizer must beat raw label buckets, and the
  * measurement must be non-vacuous in both directions (some hits, some
  * misses — a recall audit that only ever reads 0.0 or 1.0 is not
  * measuring anything). */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("ann_recall_at_k")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("shape: 50 probe queries per method, recall6 consistent with hits") {
    val byMethod = rows.groupBy(_._1)
    assert(byMethod.keySet == Set("ivf_kmeans", "ivf_label"))
    byMethod.foreach { case (m, rs) =>
      assert(rs.length == 50, s"$m: ${rs.length} rows")
      assert(rs.map(_._2).distinct.length == 50, s"$m: duplicate qids")
    }
    rows.foreach { case (m, q, hits, rec) =>
      assert(hits >= 0 && hits <= 3, s"$m/$q hits=$hits")
      assert(math.abs(rec - math.rint(hits / 3.0 * 1e6) / 1e6) < 1e-9,
        s"$m/$q recall6=$rec inconsistent with hits=$hits")
    }
  }

  test("trained cells recall more than raw label buckets") {
    def mean(m: String) = {
      val v = rows.filter(_._1 == m).map(_._4); v.sum / v.length
    }
    val (km, lb) = (mean("ivf_kmeans"), mean("ivf_label"))
    // measured ≈0.43 vs ≈0.09 at this SF — the empirical case for
    // training the coarse quantizer; require a 2× margin so the
    // assertion survives data refreshes without becoming vacuous
    assert(km > 2 * lb, s"ivf_kmeans $km not > 2x ivf_label $lb")
    assert(km >= 0.2, s"ivf_kmeans mean recall $km suspiciously low")
  }

  test("the audit is non-vacuous: both methods have hits AND misses") {
    Seq("ivf_kmeans", "ivf_label").foreach { m =>
      val rs = rows.filter(_._1 == m)
      assert(rs.exists(_._3 > 0), s"$m never hits — audit broken")
      assert(rs.exists(_._4 < 1.0), s"$m always perfect — audit vacuous")
    }
  }
}
