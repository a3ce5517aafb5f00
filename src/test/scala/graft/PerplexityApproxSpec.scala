package graft

/** Accuracy contract for `text_perplexity_bucket_approx`, the second
  * rows-only catalog entry (exact/approx twin policy — see
  * ApproxDistinctSpec for the first).
  *
  * `approx_percentile` (Greenwald–Khanna) guarantees rank error ≤
  * n/accuracy. With accuracy=10000 and a test corpus of n < 10000
  * docs the sketch retains every value, so the only divergence from
  * the exact `percentile` twin is interpolation-vs-sample-value at
  * the two thresholds: the sketch returns an observed sample where
  * the exact form may interpolate between two samples. That shifts a
  * bucket boundary past AT MOST ONE document per threshold, and any
  * shifted document moves to an ADJACENT bucket only. Both halves are
  * pinned here; a regression in either the sketch accuracy knob or
  * the threshold rounding discipline breaks this suite, not the
  * (absent by design) DuckDB hash check.
  */
class PerplexityApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx bucketing diverges from the exact twin by at most 1 doc per boundary") {
    val exact = ops.TextOps.textPerplexityBucket(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    val approx = ops.TextOps.textPerplexityBucketApprox(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap

    assert(exact.keySet == approx.keySet,
      s"doc sets differ: ${(exact.keySet diff approx.keySet).take(5)} / " +
        s"${(approx.keySet diff exact.keySet).take(5)}")
    assert(exact.nonEmpty, "empty corpus would make this contract vacuous")

    val rank = Map("tail" -> 0, "middle" -> 1, "head" -> 2)
    val moved = exact.keys.toSeq.filter(id => exact(id) != approx(id))
      .map(id => (id, exact(id), approx(id)))

    // adjacency: a threshold shift can only move a doc one bucket over
    moved.foreach { case (id, e, a) =>
      assert(math.abs(rank(e) - rank(a)) == 1,
        s"doc $id jumped non-adjacent buckets: exact=$e approx=$a")
    }
    // ≤ 1 doc per boundary: tail↔middle is the t33 boundary,
    // middle↔head is the t67 boundary
    val t33Moves = moved.count { case (_, e, a) => Set(e, a) == Set("tail", "middle") }
    val t67Moves = moved.count { case (_, e, a) => Set(e, a) == Set("middle", "head") }
    assert(t33Moves <= 1, s"t33 boundary moved $t33Moves docs: $moved")
    assert(t67Moves <= 1, s"t67 boundary moved $t67Moves docs: $moved")
  }

  test("approx buckets keep the head/middle/tail tercile structure") {
    val counts = ops.TextOps.textPerplexityBucketApprox(spark, dir).collect()
      .groupBy(_.getAs[String]("bucket")).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("head", "middle", "tail"),
      s"missing bucket(s): $counts")
    val n = counts.values.sum
    // terciles: each bucket holds roughly a third; a broken threshold
    // (e.g. t33 > t67) would empty one bucket entirely
    counts.foreach { case (b, c) =>
      assert(c > n / 5 && c < n / 2, s"bucket $b degenerate: $c of $n")
    }
  }
}
