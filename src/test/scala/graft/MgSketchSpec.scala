package graft

import org.apache.spark.sql.functions._

import ops.TextOps

/** Measured contracts of the Misra–Gries frequent-items sketch
  * (graft.functions.MgSketch) — the detection theorem and error bound
  * as executable properties, per the round-7 lesson that hash-parity
  * gates cannot catch a broken sketch (the two-pass catalog entry
  * would stay oracle-green even if the sketch silently kept the wrong
  * candidates, as long as recall held by luck).
  */
class MgSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val k = TextOps.HhSketchK

  private lazy val items = TextOps.hhItems(spark, sfDir).select("item")
  private lazy val exact: Map[String, Long] =
    items.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  private lazy val n: Long = exact.values.sum
  private lazy val sketch: Map[String, Long] =
    items.agg(expr(s"mg_sketch(item, $k)").as("sk"))
      .select(explode(col("sk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sketch is bounded at k counters and actually sheds the rare tail") {
    assert(exact.size > k, s"fixture stream has only ${exact.size} distinct items")
    assert(sketch.size <= k, s"sketch kept ${sketch.size} > $k counters")
    // non-vacuity: on a ~500-item stream a 64-counter summary must be
    // at (or within rounding of) its budget, not nearly empty
    assert(sketch.size > k / 2, s"sketch kept only ${sketch.size} counters")
  }

  test("every item above N/(k+1) survives the sketch — the MG detection theorem") {
    val mustSurvive = exact.filter { case (_, c) => c * (k + 1L) > n }.keySet
    assert(mustSurvive.nonEmpty, "threshold too high for the fixture — vacuous test")
    val missing = mustSurvive -- sketch.keySet
    assert(missing.isEmpty, s"sketch lost guaranteed heavy hitters: $missing")
  }

  test("sketched counts are lower bounds with error at most N/(k+1)") {
    val bound = n / (k + 1L) + 1L
    sketch.foreach { case (item, est) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est <= truth, s"$item: estimate $est above true count $truth")
      assert(truth - est <= bound,
        s"$item: error ${truth - est} exceeds N/(k+1) = $bound")
    }
  }

  test("two-pass MG heavy hitters equals the exact twin row-for-row") {
    val exactRows = SparkEntry.queries("text_heavy_hitters")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val mgRows = SparkEntry.queries("text_heavy_hitters_mg")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(exactRows.nonEmpty, "exact twin returned no heavy hitters")
    assert(mgRows == exactRows,
      s"MG twin diverged: only-mg=${mgRows -- exactRows} only-exact=${exactRows -- mgRows}")
  }

  test("the builtin approx_top_k twin is exact at sub-capacity scale and covers the hitters") {
    val est = SparkEntry.queries("text_heavy_hitters_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 20)
    // ~500 distinct items sit far below the sketch's default tracked
    // capacity, so the DataSketches estimates must be exact counts and
    // the top-20 must contain every true heavy hitter
    val hitters = exact.filter { case (_, c) =>
      c * ops.TextOps.HhThreshold >= n }.keySet
    assert(hitters.subsetOf(est.keySet),
      s"approx_top_k missed hitters: ${hitters -- est.keySet}")
    est.foreach { case (item, c) =>
      assert(exact(item) == c, s"$item: estimate $c != exact ${exact(item)}")
    }
  }

  test("a degenerate over-tight budget still returns only true items with lower bounds") {
    // k' = 4 < the 8 hot items: MG may evict any candidate, but every
    // surviving (item, est) must still be a lower bound of a REAL item
    val tiny = items.agg(expr("mg_sketch(item, 4)").as("sk"))
      .select(explode(col("sk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny.size <= 4)
    tiny.foreach { case (item, est) =>
      assert(exact.contains(item), s"sketch invented item $item")
      assert(est <= exact(item))
    }
  }

  test("bad arity / non-foldable k raise analysis errors naming mg_sketch") {
    // ADVICE r7: the registration used to index children(1) blind —
    // mg_sketch(col) threw IndexOutOfBounds and mg_sketch(col, col)
    // an opaque ClassCast. Both must now be clear analysis errors.
    val oneArg = intercept[org.apache.spark.sql.AnalysisException] {
      items.agg(expr("mg_sketch(item)")).collect()
    }
    assert(oneArg.getMessage.contains("mg_sketch"), oneArg.getMessage)
    val colK = intercept[org.apache.spark.sql.AnalysisException] {
      items.agg(expr("mg_sketch(item, length(item))")).collect()
    }
    assert(colK.getMessage.contains("mg_sketch"), colK.getMessage)
  }
}
