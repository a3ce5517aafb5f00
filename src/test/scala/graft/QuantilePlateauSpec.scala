package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Adversarial-distribution tests for the screen-confirm quantile
  * selection kernel ([[graft.ops.TextOps.quantileTopFraction]]): the
  * gate proves it on the fixture's benign length distribution; these
  * prove the sketch-independence argument on the shapes that stress
  * it — tie plateaus straddling the boundary (the screen's candidate
  * superset widens, the RESULT must not move) and near-degenerate
  * distributions where almost everything ties. */
class QuantilePlateauSpec extends SparkSpec {

  private def exactTopK(df: org.apache.spark.sql.DataFrame, k: Long) = {
    val w = Window.orderBy(col("len").desc, col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("id", "len").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("a massive tie plateau at the boundary widens the superset, never the result") {
    import spark.implicits._
    // 100k rows: 50% sit on one plateau value (500) just below the top,
    // 1% strictly above it, the rest below — the 98.5th-percentile
    // screen lands ON the plateau, so candidates ≈ 51% of the data
    val n = 100000L
    val df = spark.range(n).select(col("id"),
      when(col("id") < 1000, lit(1000L) + col("id") % 7)
        .when(col("id") < 51000, lit(500L))
        .otherwise(col("id") % 400).as("len"))
      .persist()
    val k = math.ceil(n * 0.01).toLong
    val got = TextOps.quantileTopFraction(df, "len", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTopK(df, k), "plateau must not change the selected set")
    df.unpersist()
  }

  test("plateau EXACTLY AT the k-th rank: the id tie-break decides deterministically") {
    import spark.implicits._
    // top value shared by 5% of rows while k = 1% — the selection cuts
    // INSIDE the plateau and only the (len desc, id) tie-break orders it
    val n = 50000L
    val df = spark.range(n).select(col("id"),
      when(col("id") % 20 === 0, lit(999L)).otherwise(col("id") % 100).as("len"))
      .persist()
    val k = math.ceil(n * 0.01).toLong
    val got = TextOps.quantileTopFraction(df, "len", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exactTopK(df, k)
    assert(got == want)
    // the cut is inside the plateau: every selected row carries the
    // plateau value and the ids are the k smallest plateau members
    assert(got.forall(_._2 == 999L))
    assert(got.map(_._1) == (0L until n).filter(_ % 20 == 0).sorted.take(k.toInt).toSet)
    df.unpersist()
  }

  test("the plateau-aware twin selects the identical set on every stress shape") {
    import spark.implicits._
    // same three adversarial distributions; the twin must agree with
    // the simple kernel row-for-row (the catalog pair also shares one
    // oracle, so this equality is additionally gate-checked on the
    // fixture distribution)
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "boundary-plateau" -> spark.range(100000).select(col("id"),
        when(col("id") < 1000, lit(1000L) + col("id") % 7)
          .when(col("id") < 51000, lit(500L))
          .otherwise(col("id") % 400).as("len")),
      "cut-inside-plateau" -> spark.range(50000).select(col("id"),
        when(col("id") % 20 === 0, lit(999L)).otherwise(col("id") % 100).as("len")),
      "all-ties" -> spark.range(10000).select(col("id"), lit(7L).as("len")))
    shapes.foreach { case (name, df0) =>
      val df = df0.persist()
      val simple = TextOps.quantileTopFraction(df, "len", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val aware = TextOps.quantileTopFractionPlateauAware(df, "len", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(aware == simple, s"$name: twin diverged")
      df.unpersist(): Unit
    }
  }

  test("the twin never value-sorts the plateau: its ordered slice is screen-bounded") {
    import spark.implicits._
    // the twin's cost claim, executed: on the 50%-plateau shape the
    // simple kernel's sorted slice is ~51% of the table, the twin's
    // value-sorted side (A = {v > b}) is ~1% — the plateau contributes
    // only a narrow-column TakeOrdered by id
    val n = 100000L
    val df = spark.range(n).select(col("id"),
      when(col("id") < 1000, lit(1000L) + col("id") % 7)
        .when(col("id") < 51000, lit(500L))
        .otherwise(col("id") % 400).as("len")).persist()
    val b = df.agg(expr("approx_percentile(len, 0.985D, 10000)")).head().getLong(0)
    assert(b == 500L, s"the screen boundary must land ON the plateau (got $b)")
    val slice = df.filter(col("len") >= b).count()
    val aSide = df.filter(col("len") > b).count()
    assert(slice > n / 2, s"simple kernel's sorted slice = $slice (plateau-inflated)")
    assert(aSide <= (0.016 * n).toLong, s"twin's value-sorted side = $aSide (screen-bounded)")
    df.unpersist()
  }

  test("near-degenerate distribution (everything ties) still selects exactly k") {
    import spark.implicits._
    val n = 10000L
    val df = spark.range(n).select(col("id"), lit(7L).as("len")).persist()
    val k = math.ceil(n * 0.01).toLong
    val got = TextOps.quantileTopFraction(df, "len", "id")
      .collect().map(_.getLong(0)).toSet
    // all values equal: the screen keeps everything (maximal superset),
    // the tie-break selects the k smallest ids
    assert(got == (0L until k).toSet)
    df.unpersist()
  }
}
