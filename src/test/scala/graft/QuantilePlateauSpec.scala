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
