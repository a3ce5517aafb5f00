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

  test("grouped kernel: a plateau straddling ONE group's boundary moves nothing, ranks included") {
    import spark.implicits._
    // three languages, one adversarial: "en" carries the 50%-plateau
    // shape (its boundary lands ON the plateau, so its candidate slice
    // would be ~51% of the group — the shape the salted two-stage form
    // exists to keep out of any single window), "fr" is benign, "de"
    // is all-ties (the cut happens entirely inside a plateau). The
    // grouped kernel must reproduce the per-group exact rank result —
    // including the rk column — on all three at once.
    val df = spark.range(100000).select(col("id"),
      when(col("id") % 10 < 6, lit("en"))
        .when(col("id") % 10 < 9, lit("fr")).otherwise(lit("de")).as("lang"),
      when(col("id") % 10 >= 9, lit(7L)) // de: everything ties (k from plateau alone)
        .when(col("id") % 10 >= 6, col("id") % 1000) // fr: benign spread
        // en (60k rows): head = 300 rows (0.5% — LESS than k=600, so the
        // selection must cut INTO the plateau), plateau ≈ 59% of en, so
        // the screen boundary lands ON the plateau and the naive ≥b
        // slice would be ~59% of the group
        .when(col("id") < 500, lit(1000L) + col("id") % 7)
        .when(col("id") < 60000, lit(500L))
        .otherwise(col("id") % 400).as("len"))
      .persist()
    val got = graft.ops.TextOps
      .quantileTopFractionByGroup(df, "lang", "len", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy("lang").orderBy(col("len").desc, col("id"))
    val kk = df.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.01).toLong).toMap
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .filter { case (g, _, _, rk) => rk <= kk(g) }.toSet
    assert(got == want, "grouped selection must equal the per-group exact rank result")
    // and the adversarial group really was adversarial: en's boundary
    // sits on the plateau, so its ≥b slice is plateau-inflated
    val bEn = df.filter(col("lang") === "en")
      .agg(expr("approx_percentile(len, 0.985D, 10000)")).head().getLong(0)
    assert(bEn == 500L, s"en's screen boundary must land ON the plateau (got $bEn)")
    df.unpersist()
  }

  test("grouped kernel: an all-null group selects nothing; others are unaffected") {
    import spark.implicits._
    val df = spark.range(20000).select(col("id"),
      when(col("id") % 2 === 0, lit("xx")).otherwise(lit("en")).as("lang"),
      when(col("id") % 2 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 997).as("len")).persist()
    val got = graft.ops.TextOps
      .quantileTopFractionByGroup(df, "lang", "len", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // xx has no selectable rows — excluded before k is counted, so it
    // neither trips the superset guard nor emits rows
    assert(got.nonEmpty && got.forall(_._1 == "en"))
    val kEn = math.ceil(10000 * 0.01).toLong
    assert(got.size == kEn.toInt)
    df.unpersist()
  }

  test("empty or all-null input fails the ungrouped kernels loudly, not with an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "len")
    val allNull = spark.range(100)
      .select(col("id"), lit(null).cast("long").as("len"))
    Seq[org.apache.spark.sql.DataFrame => Any](
      d => graft.ops.TextOps.quantileTopFraction(d, "len", "id"),
      d => graft.ops.TextOps.quantileTopFractionPlateauAware(d, "len", "id")
    ).foreach { kernel =>
      Seq(empty, allNull).foreach { d =>
        val e = intercept[IllegalArgumentException](kernel(d))
        assert(e.getMessage.contains("non-null len"), e.getMessage)
      }
    }
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
