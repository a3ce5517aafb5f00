package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Head-to-head growth study for the round-10 grouped-quantile rewrite,
  * on the exact regime the round-9 verdict called out: one HEAD
  * language carries 99% of the corpus and a tie plateau sits ON its
  * screen boundary, so the head's candidate slice is ~50% of the whole
  * corpus. The RETIRED shape (per-language `row_number` window over the
  * candidate slice — reconstructed here verbatim so the comparison
  * stays honest after the production code moved on) must push that
  * slice through ONE task's sort; the shipped kernel
  * ([[graft.ops.TextOps.quantileTopFractionByGroup]]) bounds every sort
  * by a salt cell or by salts·k survivors. Both compute the identical
  * selection (asserted per rung via count + checksum equality —
  * correctness is not the question, the single-task term is).
  *
  * Data is generated in-row from spark.range (no disk, any N):
  * 99% lang "en" / 1% "xx"; within en: 0.5% head values above the
  * plateau, ~50% plateau exactly at the 98.5th-percentile boundary,
  * the rest spread below; "xx" benign.
  *
  * Usage: QuantileSkewBench [n1,n2,...] [reps]
  * (defaults 2000000,10000000,40000000 / 3; pass-interleaved medians,
  * the SCALING.md protocol)
  */
object QuantileSkewBench {

  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"),
      when(pmod(col("id"), lit(100L)) < 99, lit("en")).otherwise(lit("xx")).as("lang"),
      when(pmod(col("id"), lit(100L)) >= 99, pmod(col("id"), lit(1000L)) + 2000L) // xx benign
        .when(pmod(col("id"), lit(200L)) === 0, lit(10000L) + pmod(col("id"), lit(7L))) // en head 0.5%
        .when(pmod(col("id"), lit(2L)) === 0, lit(5000L)) // en plateau ~50%
        .otherwise(pmod(col("id"), lit(400L))).as("len")) // en tail

  /** The RETIRED round-9 shape, kept ONLY here for the comparison:
    * bounds broadcast back, `len >= b` candidate filter, then one
    * `row_number` window PARTITIONED BY LANGUAGE over the candidates —
    * the window partition that cannot be split within a key. */
  def naive(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val boundRows = docs.groupBy("lang").agg(
      count(lit(1)).as("n"),
      expr("approx_percentile(len, 0.985D, 10000)").as("b")).collect()
    val bounds = boundRows.map { r =>
      (r.getString(0), r.getLong(2),
        math.max(1L, math.ceil(r.getLong(1) * 0.01).toLong))
    }.toSeq.toDF("lang", "b", "k")
    val cands = docs.join(broadcast(bounds), Seq("lang"))
      .filter(col("len") >= col("b"))
    val w = Window.partitionBy("lang").orderBy(col("len").desc, col("id"))
    cands.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= col("k"))
      .select("lang", "id", "len", "rk")
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(2000000L, 10000000L, 40000000L))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    corpus(spark, sizes.min).count(): Unit // warmup

    // per-rung correctness cross-check (once, outside the timed reps):
    // identical selected sets => identical (count, sum(len), sum(id))
    sizes.foreach { n =>
      val docs = corpus(spark, n)
      val a = naive(spark, docs)
        .agg(count(lit(1)).as("c"), sum("len").as("sl"), sum("id").as("si")).head()
      val b = graft.ops.TextOps.quantileTopFractionByGroup(docs, "lang", "len", "id")
        .agg(count(lit(1)).as("c"), sum("len").as("sl"), sum("id").as("si")).head()
      require(a == b, s"n=$n: kernels diverge: naive=$a salted=$b")
    }

    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val kernels: Seq[(String, Long => DataFrame)] = Seq(
      "naive_window" -> (n => naive(spark, corpus(spark, n))),
      "salted_two_stage" -> (n =>
        graft.ops.TextOps.quantileTopFractionByGroup(corpus(spark, n), "lang", "len", "id")))
    val samples = mutable.LinkedHashMap.empty[(String, Long), mutable.ArrayBuffer[Double]]
    for (_ <- 1 to reps; (kn, kf) <- kernels; n <- sizes) {
      val t0 = System.nanoTime()
      kf(n).write.mode("overwrite").format("noop").save()
      samples.getOrElseUpdate((kn, n), mutable.ArrayBuffer.empty) +=
        (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val med = kernels.map { case (kn, _) =>
      val inner = sizes.map(n => s""""$n":${fm(median(samples((kn, n)).toSeq))}""")
        .mkString("{", ",", "}")
      s""""$kn":$inner"""
    }.mkString("{", ",", "}")
    val raw = samples.map { case ((kn, n), v) =>
      s""""$kn:$n":${v.map(fm).mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
    println(s"""{"study":"quantile_skew","medians":$med,"samples":$raw,"reps":$reps}""")
    spark.stop()
  }
}
