package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Growth study for the CDC family on GENERATED keyed data — the
  * HH-trio protocol (pass-interleaved reps, median, log-log exponent)
  * applied to the two CDC kernels, so the full-outer MERGE and the
  * changelog compaction both carry a generated-corpus 3-point fit in
  * SCALING.md (MergeBench measures the merge alone; this tool runs
  * both kernels over the SAME synthetic changelog so the exponents are
  * comparable).
  *
  * The changelog generator derives a keyed multi-version stream from
  * `graft-docs` generated rows (zero disk behind it, any N reachable):
  * each of the n rows is one change record, keys are `doc_id % (n/8)`
  * (≈8 versions per key — the raw-changelog shape the compaction
  * exists for), except a 5% hot slice hashed onto 8 keys (the skew
  * regime the salted twin targets); `ts` is `timestamp_micros(doc_id)`
  * so versions are unique and monotone. Columns are named to the
  * events schema so the COMPACTION SAMPLE TIMES THE PRODUCTION
  * TRANSFORM OBJECT (`EventStreams.latestPerKey`) — not a
  * re-implementation that could drift.
  *
  * Usage: CdcBench [n1,n2,...] [reps]   (defaults 1000000,5000000,20000000 / 3)
  */
object CdcBench {

  /** n change records over ~n/8 keys with a 5% / 8-key hot slice. */
  def changelog(spark: SparkSession, n: Long): DataFrame = {
    val nKeys = math.max(1L, n / 8L)
    spark.read.format("graft-docs").option("n", n.toString).load()
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .select(
        when(pmod(col("doc_id"), lit(100L)) < 5,
          pmod(xxhash64(col("doc_id")), lit(8L)))
          .otherwise(pmod(col("doc_id"), lit(nKeys))).as("user_id"),
        timestamp_micros(col("doc_id")).as("ts"),
        col("doc_id").as("event_id"),
        col("lang").as("event_type"),
        (col("n_chars") / 100.0d).as("value"))
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(1000000L, 5000000L, 20000000L))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the merge inputs reuse MergeBench's recipe (snapshot keyed 1:1,
    // 10%-of-keyspace op batch) so this tool's merge points extend that
    // table under one protocol
    def snapshot(n: Long) = spark.read.format("graft-docs")
      .option("n", n.toString).load()
      .select(col("doc_id").as("key"),
        col("n_chars").cast("long").as("s_len"),
        col("lang").as("s_lang"))
    def changes(n: Long) = spark.read.format("graft-docs")
      .option("n", n.toString).load()
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .withColumn("m", pmod(xxhash64(col("doc_id")), lit(10L)))
      .filter(col("m") <= 0)
      .select(
        when(pmod(xxhash64(col("doc_id"), lit(1)), lit(3L)) === 2,
          col("doc_id") + lit(10000000000L)).otherwise(col("doc_id")).as("key"),
        when(pmod(xxhash64(col("doc_id"), lit(1)), lit(3L)) === 0, lit("delete"))
          .when(pmod(xxhash64(col("doc_id"), lit(1)), lit(3L)) === 1, lit("update"))
          .otherwise(lit("insert")).as("op"),
        (col("n_chars") + 1L).cast("long").as("c_len"),
        lit(null).cast("string").as("c_lang"))

    changelog(spark, sizes.min).count(): Unit // warmup: codegen + JIT

    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val kernels: Seq[(String, Long => DataFrame)] = Seq(
      "compact" -> (n => graft.streaming.EventStreams.latestPerKey(changelog(spark, n))),
      "merge" -> (n => graft.ops.MigrationOps.mergeBatch(
        snapshot(n), changes(n), Seq("len", "lang"))),
      // the change feed: diff the snapshot against its own merged
      // successor — BOTH versions are table-sized, the regime where the
      // FullOuter's two-sided serde exposure actually applies (the
      // ClusterBench fixture-scale point sat inside variance)
      "diff" -> { n =>
        val v0 = snapshot(n)
          .withColumnRenamed("s_len", "len").withColumnRenamed("s_lang", "lang")
        val v1 = graft.ops.MigrationOps.mergeBatch(
          snapshot(n), changes(n), Seq("len", "lang"))
        graft.ops.MigrationOps.tableDiff(v0, v1, Seq("len", "lang"))
      })
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
    // log-log exponent over the extreme sizes (the 3-point fit's slope)
    val exps = kernels.map { case (kn, _) =>
      val (lo, hi) = (sizes.min, sizes.max)
      val e = math.log(median(samples((kn, hi)).toSeq) / median(samples((kn, lo)).toSeq)) /
        math.log(hi.toDouble / lo)
      s""""$kn":${fm(e)}"""
    }.mkString("{", ",", "}")
    println(s"""{"study":"cdc_growth","medians":$med,"exponents":$exps,"samples":$raw,"reps":$reps}""")
    spark.stop()
  }
}
