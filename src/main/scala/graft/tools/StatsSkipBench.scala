package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

import scala.collection.mutable

/** Measured study for SnapshotLog's manifest-stats data skipping: a
  * range-clustered committed table (plus one appended generation, so
  * pruning spans carried-forward stats), then a narrow range read
  * through (a) the plain `read` + exact filter — parquet's own
  * row-group skipping still applies, this is NOT a strawman full scan
  * — and (b) `readWhere`, which prunes the file list from the manifest
  * before Spark sees a path. Both produce identical rows (asserted
  * before timing). The structural number (files Spark must touch) is
  * the 100 TB claim; the local wall-clock delta is what footer reads +
  * task scheduling for dead files cost on ONE machine with a warm page
  * cache — the floor, not the point: on an object store each dead file
  * is a LIST/HEAD + footer GET and a scheduled task.
  *
  * Usage: StatsSkipBench [n] [files] [reps] (defaults 50000000 64 3)
  */
object StatsSkipBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Files.createTempDirectory("graft_statsskip_").toString
    def gen(from: Long, until: Long) = spark.range(from, until).select(
      col("id").as("key"),
      // ~64 B payload so files have real weight
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1L).cast("string"))).as("payload"))
    SnapshotLog.commit(spark, t, gen(0L, n).repartitionByRange(nFiles, col("key")))
    SnapshotLog.commitAppend(spark, t,
      gen(10L * n, 10L * n + n / 10).repartitionByRange(
        math.max(1, nFiles / 10), col("key")))

    // the ask: 1% of the gen-0 domain, mid-table
    val (lo, hi) = (n / 2, n / 2 + n / 100)
    val (kept, total) = SnapshotLog.pruneFiles(t, "key", Some(lo), Some(hi))

    // identical selections (checksummed) before any timing
    val a = SnapshotLog.read(spark, t)
      .filter(col("key") >= lo && col("key") <= hi)
      .agg(count(lit(1)), sum(col("key")), sum(length(col("payload")))).head()
    val b = SnapshotLog.readWhere(spark, t, "key", Some(lo), Some(hi))
      .agg(count(lit(1)), sum(col("key")), sum(length(col("payload")))).head()
    require(a == b, s"kernels diverge: full=$a pruned=$b")

    val kernels: Seq[(String, () => Unit)] = Seq(
      "full_filter" -> (() => SnapshotLog.read(spark, t)
        .filter(col("key") >= lo && col("key") <= hi)
        .write.mode("overwrite").format("noop").save()),
      "manifest_pruned" -> (() => SnapshotLog.readWhere(spark, t, "key", Some(lo), Some(hi))
        .write.mode("overwrite").format("noop").save()))
    val samples = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Double]]
    for (_ <- 1 to reps; (kn, kf) <- kernels) {
      val t0 = System.nanoTime()
      kf()
      samples.getOrElseUpdate(kn, mutable.ArrayBuffer.empty) +=
        (System.nanoTime() - t0) / 1e9
    }
    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val med = kernels.map { case (kn, _) =>
      s""""$kn":${fm(median(samples(kn).toSeq))}""" }.mkString("{", ",", "}")
    val raw = samples.map { case (kn, v) =>
      s""""$kn":${v.map(fm).mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
    println(s"""{"study":"stats_skip","n":$n,"files_total":$total,"files_kept":${kept.size},"medians":$med,"samples":$raw,"reps":$reps}""")
    spark.stop()
  }
}
