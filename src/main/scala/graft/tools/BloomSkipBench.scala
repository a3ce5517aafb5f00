package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

import scala.collection.mutable

/** Measured study for SnapshotLog's per-file bloom index: a table whose
  * lookup key is deliberately UNCLUSTERED (multiplicative scramble
  * against the write order), so manifest min/max stats keep every file
  * for a point lookup — the id-lookup shape where [[StatsSkipBench]]'s
  * mechanism is structurally blind. Then K random present keys read
  * through (a) the plain `read` + exact IN filter (parquet row-group
  * skipping still applies, but every file's key range spans the whole
  * domain, so row-group stats are equally blind — this is the honest
  * baseline, not a strawman) and (b) `readWhereIn`, which bloom-prunes
  * the file list before Spark sees a path. Identical rows asserted
  * before timing. The structural number (files kept / total) is the
  * 100 TB claim: at fpp=0.01, a K-key lookup touches ≤ K + 0.01·files
  * files regardless of table size, while the baseline scans ALL of
  * them. Build cost is reported alongside — one single-column scan,
  * amortized over every future lookup.
  *
  * Usage: BloomSkipBench [n] [files] [keys] [reps] (defaults 10000000 64 16 3)
  */
object BloomSkipBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val nKeys = args.lift(2).map(_.toInt).getOrElse(16)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Files.createTempDirectory("graft_bloomskip_").toString
    // key = id scrambled by a fixed odd multiplier the driver can
    // replay to pick known-present keys; small enough that id·mult
    // stays inside Long for any plausible n (ANSI mode forbids the
    // wrap). Each file's key [min, max] spans ~the whole domain —
    // min/max stats are structurally blind here.
    require(n <= (Long.MaxValue / 2654435761L),
      s"n=$n would overflow the scramble")
    val mult = 2654435761L
    SnapshotLog.commit(spark, t,
      spark.range(n).repartitionByRange(nFiles, col("id")).select(
        pmod(col("id") * mult, lit(n)).as("key"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1L).cast("string"))).as("payload")))

    val b0 = System.nanoTime()
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = math.max(1024L, 2L * n / nFiles), fpp = 0.01)
    val buildSec = (System.nanoTime() - b0) / 1e9

    // K deterministic present keys: the scramble replayed over ids
    // spread across the write order (one per ~nFiles/nKeys files)
    val keys: Seq[Any] = (1 to nKeys)
      .map(i => (i.toLong * (n / nKeys + 7)) % n)
      .map(id => java.lang.Math.floorMod(id * mult, n)).distinct
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)

    val a = SnapshotLog.read(spark, t).filter(col("key").isin(keys: _*))
      .agg(count(lit(1)), sum(col("key")), sum(length(col("payload")))).head()
    val b = SnapshotLog.readWhereIn(spark, t, "key", keys)
      .agg(count(lit(1)), sum(col("key")), sum(length(col("payload")))).head()
    require(a == b, s"kernels diverge: full=$a pruned=$b")
    require(a.getLong(0) >= keys.size,
      s"expected ≥${keys.size} rows, got ${a.getLong(0)}")

    val kernels: Seq[(String, () => Unit)] = Seq(
      "full_filter" -> (() => SnapshotLog.read(spark, t)
        .filter(col("key").isin(keys: _*))
        .write.mode("overwrite").format("noop").save()),
      "bloom_pruned" -> (() => SnapshotLog.readWhereIn(spark, t, "key", keys)
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
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val qs = samples.map { case (k, v) => "\"" + k + "\":" + fm(median(v.toSeq)) }
      .mkString("{", ",", "}")
    println(s"""{"bench":"bloom_skip","n":$n,"files":$total,"keys":$nKeys,""" +
      s""""kept_files":${kept.size},"build_sec":${fm(buildSec)},""" +
      s""""queries":$qs,"reps":$reps}""")
    spark.stop()
  }
}
