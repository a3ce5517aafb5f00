package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

import scala.collection.mutable

/** Measured A/B for [[SnapshotLog.mergeInto]]'s bloom screen (stage
  * 1.5): two identical tables whose merge key is UNCLUSTERED (the
  * stats interval keeps every file), one carrying a bloom index on the
  * key. The same K-key point-update batches merge into both; the
  * screened table's probe opens only ~the keys' files, the bare
  * table's probe scans every candidate. Both paths rewrite the SAME
  * files (the probe is the exact arbiter either way — asserted by
  * comparing the two tables' contents after each pass), so the delta
  * is pure probe I/O: exactly what the screen exists to delete.
  *
  * Usage: MergeScreenBench [n] [files] [keys] [reps] (defaults 10000000 64 32 3)
  */
object MergeScreenBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val nKeys = args.lift(2).map(_.toInt).getOrElse(32)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_mergescreen_").toString
    require(n <= (Long.MaxValue / 2654435761L))
    val mult = 2654435761L
    def gen = spark.range(n).repartitionByRange(nFiles, col("id")).select(
      pmod(col("id") * mult, lit(n)).as("key"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1L).cast("string"))).as("payload"))
    val bare = s"$root/bare"
    val screened = s"$root/screened"
    SnapshotLog.commit(spark, bare, gen)
    SnapshotLog.commit(spark, screened, gen)
    SnapshotLog.writeBloomIndex(spark, screened, "key", fpp = 0.01)

    def feed(round: Int) = {
      val keys = (1 to nKeys).map(i =>
        java.lang.Math.floorMod(
          (round.toLong * nKeys + i) * (n / (8L * nKeys) + 13) * mult, n))
      import spark.implicits._
      keys.map(k => (k, s"patched_r$round", "update"))
        .toDF("key", "payload", "op")
    }

    val samples = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Double]]
    for (r <- 1 to reps) {
      val f = feed(r)
      f.count() // materialize the tiny feed outside the timed region
      for ((name, t) <- Seq("bare_merge" -> bare, "screened_merge" -> screened)) {
        val t0 = System.nanoTime()
        SnapshotLog.mergeInto(spark, t, f, "key")
        samples.getOrElseUpdate(name, mutable.ArrayBuffer.empty) +=
          (System.nanoTime() - t0) / 1e9
      }
      // refresh the screened index over the rewritten files so pass
      // r+1 screens against full coverage (the maintenance recipe)
      SnapshotLog.refreshBloomIndex(spark, screened, "key"): Unit
    }
    // both paths must have produced identical tables (the screen is
    // I/O-only) — checksum, not row count
    val a = SnapshotLog.read(spark, bare)
      .agg(count(lit(1)), sum(hash(col("key"), col("payload")).cast("long"))).head()
    val b = SnapshotLog.read(spark, screened)
      .agg(count(lit(1)), sum(hash(col("key"), col("payload")).cast("long"))).head()
    require(a == b, s"screened merge diverged: $a vs $b")

    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val qs = samples.map { case (k, v) => "\"" + k + "\":" + fm(median(v.toSeq)) }
      .mkString("{", ",", "}")
    println(s"""{"bench":"merge_screen","n":$n,"files":$nFiles,""" +
      s""""keys":$nKeys,"queries":$qs,"reps":$reps}""")
    spark.stop()
  }
}
