package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

import scala.collection.mutable

/** Measured evidence for [[SnapshotLog.commitAppend]]'s scaling claim:
  * an append's cost is O(batch) — write the batch, read ITS footers,
  * publish — while [[SnapshotLog.commit]] is a table REPLACEMENT whose
  * cost grows with everything ever ingested. The study ingests K
  * identical batches into one table via appends, timing every append
  * (the series should be FLAT as the table grows K×), then times one
  * full commit of the same cumulative content (the rewrite an
  * append-less log would pay on every ingest at the final size).
  *
  * Usage: AppendBench [batchRows] [batches] (defaults 2000000 16)
  */
object AppendBench {

  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Files.createTempDirectory("graft_appendbench_").toString + "/t"
    def batch(i: Int) = spark.range(i * batchRows, (i + 1) * batchRows).select(
      col("id").as("key"),
      md5(col("id").cast("string")).as("payload"))
    batch(0).count(): Unit // warmup

    val appends = mutable.ArrayBuffer.empty[Double]
    (0 until batches).foreach { i =>
      val t0 = System.nanoTime()
      if (i == 0) SnapshotLog.commit(spark, t, batch(i).repartition(4))
      else SnapshotLog.commitAppend(spark, t, batch(i).repartition(4))
      appends += (System.nanoTime() - t0) / 1e9
    }
    require(SnapshotLog.read(spark, t).count() == batchRows * batches)

    // the counterfactual: one full-snapshot rewrite at the final size
    val t0 = System.nanoTime()
    SnapshotLog.commit(spark, t, SnapshotLog.read(spark, t))
    val rewrite = (System.nanoTime() - t0) / 1e9

    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val firstHalf = appends.slice(1, batches / 2).toSeq
    val lastHalf = appends.slice(batches / 2, batches).toSeq
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    println(s"""{"study":"append_vs_rewrite","batch_rows":$batchRows,"batches":$batches,""" +
      s""""appends":[${appends.map(fm).mkString(",")}],""" +
      s""""append_mean_early":${fm(mean(firstHalf))},"append_mean_late":${fm(mean(lastHalf))},""" +
      s""""full_rewrite_at_final":${fm(rewrite)}}""")
    spark.stop()
  }
}
