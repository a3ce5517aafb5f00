package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Measured grounding for the `graft-snaplog` streaming source: the
  * source is file-list bookkeeping over Spark's own parquet reader, so
  * its throughput should be the batch scan's throughput plus
  * per-micro-batch constants. This tool builds a table as K appended
  * batches, then (a) streams it through the source end-to-end (one
  * micro-batch per trigger window as processAllAvailable drains it),
  * counting rows in foreachBatch, and (b) batch-reads the same table
  * once — the floor. The honest number is the ratio.
  *
  * Usage: SnapStreamBench [batchRows] [batches] [columnar]
  *   (defaults 2000000 4 true — `false` forces the row-path reader,
  *    the round-12 A/B that re-attributed the stream-vs-batch gap)
  */
object SnapStreamBench {

  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val columnar = args.lift(2).map(_.toBoolean).getOrElse(true)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Files.createTempDirectory("graft_snapstream_").toString + "/t"
    def batch(i: Int) = spark.range(i * batchRows, (i + 1) * batchRows).select(
      col("id").as("key"), md5(col("id").cast("string")).as("payload"))
    (0 until batches).foreach { i =>
      if (i == 0) SnapshotLog.commit(spark, t, batch(i).repartition(8))
      else SnapshotLog.commitAppend(spark, t, batch(i).repartition(8))
    }
    val total = batchRows * batches

    // both paths FORCED to materialize the payload (a bare count()
    // answers from parquet footers — a metadata read, not a scan
    // floor); pass-interleaved so JIT warm-up cannot bias either side
    def batchPass(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val r = SnapshotLog.read(spark, t)
        .agg(count(lit(1)), sum(length(col("payload")))).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    def streamPass(): (Double, Long, Long) = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
      val t1 = System.nanoTime()
      val q = spark.readStream.format("graft-snaplog")
        .option("tableDir", t).option("columnar", columnar.toString).load()
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val r = b.agg(count(lit(1)), sum(length(col("payload")))).head()
            seen.addAndGet(r.getLong(0))
            bytes.addAndGet(r.getLong(1)): Unit
        }.start()
      try q.processAllAvailable() finally q.stop()
      ((System.nanoTime() - t1) / 1e9, seen.get(), bytes.get())
    }
    val reps = 3
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ss = scala.collection.mutable.ArrayBuffer.empty[Double]
    var expectBytes = -1L
    for (_ <- 1 to reps) {
      val (bSec, bCount, bBytes) = batchPass()
      require(bCount == total)
      if (expectBytes < 0) expectBytes = bBytes
      val (sSec, sCount, sBytes) = streamPass()
      require(sCount == total, s"stream saw $sCount of $total")
      require(sBytes == expectBytes, "stream/batch payload bytes differ")
      bs += bSec; ss += sSec
    }
    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"study":"snapstream","rows":$total,"batches":$batches,"columnar":$columnar,""" +
      s""""batch_scan_secs":[${bs.map(fm).mkString(",")}],""" +
      s""""stream_secs":[${ss.map(fm).mkString(",")}],""" +
      s""""ratio_of_mins":${fm(ss.min / bs.min)},""" +
      s""""stream_mrows_per_sec":${fm(total / ss.min / 1e6)}}""")
    spark.stop()
  }
}
