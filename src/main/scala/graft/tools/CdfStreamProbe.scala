package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** The change-feed stream's COLUMNAR insert path, A/B-measured: the
  * same append-only history streamed with `changeFeed=true` under
  * `columnar=true` (insert batches pass through vectorized, the two
  * bookkeeping columns as constant vectors) vs `columnar=false` (the
  * row path: JoinedRow per row). Mirrors the round-12 SnapStreamBench
  * A/B that justified the non-CDF columnar path. Run:
  * `sbt "runMain graft.tools.CdfStreamProbe"` (CDF_N=8000000).
  * Results in SCALING.md §CDF. */
object CdfStreamProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("CDF_N", "8000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cdf_stream_probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_cdfsp_").toString
    try {
      val t = s"$root/t"
      // append-only history in 8 versions — every CDF batch is
      // insert-only, so the columnar flag is the ONLY difference
      SnapshotLog.commit(spark, t,
        spark.range(n / 8).repartitionByRange(4, col("id")).select(
          col("id").as("k"), md5(col("id").cast("string")).as("pay")))
      (1 until 8).foreach { i =>
        SnapshotLog.commitAppend(spark, t,
          spark.range(i * n / 8, (i + 1) * n / 8).select(
            col("id").as("k"), md5(col("id").cast("string")).as("pay")))
      }
      def run(columnar: Boolean): Double = {
        val cp = Files.createTempDirectory("graft_cdfsp_cp_").toString
        val t0 = System.nanoTime()
        val out = Files.createTempDirectory("graft_cdfsp_out_").toString
        val q = spark.readStream.format("graft-snaplog")
          .option("tableDir", t)
          .option("changeFeed", "true")
          .option("columnar", columnar.toString)
          .load()
          .writeStream.format("parquet")
          .option("path", s"$out/data")
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
        (System.nanoTime() - t0) / 1e9
      }
      run(columnar = true) // warm (page cache, codegen)
      val colSec = Seq(run(true), run(true), run(true)).sorted.apply(1)
      val rowSec = Seq(run(false), run(false), run(false)).sorted.apply(1)
      println(f"CDFSTREAM: n=$n columnar=$colSec%.2fs rows=$rowSec%.2fs " +
        f"ratio=${rowSec / colSec}%.2fx")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(Paths.get(root))) { st =>
        st.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
      spark.stop()
    }
  }
}
