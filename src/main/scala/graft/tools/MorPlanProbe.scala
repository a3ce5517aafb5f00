package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Where does the masked read's 5-9x go? Explain + phase-time the
  * dv-masked scan: metadata materialization, join strategy (broadcast
  * vs shuffle), codegen breaks. Scratch diagnostics for NOTES_r15. */
object MorPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("mor_plan")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_mor_plan_").toString
    try {
      val t = s"$root/t"
      SnapshotLog.commit(spark, t,
        spark.range(8000000L).repartitionByRange(16, col("id")).select(
          col("id").as("key"),
          md5(col("id").cast("string")).as("pay"),
          (col("id") % 97).as("v")))
      val keys: Seq[Any] = (0 until 64).map(i => i.toLong * 125000 + 7L)
      SnapshotLog.deleteWhereInMOR(spark, t, "key", keys)
      def timed(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val masked = SnapshotLog.read(spark, t)
      val agg = masked.agg(count(lit(1)), sum("v"))
      agg.collect()
      println("== masked read plan ==")
      println(agg.queryExecution.executedPlan.toString.take(4000))
      // phase A: plain scan WITH metadata cols, no join
      val plainMeta = spark.read.parquet(
        SnapshotLog.pruneFiles(t, "v", None, None)._1: _*)
        .select(col("*"), col("_metadata.file_path").as("fp"),
          col("_metadata.row_index").as("ri"))
      println(f"scan+meta, no join: ${timed(plainMeta.agg(count(lit(1))).collect()(0).getLong(0))}%.2fs")
      val plain = spark.read.parquet(
        SnapshotLog.pruneFiles(t, "v", None, None)._1: _*)
      println(f"plain scan:         ${timed(plain.agg(count(lit(1))).collect()(0).getLong(0))}%.2fs")
      println(f"masked read:        ${timed(masked.agg(count(lit(1))).collect()(0).getLong(0))}%.2fs")
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
