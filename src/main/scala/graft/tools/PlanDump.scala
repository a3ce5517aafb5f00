package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_plandump_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.pd", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.pd.root", root.toString)
    SnapshotLog.commit(spark, s"$root/lake/t",
      spark.range(0, 100000).toDF("k").withColumn("v", col("k") * 3)
        .repartition(8))
    println("=== METADATA AGGREGATE (formatted) ===")
    spark.sql("SELECT count(*) AS c, min(k) AS mn, max(k) AS mx FROM pd.lake.t")
      .explain("formatted")
    println("=== LIMIT FILE PRUNE ===")
    spark.sql("SELECT k FROM pd.lake.t LIMIT 5").collect(): Unit
    println(graft.sources.ScanPrune.decisions.filter(_._1.contains("#limit")))
    // metadata vs scan aggregate A/B at 8M rows: the pushed COUNT/MIN/
    // MAX is driver-side manifest arithmetic; the honest twin scans
    val big = s"$root/lake/big"
    SnapshotLog.commit(spark, big, spark.range(0, 8000000).toDF("k")
      .withColumn("v", col("k") % 1000).repartition(32))
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val q = "SELECT count(*) AS c, min(k) AS mn, max(k) AS mx"
    spark.sql(s"$q FROM pd.lake.big").collect(): Unit // warm catalog
    val (wMeta, _) = time(spark.sql(s"$q FROM pd.lake.big").collect())
    val scanDf = SnapshotLog.read(spark, big)
    scanDf.agg(count(lit(1)), min(col("k")), max(col("k"))).collect(): Unit
    val (wScan, _) = time(
      scanDf.agg(count(lit(1)), min(col("k")), max(col("k"))).collect())
    println(f"AGGPUSH: rows=8000000 wall_meta=$wMeta%.3fs wall_scan=$wScan%.3fs")
    spark.stop()
  }
}
