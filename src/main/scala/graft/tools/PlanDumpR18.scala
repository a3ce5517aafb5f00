package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Plan-evidence dump for the round-18 paths (PLANS_r18.md's source):
  *
  *  1. dv-aware metadata COUNT(*) — SnapAggScan on a MASKED version
  *     (`:rows` − `:masked`), the combined MIN/MAX ask declining;
  *  2. the maintenance cycle (MOR delete → compact_deletes →
  *     bucket-keyed optimize) leaving the SPJ join exchange-free;
  *  3. partially-clustered distribution splitting a hot bucket
  *     (join partition count beyond the bucket count);
  *  4. exact scan statistics (numRows from the manifest, live count
  *     on a dv version);
  *  5. the `.changes` metadata table's batch plan (a V1 row scan over
  *     the feed's own DataFrame).
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_plandump18_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.pd", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.pd.root", root.toString)

    // --- 1. dv-aware metadata COUNT(*) -------------------------------
    val t = s"$root/lake/t"
    SnapshotLog.commit(spark, t,
      spark.range(0, 100000).toDF("k").withColumn("v", col("k") * 3)
        .repartition(8))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", (0L until 24L).toSeq): Unit
    println("=== DV-AWARE METADATA COUNT(*) (masked version, formatted) ===")
    spark.sql("SELECT count(*) AS c FROM pd.lake.t").explain("formatted")
    println("result: " + spark.sql("SELECT count(*) AS c FROM pd.lake.t")
      .collect()(0).getLong(0))
    println("=== SAME VERSION, MIN/MAX ASK: declines to the honest scan ===")
    val declined = spark.sql("SELECT count(*) AS c, min(k) FROM pd.lake.t")
    val declPlan = declined.queryExecution.optimizedPlan.toString
    println("SnapAggScan in declined plan? " +
      declPlan.contains("SnapAggScan"))

    // --- 4. exact scan statistics ------------------------------------
    def scanStats(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation =>
          val s = r.scan.asInstanceOf[
            org.apache.spark.sql.connector.read.SupportsReportStatistics]
            .estimateStatistics()
          s"numRows=${s.numRows()} sizeInBytes=${s.sizeInBytes()}"
      }.getOrElse("no v2 scan")
    println("=== SCAN STATISTICS (dv version: exact LIVE numRows) ===")
    println(scanStats(spark.table("pd.lake.t")))

    // --- 2. maintenance cycle keeps SPJ ------------------------------
    val a = s"$root/lake/a"
    val b = s"$root/lake/b"
    SnapshotLog.commit(spark, a, spark.range(0, 50000).toDF("k")
      .withColumn("va", col("k") * 2).repartition(8))
    SnapshotLog.commit(spark, b, spark.range(0, 20000).toDF("k")
      .withColumn("vb", col("k") * 5).repartition(8))
    SnapshotLog.rebucket(spark, a, "k", 8): Unit
    SnapshotLog.rebucket(spark, b, "k", 8): Unit
    SnapshotLog.deleteWhereInMOR(spark, a, "k", (0L until 100L).toSeq): Unit
    spark.sql("CALL pd.system.compact_deletes(table => 'lake.a')")
      .collect(): Unit
    spark.sql("CALL pd.system.optimize(table => 'lake.a', " +
      "target_records_per_file => 20000, cluster_by => 'k')")
      .collect(): Unit
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val join = spark.sql("SELECT a.k, a.va, b.vb FROM pd.lake.a a " +
      "JOIN pd.lake.b b ON a.k = b.k")
    join.collect(): Unit
    println("=== SPJ JOIN AFTER THE MAINTENANCE CYCLE (formatted) ===")
    join.explain("formatted")

    // --- 3. partially-clustered skew split ---------------------------
    val sk = s"$root/lake/sk"
    SnapshotLog.commit(spark, sk, spark.range(0, 40000).toDF("i")
      .selectExpr("CASE WHEN i < 32000 THEN 7 ELSE i END AS k", "i AS lv")
      .repartition(8))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "8000")
    try SnapshotLog.rebucket(spark, sk, "k", 8): Unit
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    def joinParts(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect(): Unit
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case x => x }.flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q +: all(q.plan)
          case x: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => x +: all(x.executedPlan)
          case x => Seq(x)
        }
      all(df.queryExecution.executedPlan).collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.outputPartitioning.numPartitions
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.outputPartitioning.numPartitions
      }.getOrElse(-1)
    }
    val qSkew = "SELECT l.k, l.lv, r.vb FROM pd.lake.sk l " +
      "JOIN pd.lake.b r ON l.k = r.k"
    val grouped = joinParts(spark.sql(qSkew))
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing" +
      ".partiallyClusteredDistribution.enabled", "true")
    val partial = joinParts(spark.sql(qSkew))
    println(s"=== PARTIALLY-CLUSTERED SKEW SPLIT ===")
    println(s"join partitions: grouped=$grouped partiallyClustered=$partial" +
      s" (buckets=8)")
    spark.conf.unset("spark.sql.sources.v2.bucketing" +
      ".partiallyClusteredDistribution.enabled")
    spark.conf.unset("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // --- 5. the .changes metadata table ------------------------------
    println("=== .changes METADATA TABLE (batch, formatted) ===")
    spark.table("pd.lake.t.changes").explain("formatted")
    println("feed rows by type: " + spark.sql(
      "SELECT _change_type, count(*) AS c FROM pd.lake.t.changes " +
        "GROUP BY 1 ORDER BY 1").collect().mkString(", "))
    spark.stop()
  }
}
