package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** One-off plan probe for the change feed's delete half: the semi-join
  * of the touched files' metadata scan against the churn-sized delta
  * must BROADCAST (a shuffle here would be table-sized on the probe
  * side). Prints the executed plan's join nodes. */
object FeedPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("feed_plan_probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Files.createTempDirectory("graft_fpp_").toString + "/t"
    SnapshotLog.commit(spark, t, spark.range(2000000)
      .repartitionByRange(8, col("id"))
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k",
      (0 until 64).map(i => i.toLong * 31250 + 7): Seq[Any])
    val feed = SnapshotLog.readChangeFeed(spark, t, 0, 1)
    feed.collect()
    val plan = feed.queryExecution.executedPlan.toString
    println("JOIN NODES:")
    plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange")).foreach(println)
    spark.stop()
  }
}
