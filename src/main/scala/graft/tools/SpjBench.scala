package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Storage-partitioned-join A/B: the same fact-to-fact join over two
  * bucketed snapshot tables with `spark.sql.sources.v2.bucketing.
  * enabled` off (ordinary scans → both sides shuffle) vs on
  * (SnapBucketScan → KeyGroupedPartitioning → zero exchanges below
  * the join). Prints one line:
  *
  *   SPJ: rows=L,R joined=N wall_shuffled=...s wall_spj=...s
  *     shuffles_shuffled=K shuffles_spj=0
  *
  * What the numbers mean at scale: the shuffled plan's cost is
  * O(both tables) network + disk BEFORE the join starts; the SPJ
  * plan's is zero — at local SF the gap is modest (page-cached
  * shuffle files, one machine), the STRUCTURAL claim (exchange count
  * below the join) is the scaling fact. Broadcast stays disabled so
  * the A/B compares shuffle-vs-no-shuffle, not shuffle-vs-broadcast.
  *
  * Usage: runMain graft.tools.SpjBench [rowsLeft] [rowsRight] [buckets]
  */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val rowsL = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val rowsR = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val n = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_spjbench_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.spj", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.spj.root", root.toString)
    val ldir = root.resolve("lake").resolve("l").toString
    val rdir = root.resolve("lake").resolve("r").toString
    SnapshotLog.commit(spark, ldir, spark.range(0, rowsL).toDF("k")
      .withColumn("lv", col("k") % 1000).repartition(32))
    SnapshotLog.commit(spark, rdir, spark.range(0, rowsR).toDF("k")
      .withColumn("rv", col("k") % 777).repartition(32))
    SnapshotLog.rebucket(spark, ldir, "k", n)
    SnapshotLog.rebucket(spark, rdir, "k", n)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val q = "SELECT count(*) AS c, sum(l.lv + r.rv) AS s FROM " +
      "spj.lake.l l JOIN spj.lake.r r ON l.k = r.k"

    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case x => x }.flatMap {
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            qs +: all(qs.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => a +: all(a.executedPlan)
          case x => Seq(x)
        }
      all(df.queryExecution.executedPlan).collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          all(j).count(_.isInstanceOf[
            org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          all(j).count(_.isInstanceOf[
            org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
      }.getOrElse(-1)
    }

    def run(spj: Boolean): (Double, Long, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      // warm once, then one timed run (local-SF probe discipline)
      spark.sql(q).collect(): Unit
      val t0 = System.nanoTime()
      val df = spark.sql(q)
      val c = df.collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, c, shuffles(df))
    }

    val (wOff, cOff, sOff) = run(spj = false)
    val (wOn, cOn, sOn) = run(spj = true)
    require(cOff == cOn, s"result diverged: $cOff vs $cOn")
    require(sOn == 0, s"SPJ plan shuffled ($sOn exchanges below the join)")
    println(f"SPJ: rows=$rowsL,$rowsR joined=$cOn " +
      f"wall_shuffled=$wOff%.2fs wall_spj=$wOn%.2fs " +
      f"shuffles_shuffled=$sOff shuffles_spj=$sOn")

    // MAINTENANCE RUNG (round 18): a routine lifecycle pass over the
    // left fact — MOR delete, compact_deletes, bucket-keyed small-file
    // optimize — must leave the zero-exchange plan standing (the
    // bucket-preserving maintenance contract). Before round 18 this
    // sequence shed :bucket and the join re-shuffled until a full
    // rebucket.
    SnapshotLog.deleteWhereInMOR(spark, ldir, "k",
      (0L until 1000L).toSeq): Unit
    SnapshotLog.compactDeletes(spark, ldir): Unit
    SnapshotLog.optimize(spark, ldir, rowsL / n + 1): Unit
    val (wM, cM, sM) = run(spj = true)
    require(sM == 0,
      s"maintenance shed the SPJ layout ($sM exchanges below the join)")
    println(f"SPJ-MAINT: joined=$cM wall_spj_after_maintenance=$wM%.2fs " +
      f"shuffles=$sM (MOR delete -> compact_deletes -> optimize)")
    spark.stop()
  }
}
