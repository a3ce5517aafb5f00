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

    // SKEW RUNG (round 18): one hot key owns 80% of the left fact —
    // grouped SPJ serializes that bucket onto ONE task; Spark's
    // partially-clustered distribution keeps the skewed side's
    // per-file partitions ungrouped and replays the other side's
    // group against each piece. Same zero exchanges, hot bucket fans
    // out. (maxRecordsPerFile splits the hot bucket's file at rebucket
    // time — the same-task-index files all carry the bucket's id.)
    val sdir = root.resolve("lake").resolve("sk").toString
    SnapshotLog.commit(spark, sdir, spark.range(0, rowsL).toDF("i")
      .selectExpr(s"CASE WHEN i < ${rowsL * 8 / 10} THEN 7 ELSE i END AS k",
        "i AS lv").repartition(32))
    spark.conf.set("spark.sql.files.maxRecordsPerFile",
      math.max(rowsL / 64, 1L).toString)
    try SnapshotLog.rebucket(spark, sdir, "k", n)
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val qs = "SELECT count(*) AS c, sum(l.lv + r.rv) AS s FROM " +
      "spj.lake.sk l JOIN spj.lake.r r ON l.k = r.k"
    def runSkew(partial: Boolean): (Double, Long, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled", partial.toString)
      try {
        spark.sql(qs).collect(): Unit
        val t0 = System.nanoTime()
        val df = spark.sql(qs)
        val c = df.collect()(0).getLong(0)
        ((System.nanoTime() - t0) / 1e9, c, shuffles(df))
      } finally {
        spark.conf.unset("spark.sql.sources.v2.bucketing" +
          ".partiallyClusteredDistribution.enabled")
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      }
    }
    val (wG, cG, sG) = runSkew(partial = false)
    val (wP, cP, sP) = runSkew(partial = true)
    require(cG == cP, s"skew result diverged: $cG vs $cP")
    require(sG == 0 && sP == 0,
      s"skew SPJ shuffled (grouped=$sG partial=$sP)")
    println(f"SPJ-SKEW: joined=$cP wall_grouped=$wG%.2fs " +
      f"wall_partially_clustered=$wP%.2fs shuffles=0")
    spark.stop()
  }
}
