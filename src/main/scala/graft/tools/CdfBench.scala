package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** The CHANGE DATA FEED cost model, measured:
  * [[SnapshotLog.readChangeFeed]] (per-row changes, reads appended
  * files + dv-touched files only) vs [[SnapshotLog.diff]] (post-image
  * state diff — a full-outer join of BOTH snapshots) over the same
  * churn window, at two table sizes.
  *
  * The claim that matters at 100 TB: the feed's bill tracks the CHURN
  * (appended rows + dv-touched files), the diff's bill tracks the
  * TABLE (it must read and join both endpoint snapshots whole). Same
  * churn on a 4× table should leave the feed ~flat while the diff
  * grows ~linearly. Run: `sbt "runMain graft.tools.CdfBench"`
  * (CDF_NS=2000000,8000000 CDF_FILES=16). Results in SCALING.md §CDF.
  */
object CdfBench {
  def main(args: Array[String]): Unit = {
    val ns = sys.env.getOrElse("CDF_NS", "2000000,8000000")
      .split(",").map(_.trim.toLong).toSeq
    val nFiles = sys.env.getOrElse("CDF_FILES", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cdf_bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med(f: => Double): Double = Seq(f, f, f).sorted.apply(1)

    val root = Files.createTempDirectory("graft_cdf_bench_").toString
    try {
      ns.foreach { n =>
        val t = s"$root/t$n"
        SnapshotLog.commit(spark, t,
          spark.range(n).repartitionByRange(nFiles, col("id")).select(
            col("id").as("key"),
            md5(col("id").cast("string")).as("pay"),
            (col("id") % 97).as("v")))
        val v0 = SnapshotLog.latestVersion(t).get
        // the churn window: one 10k append + a 64-key MOR delete +
        // a 32-key MOR update, keys CLUSTERED (the point-shaped GDPR
        // queue — stats prune the marks scan to ~one file). Identical
        // churn at both table sizes; a feed whose delete half had to
        // touch EVERY file (keys spread at stride) would itself be
        // table-sized — that shape is the indexed-MOR rung's business
        // (MorBench), not the feed's
        SnapshotLog.commitAppend(spark, t,
          spark.range(n, n + 10000).select(
            col("id").as("key"),
            md5(col("id").cast("string")).as("pay"),
            (col("id") % 97).as("v")))
        val delKeys: Seq[Any] = (0 until 64).map(i => 1000L + i)
        SnapshotLog.deleteWhereInMOR(spark, t, "key", delKeys)
        val updKeys: Seq[Any] = (0 until 32).map(i => 5000L + i)
        SnapshotLog.updateWhereInMOR(spark, t, "key", updKeys,
          Map("v" -> lit(-1L)))
        val v1 = SnapshotLog.latestVersion(t).get

        def feedCount(): Long =
          SnapshotLog.readChangeFeed(spark, t, v0, v1).count()
        def diffCount(): Long =
          SnapshotLog.diff(spark, t, v0, v1).count()
        val feedRows = feedCount()
        val diffRows = diffCount()
        val feedSec = med(timed(feedCount())._2)
        val diffSec = med(timed(diffCount())._2)
        println(f"CDFBENCH: n=$n files=$nFiles churn=10k+64d+32u " +
          f"feed=$feedSec%.2fs/$feedRows rows diff=$diffSec%.2fs/$diffRows rows")
      }
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
