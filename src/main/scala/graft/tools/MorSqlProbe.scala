package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** The SQL masked-read price, measured: a dv-bearing version's
  * catalog scan runs ROW-BASED (BatchScanExec demands uniformity and
  * the masked partitions filter rows), so a full-table SQL aggregate
  * pays the lost ColumnarToRow handoff until [[SnapshotLog
  * .compactDeletes]] restores the vectorized path. This probe puts a
  * number on that transitional tax at the 8M-row rung: clean SQL scan
  * vs dv'd SQL scan (one point delete) vs post-compaction SQL scan —
  * median of 3 each. Run: `sbt "runMain graft.tools.MorSqlProbe"`.
  * Results in SCALING.md §MOR. */
object MorSqlProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MOR_N", "8000000").toLong
    val nFiles = sys.env.getOrElse("MOR_FILES", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("mor_sql_probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(f: => Unit): Double = {
      f // untimed warm-up: page-cache warmth must not masquerade as a
        // plan difference between the three phases
      Seq(timed(f), timed(f), timed(f)).sorted.apply(1)
    }
    val root = Files.createTempDirectory("graft_morsql_").toString
    try {
      val t = s"$root/lake/t"
      SnapshotLog.commit(spark, t,
        spark.range(n).repartitionByRange(nFiles, col("id")).select(
          col("id").as("key"),
          md5(col("id").cast("string")).as("pay"),
          (col("id") % 97).as("v")))
      spark.conf.set("spark.sql.catalog.morsql", "graft.sources.SnapshotCatalog")
      spark.conf.set("spark.sql.catalog.morsql.root", root)
      def scanAll(): Unit =
        spark.sql("SELECT count(*), sum(v) FROM morsql.lake.t").collect(): Unit
      val clean = med(scanAll())
      SnapshotLog.deleteWhereInMOR(spark, t, "key", Seq(7L))
      val masked = med(scanAll())
      // the mask lands on ONE file; 15 of 16 stay clean but the whole
      // scan rides rows — that asymmetry IS the measured tax
      SnapshotLog.compactDeletes(spark, t)
      val compacted = med(scanAll())
      println(f"MORSQL: n=$n files=$nFiles clean=$clean%.2fs " +
        f"masked_one_file=$masked%.2fs compacted=$compacted%.2fs")
      // round-17 SPLIT rung: one HOT masked file (the whole table in a
      // single ~400 MB parquet), scanned whole-file (one task — the
      // pre-split behavior, forced via a huge maxPartitionBytes) vs
      // split at the default 128 MB. The split is what keeps a big
      // dv'd file from serializing onto one task at scale.
      val t2 = s"$root/lake/one"
      SnapshotLog.commit(spark, t2,
        spark.range(n).repartition(1).select(
          col("id").as("key"),
          md5(col("id").cast("string")).as("pay"),
          (col("id") % 97).as("v")))
      SnapshotLog.deleteWhereInMOR(spark, t2, "key", Seq(7L))
      def scanOne(): Unit =
        spark.sql("SELECT count(*), sum(v) FROM morsql.lake.one")
          .collect(): Unit
      def parts(): Int =
        spark.sql("SELECT v FROM morsql.lake.one").rdd.getNumPartitions
      val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (1L << 40).toString)
      val wholeParts = parts()
      val whole = med(scanOne())
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      val splitParts = parts()
      val split = med(scanOne())
      require(splitParts > wholeParts && wholeParts == 1,
        s"expected the masked file to split: $wholeParts -> $splitParts")
      println(f"MORSQL_SPLIT: n=$n hot_masked_file_tasks=" +
        f"$wholeParts->$splitParts whole=$whole%.2fs split=$split%.2fs")
    } finally {
      spark.conf.unset("spark.sql.catalog.morsql.root")
      spark.conf.unset("spark.sql.catalog.morsql")
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(Paths.get(root))) { st =>
        st.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
      spark.stop()
    }
  }
}
