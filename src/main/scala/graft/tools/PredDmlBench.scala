package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** The GENERAL-predicate DML + general MERGE cost model, measured —
  * the executed version of SCALING.md's round-17 cost-shape claims:
  *
  *  1. `deleteWhereMOR` with a RANGE predicate on the CLUSTERED
  *     dimension should be ~FLAT in table size: the resolved
  *     condition's stats translation prunes the candidate scan to the
  *     clustered slice (~1 file of 16) before any job launches.
  *  2. The same verb with an UNCLUSTERED predicate (arithmetic over a
  *     scattered column) honestly pays a table scan — ~linear growth,
  *     which is what evaluating that predicate COSTS anywhere.
  *  3. `mergeWhereMOR` (conditional matched update + guarded insert,
  *     equi ON, churn-sized source) costs ~one hash-joined table scan
  *     plus O(acting rows) of writes — linear in table size with a
  *     SMALL constant. The COW alternative at the same churn (commit
  *     of the fully rewritten table) pays the scan PLUS a table-sized
  *     write: the gap is the MOR cost model's entire point.
  *
  * Identical churn at both table sizes. Run:
  * `sbt "runMain graft.tools.PredDmlBench"` (PRED_NS=2000000,8000000
  * PRED_FILES=16). Results in SCALING.md §general-predicate DML.
  */
object PredDmlBench {
  def main(args: Array[String]): Unit = {
    val ns = sys.env.getOrElse("PRED_NS", "2000000,8000000")
      .split(",").map(_.trim.toLong).toSeq
    val nFiles = sys.env.getOrElse("PRED_FILES", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("pred_dml_bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val root = Files.createTempDirectory("graft_pred_dml_").toString
    try {
      // untimed warmup: the first Spark job of a session pays JVM +
      // codegen + scheduler startup that would otherwise land on
      // whichever measurement runs first
      val w = s"$root/warmup"
      SnapshotLog.commit(spark, w, spark.range(100000).select(
        col("id").as("key"), md5(col("id").cast("string")).as("pay"),
        (col("id") % 97).as("v")))
      SnapshotLog.deleteWhereMOR(spark, w, col("key") < 10): Unit
      SnapshotLog.mergeWhereMOR(spark, w,
        spark.range(5).select(col("id").as("k"), lit("x").as("p"),
          lit(-1L).as("nv")),
        expr("t.key = s.k"),
        matched = Seq(SnapshotLog.MergeUpdate(None, Map("v" -> expr("s.nv")))),
        notMatched = Seq(SnapshotLog.MergeInsert(None,
          Map("key" -> expr("s.k"), "pay" -> expr("s.p"),
            "v" -> expr("s.nv"))))): Unit

      ns.foreach { n =>
        def fresh(tag: String): String = {
          val t = s"$root/t${n}_$tag"
          SnapshotLog.commit(spark, t,
            spark.range(n).repartitionByRange(nFiles, col("id")).select(
              col("id").as("key"),
              md5(col("id").cast("string")).as("pay"),
              (col("id") % 97).as("v")))
          t
        }
        // 1. clustered range: ~64 rows inside one range-clustered file
        val t1 = fresh("cl")
        val lo = n / 2
        val secClustered = timed {
          SnapshotLog.deleteWhereMOR(spark, t1,
            col("key") >= lo && col("key") < lo + 64): Unit
        }
        // 2. unclustered arithmetic: same matched-row count, but the
        // predicate's column scatters across every file — no stats
        // translation can exonerate anything
        val t2 = fresh("uc")
        val secScattered = timed {
          // modulo stride: exactly 64 matching rows, one per file-ish,
          // and an arithmetic shape no stats translation can touch
          SnapshotLog.deleteWhereMOR(spark, t2,
            col("key") % (n / 64) === 31L): Unit
        }
        // 3. the general MERGE at 10k churn: 5k conditional updates +
        // 5k guarded inserts, equi ON
        val t3 = fresh("mg")
        val src = spark.range(n - 5000, n + 5000).select(
          col("id").as("k"),
          md5(col("id").cast("string")).as("p"),
          lit(-1L).as("nv"))
        val secMerge = timed {
          SnapshotLog.mergeWhereMOR(spark, t3, src,
            expr("t.key = s.k"),
            matched = Seq(SnapshotLog.MergeUpdate(
              Some(expr("s.nv < t.v")), Map("v" -> expr("s.nv")))),
            notMatched = Seq(SnapshotLog.MergeInsert(None,
              Map("key" -> expr("s.k"), "pay" -> expr("s.p"),
                "v" -> expr("s.nv"))))): Unit
        }
        // 4. the COW alternative at the same churn: rewrite the whole
        // merged table (what a log without MOR would have to commit)
        val t4 = fresh("cow")
        val secCow = timed {
          val cur = SnapshotLog.read(spark, t4).alias("t")
          val s = src.alias("s")
          val merged = cur.join(s, expr("t.key = s.k"), "full_outer")
            .select(
              coalesce(col("t.key"), col("s.k")).as("key"),
              coalesce(col("t.pay"), col("s.p")).as("pay"),
              when(col("s.k").isNotNull && (col("s.nv") < col("t.v") ||
                col("t.v").isNull), col("s.nv"))
                .otherwise(col("t.v")).as("v"))
          SnapshotLog.commit(spark, t4, merged): Unit
        }
        println(f"PREDDML: n=$n files=$nFiles " +
          f"del_clustered=$secClustered%.2fs del_scattered=$secScattered%.2fs " +
          f"merge_mor=$secMerge%.2fs merge_cow=$secCow%.2fs")
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
