package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.{ScanPrune, SnapshotLog}

/** Does the RUNTIME (DPP-style) IN actually reach parquet ROW-GROUP
  * skipping inside the kept files, or only the FILE-level prune? The
  * question is an execution-ordering one: BatchScanExec caches `batch`
  * and derives `readerFactory` from it lazily, and whether the factory
  * is built before or after `SupportsRuntimeV2Filtering.filter()`
  * decides whether the re-pushed runtime predicate is in the reader's
  * pushed-filter set when row groups are evaluated. Bytecode reading
  * says what CAN happen; this probe measures what DOES.
  *
  * Layout: ONE snapshot data file, 256k rows sorted by `key`, written
  * under a small `parquet.block.size` so the file holds MANY row
  * groups with tight disjoint key ranges. A 10-key dim slice then
  * joins on `key`:
  *
  *  - file-level runtime pruning cannot help (1 file, always kept);
  *  - if the runtime IN reaches the reader factory, parquet drops the
  *    non-matching row groups and the scan's `numOutputRows` reads
  *    ~1 row group;
  *  - if it does not, the scan emits the whole file.
  *
  * A static `WHERE key IN (...)` twin on the same table is the
  * baseline: planning-time pushdown provably row-group-skips, so its
  * scan metric shows what "skipping worked" looks like on this exact
  * layout. Run: `sbt "runMain graft.tools.RowGroupProbe"`. Findings
  * recorded in NOTES_r15.md and the PruningScanBuilder scaladoc. */
object RowGroupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("row_group_probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // small row groups: ~256k rows of ~120B land in many groups
      .config("spark.hadoop.parquet.block.size", 256 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_rg_probe_").toString
    try {
      val n = 256 * 1024L
      SnapshotLog.commit(spark, s"$root/lake/fact",
        spark.range(n).repartition(1).sortWithinPartitions("id").select(
          col("id").as("key"),
          md5(col("id").cast("string")).as("pay"),
          (col("id") * 3).as("v")))
      // dim: 10 "pick" keys inside one row group's range, as a parquet
      // table (a LocalRelation would be folded into the join) with a
      // SELECTIVE predicate — PartitionPruning only plants the DPP
      // subquery when the dim side carries one
      spark.range(40).select(
        when(col("id") < 10, col("id") + 77000).otherwise(col("id") * 9901)
          .as("d_key"),
        when(col("id") < 10, lit("pick")).otherwise(lit("other")).as("d_tag"))
        .coalesce(1).write.parquet(s"$root/dim")

      spark.conf.set("spark.sql.catalog.rgprobe", "graft.sources.SnapshotCatalog")
      spark.conf.set("spark.sql.catalog.rgprobe.root", root)
      val fact = spark.table("rgprobe.lake.fact")

      def scanRows(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val agg = df.agg(count(lit(1)).as("n"), sum("v").as("sv"))
        val res = agg.collect()(0)
        // AQE hides the executed tree twice over: AdaptiveSparkPlanExec
        // is a leaf wrapping the final plan, and each materialized
        // stage is a QueryStageExec LEAF wrapping its real subtree —
        // plain collect sees neither, so descend manually
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def scansIn(p: SparkPlan): Seq[BatchScanExec] = p match {
          case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
          case q: QueryStageExec => scansIn(q.plan)
          case b: BatchScanExec => Seq(b)
          case other =>
            (other.children ++ other.subqueries).flatMap(scansIn)
        }
        val all = scansIn(agg.queryExecution.executedPlan)
        all.foreach(b => println(
          s"  scan node: out=${b.metrics("numOutputRows").value} " +
            b.scan.description().take(120).replace('\n', ' ')))
        val scans = all.filter(_.scan.description().contains("fact"))
        val out = scans.headOption
          .map(_.metrics("numOutputRows").value).getOrElse(-1L)
        (res.getLong(0), out)
      }

      // baseline: STATIC IN — planning-time pushdown row-group-skips
      val keys = (77000L until 77010L).toSeq
      val (nS, outS) = scanRows(fact.filter(col("key").isin(keys: _*)))
      println(s"static IN:  matched=$nS scanOutputRows=$outS of $n")

      // probe: RUNTIME IN via a DPP join on the same keys
      val dim = spark.read.parquet(s"$root/dim").filter(col("d_tag") === "pick")
      val j = fact.join(dim, fact("key") === dim("d_key"))
      val (nR, outR) = scanRows(j)
      val decision = ScanPrune.decisions.collectFirst {
        case (tn, d) if tn.contains(".fact@") => d }
      println(s"runtime IN: matched=$nR scanOutputRows=$outR of $n " +
        s"filePrune=$decision")
      val verdict =
        if (outR < 0) "NO-SCAN (join collapsed before the fact scan ran)"
        else if (outR <= outS * 4) "runtime IN REACHES row-group skipping"
        else if (outR >= n) "runtime IN does NOT reach row groups (full file read)"
        else s"partial: $outR rows emitted"
      println(s"verdict: $verdict")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(java.nio.file.Paths.get(root))) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
      spark.stop()
    }
  }
}
