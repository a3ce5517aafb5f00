package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance op every long-lived
  * 100 TB dataset needs (Delta/Iceberg `OPTIMIZE`, ClickHouse's part
  * merges; [[graft.migrator.Statements]] maps `OPTIMIZE TABLE` to a
  * naive full rewrite — this is the pipeline-facing form with the two
  * knobs that matter).
  *
  * Why it matters at scale: a streaming or incremental writer emits a
  * file per micro-batch per partition; after a month a table is
  * millions of KB-sized files, and every reader pays file-listing
  * round-trips, per-file footer reads, and one scheduler task per
  * file — the scan becomes metadata-bound long before it is
  * data-bound. Compaction rewrites N small files into
  * ⌈rows/target⌉ right-sized ones.
  *
  * The second knob is the one naive rewrites lose: LAYOUT. A plain
  * coalesce-style rewrite interleaves rows arbitrarily, destroying the
  * min/max clustering that made predicates prune (a z-ordered table
  * compacted naively stops skipping — ZOrderSpec measures what's at
  * stake). `clusterBy` re-range-partitions and sorts within files on
  * the cluster key during the same rewrite, so compaction REPAIRS
  * clustering instead of destroying it. CompactionSpec pins both:
  * content identity + file arithmetic, and non-overlapping per-file
  * key ranges after a clustered compaction.
  */
object Compaction {

  /** What a compaction did: file counts either side + the row count
    * that proves nothing was lost. */
  final case class Stats(filesBefore: Int, filesAfter: Int, rows: Long)

  /** Rewrite the parquet at `inDir` into `outDir` targeting
    * `targetRecordsPerFile` rows per file; optional `clusterBy`
    * re-establishes range clustering on those columns. */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetRecordsPerFile: Long,
      clusterBy: Seq[String] = Nil): Stats = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val filesBefore = df.inputFiles.length
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRecordsPerFile).toInt)
    val arranged =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else df.repartition(nFiles)
    arranged.write.mode("overwrite")
      // belt-and-braces: even if a partition lands oversized (skewed
      // cluster key), no emitted file exceeds the target by more than
      // 10%. The headroom matters: round-robin/range partitions carry
      // a few rows of jitter, and a cap at exactly the target would
      // split a 10,003-row partition into a 10,000-file and a 3-row
      // shard — re-creating the small files this op exists to remove.
      .option("maxRecordsPerFile",
        targetRecordsPerFile + math.max(1L, targetRecordsPerFile / 10))
      .parquet(outDir)
    Stats(filesBefore, spark.read.parquet(outDir).inputFiles.length, rows)
  }
}
