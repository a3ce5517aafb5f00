package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Structured Streaming SOURCE over a [[SnapshotLog]] table — the
  * missing lakehouse surface after round 10's ingest work, closing the
  * loop log → stream → log:
  *
  * {{{
  *   spark.readStream.format("graft-snaplog")
  *     .option("tableDir", "/data/tables/events").load()
  * }}}
  *
  * Offsets are VERSION NUMBERS (the log's own atomic clock), so a
  * micro-batch is an exact half-open version range (fromV, toV] and
  * the rows of version v are the files v's manifest lists MINUS the
  * files v−1's lists — for a [[SnapshotLog.commitAppend]] writer that
  * is precisely the appended batch, read once, never rescanned. The
  * replayable-source contract holds by construction: manifests are
  * immutable, so any offset range replays byte-identical rows after a
  * restart (the WAL can trust the checkpoint).
  *
  * Non-append versions (a [[SnapshotLog.commit]] rewrite, `optimize`,
  * `deleteWhere`/`updateWhere`) break the "new files = new rows"
  * equation — the new files RESTATE old rows. Exactly Delta's
  * streaming-source decision, resolved the same way: the stream FAILS
  * LOUDLY at such a version unless `ignoreChanges=true`, which emits
  * the rewritten files' rows (at-least-once restatement, the
  * documented Delta semantics) and is pinned by spec. Versions expired
  * by [[SnapshotLog.expireVersions]] fail loudly too — a consumer
  * lagging past retention must not silently skip history.
  *
  * Reading the manifest's parquet goes through Spark's OWN parquet
  * reader machinery — COLUMNAR when Spark's `supportBatch` admits the
  * schema ([[Bridge.parquetFileBatches]]; the plan carries
  * `ColumnarToRow ← MicroBatchScan`, and the round-12 A/B measured
  * the vectorized path at 2.1× the row path's stream throughput —
  * SCALING.md), rows otherwise ([[Bridge.parquetFileRows]] — the
  * function FileSourceScanExec itself ships to executors). Either
  * way nested types and every encoding quirk behave exactly as a
  * batch scan of the same files; this source adds offset bookkeeping,
  * not a second parquet reader. Options: `tableDir` (required),
  * `startVersion` (default 0), `ignoreChanges` (default false),
  * `columnar` (default true — `false` is the measurement escape
  * hatch, not a tuning knob). Schema is the manifest-recorded one at
  * stream start (appends cannot change it without `mergeSchema`, and
  * an evolved version streams through the PINNED schema — new
  * columns need a stream restart, the Delta decision).
  */
class SnapshotStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snaplog"

  private def tableDir(options: CaseInsensitiveStringMap): String =
    Option(options.get("tableDir")).getOrElse(
      sys.error("graft-snaplog requires option tableDir"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = tableDir(options)
    val v = SnapshotLog.latestVersion(t).getOrElse(
      sys.error(s"graft-snaplog: no committed version in $t — " +
        "commit at least once before streaming"))
    val (files, schema) = SnapshotLog.manifestAt(t, v)
    schema.getOrElse(SparkSession.active.read.parquet(files: _*).schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SnapshotStreamTable(schema, new CaseInsensitiveStringMap(properties))
}

private class SnapshotStreamTable(schema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-snaplog(${options.get("tableDir")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SnapshotLogMicroBatchStream(
          options.get("tableDir"), schema,
          options.getLong("startVersion", 0L),
          options.getBoolean("ignoreChanges", false),
          options.getBoolean("columnar", true))
      override def description(): String = name()
    }
}

/** Offset = the highest version whose rows are already emitted. */
private class VersionOffset(val v: Long) extends Offset {
  override def json: String = v.toString
}

private class SnapshotLogMicroBatchStream(tableDir: String, schema: StructType,
    startVersion: Long, ignoreChanges: Boolean,
    columnar: Boolean = true) extends MicroBatchStream {

  /** The pinned schema with each column's immutable PHYSICAL name (the
    * name in the parquet files — [[SnapshotLog.renameColumn]]'s column
    * map), captured ONCE here: physicals never change, so the capture
    * stays correct through any later rename (metadata-only) or drop
    * (old files keep the bytes; post-drop appends null-fill — the same
    * pinned-schema contract evolution established). InternalRows are
    * positional, so readers can consume physical names while the
    * stream's exposed schema stays logical. */
  private val physSchema: StructType =
    SnapshotLog.physicalizeLatest(tableDir, schema)

  override def initialOffset(): Offset = new VersionOffset(startVersion - 1)

  override def latestOffset(): Offset =
    new VersionOffset(SnapshotLog.latestVersion(tableDir)
      .getOrElse(startVersion - 1))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[VersionOffset].v
    val hi = end.asInstanceOf[VersionOffset].v
    if (hi <= lo) return Array.empty
    // one manifest read per version: version v's (files, dv) carries
    // forward as v+1's "previous" instead of re-reading v's manifest
    // (and its dv node) on the next loop step — the hot micro-batch
    // planning path reads (hi − lo) + 1 manifests, not 4 × (hi − lo)
    var prev: (Set[String], Map[String, Seq[String]]) =
      if (lo < 0) (Set.empty, Map.empty)
      else {
        val (fs, dv) = SnapshotLog.manifestFilesDvAt(tableDir, lo)
        (fs.toSet, dv)
      }
    ((lo + 1) to hi).flatMap { v =>
      val (files, dvNow) = SnapshotLog.manifestFilesDvAt(tableDir, v)
      val (prevFiles, dvPrev) = prev
      prev = (files.toSet, dvNow)
      // the advice must be actionable: a fresh stream AT version v
      // hits this same check (v compares against v−1's manifest), so
      // the skip path is startVersion = v+1, not v
      if (!ignoreChanges && !prevFiles.subsetOf(files.toSet))
        throw new IllegalStateException(
          s"graft-snaplog: version $v of $tableDir is not an append " +
            "(files were rewritten by a commit/optimize/delete/update); " +
            "restart with ignoreChanges=true to stream the restated rows " +
            s"(at-least-once), or skip them with startVersion=${v + 1} " +
            "(risks missing the restatement)")
      // a merge-on-read delete keeps the file list IDENTICAL but
      // logically removes already-emitted rows — the subset check above
      // cannot see it, so compare the dv nodes: new deletion-vector
      // entries are a change, not an append, and must not be silently
      // skipped (the Delta decision, same resolution; under
      // ignoreChanges the deletion simply never reaches the stream —
      // emitted rows stand, at-least-once semantics)
      if (!ignoreChanges && dvNow != dvPrev)
        throw new IllegalStateException(
          s"graft-snaplog: version $v of $tableDir adds merge-on-read " +
            "deletion vectors (rows already emitted were logically " +
            "deleted); restart with ignoreChanges=true to continue past " +
            s"the deletion, or skip it with startVersion=${v + 1}")
      files.filterNot(prevFiles.contains)
        .map(f => SnapshotFilePartition(f): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotFileReaderFactory(
      Bridge.parquetFileRows(SparkSession.active, physSchema),
      // `columnar=false` is the measurement escape hatch (the
      // SnapStreamBench row-vs-columnar A/B), not a tuning knob
      if (columnar) Bridge.parquetFileBatches(SparkSession.active, physSchema)
      else None)

  override def deserializeOffset(json: String): Offset =
    new VersionOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class SnapshotFilePartition(path: String) extends InputPartition

/** Serves each manifest file vectorized when Spark's own
  * `supportBatch` predicate admits the schema (`readBatches` is Some —
  * the same decision a batch scan of these files would make), else row
  * by row. The round-10 SnapStreamBench measured the row path at
  * 1.98× a batch scan; the columnar path closes exactly that gap
  * (re-measured in SCALING.md round 12). */
private case class SnapshotFileReaderFactory(
    readFile: String => Iterator[InternalRow],
    readBatches: Option[String => Iterator[
      org.apache.spark.sql.vectorized.ColumnarBatch]])
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean =
    readBatches.isDefined

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val it = readFile(p.asInstanceOf[SnapshotFilePartition].path)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val it = readBatches.get(p.asInstanceOf[SnapshotFilePartition].path)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) { batch = it.next(); true } else false
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = ()
    }
  }
}
