package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter,
  OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** What a committed epoch DOES to the table — the three output-mode
  * faces of the table-addressed streaming sink, decided once at
  * stream build from Spark's own mode dispatch (append → [[Ingest]];
  * complete → `truncate()` on the write builder → [[Replace]]) plus
  * the explicit `upsertKey` writer option ([[Upsert]] — which is also
  * what makes UPDATE mode legal: without a key, "updated rows
  * appended" would silently duplicate keys, so the builder only
  * advertises update support when the option names the key). */
private[sources] sealed trait SnapshotSinkMode
private[sources] object SnapshotSinkMode {
  /** Append mode: epoch files append to the table ([[SnapshotLog.appendFilesIdempotent]]). */
  case object Ingest extends SnapshotSinkMode
  /** Complete mode: epoch files REPLACE the table ([[SnapshotLog.replaceFilesIdempotent]]). */
  case object Replace extends SnapshotSinkMode
  /** Update mode (or append with `upsertKey`): epoch rows upsert by
    * key on the MOR cost model ([[SnapshotLog.mergeIntoMORIdempotent]]).
    * Carries the LOGICAL schema for the feed read-back rename.
    *
    * THE PER-EPOCH KEY CONTRACT: the merge verb wants ONE row per key
    * per epoch. A catch-up epoch (the snapshot micro-batch source
    * batches every unread version into one trigger; checkpoint
    * restarts replay the identical epoch) can legally carry a key
    * twice — without help that epoch fails its one-row-per-key
    * require on EVERY replay and the stream wedges permanently.
    * `orderBy` (the `upsertOrderBy` writer option) is the escape:
    * when it names an ordering column, the epoch is compacted
    * LAST-WINS per key (max order value; ties broken deterministically
    * by full-row fingerprint) before the merge. Without it, a
    * duplicate-keyed epoch fails loudly with the fix spelled out
    * (set upsertOrderBy, or stream the `.changes` feed whose
    * `_commit_version` makes [[CdcApply]] compact for free). */
  final case class Upsert(key: String, logical: StructType,
      orderBy: Option[String] = None)
    extends SnapshotSinkMode
  /** `upsertKey` with a CHANGE-FEED-shaped stream (the table's schema
    * plus `_change_type`/`_commit_version` — what
    * `readStream.table("….changes")` emits): each epoch applies via
    * [[SnapshotLog.applyChangeFeed]] — last-wins compaction across the
    * epoch's source versions, deletes honored, then the same
    * idempotent MOR merge. One line of catalog surface replicates a
    * table: `readStream.table("c.ns.src.changes") → writeStream
    * .option("upsertKey", k).toTable("c.ns.replica")`. `logical` is
    * the full FEED schema (data columns + the two feed columns). */
  final case class CdcApply(key: String, logical: StructType)
    extends SnapshotSinkMode
}

/** The table-addressed exactly-once streaming INGEST sink —
  * `df.writeStream.toTable("snap.ns.t")` — as a real DSv2
  * [[StreamingWrite]]: executors write the micro-batch's rows straight
  * to parquet data files through Spark's own parquet
  * [[OutputWriter]] (the identical write stack `df.write.parquet`
  * uses — dictionary encoding, codegen'd row conversion, footer
  * stats), and the driver's per-epoch `commit` publishes ONE manifest
  * referencing exactly the files the committed tasks reported
  * ([[SnapshotLog.appendFilesIdempotent]]). Nothing row-sized ever
  * touches the driver: tasks ship back (path, rowCount) pairs, the
  * commit reads footers for stats — O(batch files), the same cost
  * shape as the Scala append verb.
  *
  * Exactly-once is the format sink's discipline, shared via
  * [[SnapshotLog.sinkBase]]: `v = base + epochId` where `base` is
  * registered durably in the table's log the first time this query
  * (the STABLE id — Spark passes `StreamExecution.id`, not `runId`,
  * as the write's queryId) touches the table, so a restart from the
  * checkpoint re-derives the same versions; a replayed epoch's commit
  * declines at the manifest pre-check ONLY if the manifest carries
  * this stream's txn tag (`queryId#epochId`), so a foreign commit
  * interleaving with the arithmetic fails loudly instead of silently
  * dropping the batch. A replayed epoch's re-written files orphan for
  * [[SnapshotLog.vacuum]] — at-least-once task work, exactly-once
  * table state.
  *
  * Files land under `data/stream-<queryId>/` with epoch + partition +
  * uuid names — version-independent paths, because a task writes
  * before the driver derives the version; manifests record canonical
  * absolute paths, so placement inside `data/` is all vacuum needs.
  * One file per non-empty input partition per epoch (empty partitions
  * write NOTHING — the writer opens its file lazily on the first
  * row), the same small-file cost shape as the format sink's
  * `df.write.parquet`, with `compactDeletes`/`optimize` as the
  * standing answer once a table accumulates ingest files. */
private[sources] class SnapshotStreamingWrite(spark: SparkSession,
    tableDir: String, tName: String, queryId: String,
    physicalSchema: StructType,
    mode: SnapshotSinkMode = SnapshotSinkMode.Ingest)
    extends StreamingWrite {

  private val safeQuery = queryId.replaceAll("[^A-Za-z0-9_-]", "_")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // Spark's parquet write stack, prepared ONCE on the driver: the
    // returned factory and the job configuration (schema string,
    // codec, timestamp encoding — all resolved from this session's
    // conf) serialize to every task
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty, physicalSchema)
    val dataDir = Paths.get(tableDir, "data", s"stream-$safeQuery")
      .toAbsolutePath.normalize.toString
    new SnapshotStreamWriterFactory(owf, physicalSchema, dataDir,
      new SerializableHadoopConf(job.getConfiguration))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq.collect {
      case SnapshotWriteMessage(p, n) if p != null && n > 0 => p }
    val base = SnapshotLog.sinkBase(tableDir, queryId, epochId)
    val v = base + epochId
    val tag = Some(s"$queryId#$epochId")
    mode match {
      case SnapshotSinkMode.Ingest =>
        SnapshotLog.appendFilesIdempotent(spark, tableDir, files, v,
          txn = tag): Unit
      case SnapshotSinkMode.Replace =>
        // COMPLETE mode: this epoch's files ARE the table — INSERT
        // OVERWRITE semantics per trigger, idempotent at base+epochId
        SnapshotLog.replaceFilesIdempotent(spark, tableDir, files, v,
          txn = tag): Unit
      case SnapshotSinkMode.Upsert(key, logical, orderBy) =>
        // UPDATE mode with an upsertKey: the epoch's rows are keyed
        // post-images, applied as a MOR merge (mask the old row,
        // append the new — O(epoch) + one pruned candidate scan).
        // op = "insert" is the verb's upsert spelling: an insert on
        // an existing key masks-and-replaces, on a fresh key appends.
        import org.apache.spark.sql.functions.{col, lit, md5, row_number,
          struct, to_json}
        val feed =
          if (files.isEmpty)
            // dense-version contract: an empty epoch still maps to a
            // version — the merge verb publishes a carried no-op
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(logical.fields :+
                org.apache.spark.sql.types.StructField("op",
                  org.apache.spark.sql.types.StringType)))
          else {
            val raw = spark.read.schema(physicalSchema).parquet(files: _*)
              .toDF(logical.fieldNames.toIndexedSeq: _*)
            // last-wins compaction for catch-up epochs (a multi-version
            // micro-batch may carry a key twice): keep the max-order
            // row per key, ties broken deterministically by full-row
            // fingerprint so a replayed epoch elects the same row.
            // Epoch-sized work, only under the option.
            val compacted = orderBy match {
              case Some(ob) =>
                val w = org.apache.spark.sql.expressions.Window
                  .partitionBy(col(key))
                  .orderBy(col(ob).desc,
                    md5(to_json(struct(raw.columns.map(col)
                      .toIndexedSeq: _*))).desc)
                raw.withColumn("_graft_rn", row_number().over(w))
                  .filter(col("_graft_rn") === 1).drop("_graft_rn")
              case None => raw
            }
            compacted.withColumn("op", lit("insert"))
          }
        try
          SnapshotLog.mergeIntoMORIdempotent(spark, tableDir, feed, key, v,
            txn = tag): Unit
        catch {
          // the verb's one-row-per-key require, re-raised with the
          // sink-level fixes: a checkpoint replay re-forms the same
          // epoch, so without one of these the stream wedges forever
          case e: IllegalArgumentException
              if e.getMessage != null &&
                e.getMessage.contains("one row per key") =>
            throw new IllegalArgumentException(
              s"$tName: epoch $epochId carries key `$key` more than " +
                "once (a catch-up micro-batch can span several source " +
                "versions). Fix: set .option(\"upsertOrderBy\", <col>) " +
                "to compact the epoch last-wins, or stream the " +
                "source's `.changes` feed (its _commit_version makes " +
                "the CDC-apply path compact for free). " +
                s"[${e.getMessage}]", e)
        }
        reclaimStaging(files)
      case SnapshotSinkMode.CdcApply(key, logical) =>
        // a change-feed epoch may span several source versions and
        // carry a key several times — applyChangeFeed compacts
        // last-wins (highest _commit_version; post-image outranks its
        // paired delete pre-image) before the same idempotent merge,
        // and honors deletes
        val feed =
          if (files.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              logical)
          else spark.read.schema(physicalSchema).parquet(files: _*)
            .toDF(logical.fieldNames.toIndexedSeq: _*)
        SnapshotLog.applyChangeFeed(spark, tableDir, feed, key, v,
          txn = tag): Unit
        reclaimStaging(files)
    }
  }

  // the merge re-wrote the epoch's rows as post-image files
  // (re-bucketed under a layout); the task-written staging files are
  // referenced by no manifest — reclaim them now instead of leaving a
  // per-epoch orphan stream for vacuum
  private def reclaimStaging(files: Seq[String]): Unit =
    files.foreach { f =>
      try Files.deleteIfExists(Paths.get(f)): Unit
      catch { case _: Exception => () }
    }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    // best-effort: anything a failed epoch leaves behind is an
    // unreferenced file under data/, exactly what vacuum reclaims
    messages.foreach {
      case SnapshotWriteMessage(p, _) if p != null =>
        try Files.deleteIfExists(Paths.get(p)): Unit
        catch { case _: Exception => () }
      case _ => ()
    }

  override def toString: String =
    s"SnapshotStreamingWrite($tName @ $tableDir)"
}

/** Task-side half: one lazily-opened parquet [[OutputWriter]] per
  * (epoch, partition) — opened on the FIRST row, so empty partitions
  * report zero files instead of littering the table with empty
  * parquet. The commit message carries (path, rowCount); under
  * Spark's streaming commit coordinator only one attempt per
  * partition commits, and losers' files orphan for vacuum. */
private class SnapshotStreamWriterFactory(owf: OutputWriterFactory,
    schema: StructType, dataDir: String, conf: SerializableHadoopConf)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val attempt = new org.apache.hadoop.mapreduce.TaskAttemptID(
      new org.apache.hadoop.mapreduce.TaskID(
        new org.apache.hadoop.mapreduce.JobID("graft-stream",
          (epochId % Int.MaxValue).toInt),
        org.apache.hadoop.mapreduce.TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      new org.apache.hadoop.conf.Configuration(conf.value), attempt)
    val path = s"$dataDir/e$epochId-p$partitionId-" +
      java.util.UUID.randomUUID.toString.take(8) +
      owf.getFileExtension(ctx)
    new SnapshotStreamDataWriter(owf, schema, path, ctx)
  }
}

private class SnapshotStreamDataWriter(owf: OutputWriterFactory,
    schema: StructType, path: String,
    ctx: org.apache.hadoop.mapreduce.TaskAttemptContext)
    extends DataWriter[InternalRow] {

  private var writer: OutputWriter = _
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    if (writer == null) writer = owf.newInstance(path, schema, ctx)
    writer.write(record)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    SnapshotWriteMessage(if (rows > 0) path else null, rows)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case _: Exception => () }
      writer = null
    }
    try Files.deleteIfExists(Paths.get(path)): Unit
    catch { case _: Exception => () }
  }

  override def close(): Unit = ()
}

/** (path, rows) from each committed task — the only thing that
  * crosses the executor→driver boundary per partition. */
private[sources] case class SnapshotWriteMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** Hadoop `Configuration` is not `Serializable`; this is the standard
  * write/readFields envelope for shipping the prepared job conf to
  * tasks. */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
