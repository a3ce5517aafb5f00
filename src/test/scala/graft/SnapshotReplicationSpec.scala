package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** CDC REPLICATION, closed end-to-end: source table → change feed
  * ([[SnapshotLog.readChangeFeed]] or the streaming `changeFeed`
  * mode) → [[SnapshotLog.applyChangeFeed]] → replica. Pinned:
  *
  *  - a feed batch spanning several versions (and carrying a key
  *    several times — delete pre-image + post-image pairs, later
  *    re-touches) compacts LAST-WINS per key before applying;
  *  - the replica reconstructs the source exactly, through MOR
  *    deletes, MOR updates, MOR merges, and maintenance rewrites the
  *    feed skips;
  *  - apply is EXACTLY-ONCE: version-keyed, a replay declines with
  *    the replica unmoved — so a foreachBatch writer over the
  *    changeFeed stream (v = batchId) is exactly-once replication
  *    under Spark's at-least-once replay contract;
  *  - a fresh replica bootstraps from its first batch (non-delete
  *    winners commit as v0). */
class SnapshotReplicationSpec extends SparkSpec {

  private def sourceTable(): String = {
    val t = Files.createTempDirectory("graft_repl_src_").toString + "/t"
    SnapshotLog.commit(spark, t,
      spark.range(400).repartitionByRange(2, col("id")).select(
        col("id").as("k"), (col("id") * 7).as("v")))
    t
  }

  private def rows(dir: String): Array[String] =
    SnapshotLog.read(spark, dir).select("k", "v")
      .collect().map(_.toString).sorted

  test("batch replication reconstructs the source through MOR churn and maintenance") {
    val src = sourceTable()
    SnapshotLog.commitAppend(spark, src,                         // v1
      spark.range(400, 450).select(col("id").as("k"), (col("id") * 7).as("v")))
    val v1 = SnapshotLog.latestVersion(src).get
    // replica bootstraps from the first window
    val replica = Files.createTempDirectory("graft_repl_dst_").toString + "/t"
    assert(SnapshotLog.applyChangeFeed(spark, replica,
      SnapshotLog.readChangeFeed(spark, src, -1, v1), "k", 0L))
    assert(rows(replica).sameElements(rows(src)))
    // churn window: MOR delete + MOR update + merge + optimize (the
    // feed skips the rewrite) — including a delete+re-touch of the
    // same key across versions (last-wins ordering matters)
    SnapshotLog.deleteWhereInMOR(spark, src, "k", Seq(5L, 6L, 410L))
    SnapshotLog.updateWhereInMOR(spark, src, "k", Seq(7L, 8L),
      Map("v" -> lit(-1L)))
    import spark.implicits._
    SnapshotLog.mergeIntoMOR(spark, src, Seq(
      (5L, 5000L, "insert"),   // deleted above, reborn here
      (7L, 7000L, "update"),   // updated above, updated again
      (9L, -9L, "delete"),
      (900L, 900L, "insert")).toDF("k", "v", "op"), "k")
    SnapshotLog.optimize(spark, src, targetRecordsPerFile = 10000L)
    val v2 = SnapshotLog.latestVersion(src).get
    // the second window applies as ONE batch — multi-version,
    // multi-touch keys, maintenance skipped
    assert(SnapshotLog.applyChangeFeed(spark, replica,
      SnapshotLog.readChangeFeed(spark, src, v1, v2), "k", 1L))
    assert(rows(replica).sameElements(rows(src)),
      s"replica diverged: ${rows(replica).length} vs ${rows(src).length}")
    // exactly-once: replaying either window declines, replica unmoved
    val before = rows(replica)
    assert(!SnapshotLog.applyChangeFeed(spark, replica,
      SnapshotLog.readChangeFeed(spark, src, v1, v2), "k", 1L))
    assert(rows(replica).sameElements(before))
  }

  test("streaming replication: changeFeed stream + foreachBatch applyChangeFeed is exactly-once") {
    val src = sourceTable()
    SnapshotLog.deleteWhereInMOR(spark, src, "k", Seq(1L, 2L))
    val replica = Files.createTempDirectory("graft_repl_sdst_").toString + "/t"
    val cp = Files.createTempDirectory("graft_repl_cp_").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-snaplog")
        .option("tableDir", src)
        .option("changeFeed", "true")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          SnapshotLog.applyChangeFeed(spark, replica, batch, "k", id): Unit
        }
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000): Unit
    }
    run()
    assert(rows(replica).sameElements(rows(src)),
      "replica must equal the source after the first stream run")
    // day-2: more churn, the SAME checkpoint catches up incrementally
    SnapshotLog.updateWhereInMOR(spark, src, "k", Seq(3L),
      Map("v" -> lit(-3L)))
    SnapshotLog.commitAppend(spark, src,
      spark.range(400, 420).select(col("id").as("k"), (col("id") * 7).as("v")))
    run()
    assert(rows(replica).sameElements(rows(src)),
      "replica must catch up after the second stream run")
  }
}
