package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Operation provenance ([[SnapshotLog.history]] — DESCRIBE HISTORY at
  * the log's minimum): every publishing verb stamps its name and a
  * timestamp in the manifest; history reads them newest-first from the
  * `_log` listing alone (no data I/O). Advisory metadata — the read
  * path never consults it — so pre-provenance manifests coexist as
  * "unknown" and nothing else changes shape. */
class SnapshotHistorySpec extends SparkSpec {

  test("a lifecycle's history names every verb, newest first") {
    val t = Files.createTempDirectory("graft_hist_").toString + "/t"
    def rows(from: Long, n: Long) = spark.range(from, from + n).select(
      col("id").as("k"), (col("id") % 7).as("v"))
    SnapshotLog.commit(spark, t, rows(0, 1000).repartitionByRange(2, col("k")))
    SnapshotLog.commitAppend(spark, t, rows(1000, 500))
    SnapshotLog.deleteWhere(spark, t, "k", Some(0L), Some(9L))
    SnapshotLog.updateWhereIn(spark, t, "k", Seq(100L), Map("v" -> lit(-1L)))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(200L))
    SnapshotLog.compactDeletes(spark, t)
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = 1000L,
      clusterBy = Seq("k"))
    SnapshotLog.renameColumn(t, "v", "val")
    val h = SnapshotLog.history(t)
    assert(h.map(_.version) == (7L to 0L by -1L),
      s"versions: ${h.map(_.version)}")
    assert(h.map(_.op) == Seq("rename-column", "optimize",
      "compact-deletes", "delete-where-in-mor", "update-where-in",
      "delete-where", "append", "commit"), s"ops: ${h.map(_.op)}")
    // timestamps are set and non-decreasing oldest->newest
    val ts = h.reverse.map(_.tsMillis)
    assert(ts.forall(_ > 0) && ts.zip(ts.tail).forall { case (a, b) => a <= b },
      s"ts: $ts")
    // the MOR version is the only one carrying dv sidecars
    assert(h.find(_.op == "delete-where-in-mor").get.dvFiles > 0)
    assert(h.filterNot(_.op == "delete-where-in-mor").forall(_.dvFiles == 0))
    // expiry drops rows from history like every other reader
    SnapshotLog.expireVersions(t, keepLast = 2)
    assert(SnapshotLog.history(t).map(_.version) == Seq(7L, 6L))
  }

  test("DESCRIBE TABLE surfaces the publishing op through the catalog") {
    val root = Files.createTempDirectory("graft_hist_cat_").toString
    val t = s"$root/lake/tbl"
    SnapshotLog.commit(spark, t, spark.range(100).select(
      col("id").as("k"), (col("id") % 7).as("v")))
    SnapshotLog.commitAppend(spark, t, spark.range(100, 150).select(
      col("id").as("k"), (col("id") % 7).as("v")))
    val cat = s"histcat_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      val props = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.lake.tbl")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val tblProps = props.getOrElse("Table Properties", "")
      assert(tblProps.contains("snapshot.op=append"), tblProps)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("the FULL history is a SQL metadata table: snap.ns.t.history") {
    val root = Files.createTempDirectory("graft_hist_sql_").toString
    val t = s"$root/lake/tbl"
    SnapshotLog.commit(spark, t, spark.range(100).select(
      col("id").as("k"), (col("id") % 7).as("v")))
    SnapshotLog.commitAppend(spark, t, spark.range(100, 150).select(
      col("id").as("k"), (col("id") % 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(5L))
    SnapshotLog.compactDeletes(spark, t)
    val cat = s"histsql_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      val rows = spark.sql(
        s"""SELECT version, operation, timestamp, files, dv_files
            FROM $cat.lake.tbl.history ORDER BY version""").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
      assert(rows.map(_.getString(1)).toSeq ==
        Seq("commit", "append", "delete-where-in-mor", "compact-deletes"))
      assert(rows.forall(r => !r.isNullAt(2)),
        "post-provenance commits must carry timestamps")
      assert(rows(2).getInt(4) > 0 && rows(3).getInt(4) == 0,
        "only the MOR version carries dv sidecars")
      // plans as a driver-local scan — metadata never manufactures
      // distribution
      val plan = spark.sql(s"SELECT * FROM $cat.lake.tbl.history")
        .queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan"), plan.take(400))
      // the history of a missing table is a loud miss, not empty
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.lake.nosuch.history").collect()
      }
      // aggregation and filters compose like any table
      assert(spark.sql(
        s"""SELECT count(*) AS n FROM $cat.lake.tbl.history
            WHERE operation LIKE '%mor%'""").head().getLong(0) == 1L)
      // expiry drops rows from the SQL surface like every other reader
      SnapshotLog.expireVersions(t, keepLast = 2)
      assert(spark.sql(s"SELECT version FROM $cat.lake.tbl.history")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("the per-file inventory is a SQL metadata table: snap.ns.t.files") {
    val root = Files.createTempDirectory("graft_files_sql_").toString
    val t = s"$root/lake/tbl"
    SnapshotLog.commit(spark, t, spark.range(100).select(
      col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(5L))
    val cat = s"filesql_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      val rows = spark.sql(
        s"""SELECT file, masked, dv_sidecars, stats
            FROM $cat.lake.tbl.files ORDER BY file""").collect()
      assert(rows.length == 4, s"${rows.length} files")
      // exactly the file holding k=5 carries the mask
      assert(rows.count(_.getBoolean(1)) == 1)
      assert(rows.filter(_.getBoolean(1)).forall(_.getInt(2) == 1))
      // live_rows = rows − the exact :masked count on the masked file;
      // bytes = the :bytes pseudo-stat (round 18)
      val acc = spark.sql(
        s"""SELECT sum(rows) AS r, sum(live_rows) AS lr, min(bytes) AS b
            FROM $cat.lake.tbl.files""").head
      assert(acc.getLong(0) == 100L && acc.getLong(1) == 99L,
        s"rows/live_rows: $acc")
      assert(acc.getLong(2) > 0L)
      // recorded stats dig open with plain JSON functions — min of k
      // across files is the table min
      val mins = spark.sql(
        s"""SELECT CAST(get_json_object(stats, '$$.k.min') AS BIGINT) AS lo
            FROM $cat.lake.tbl.files""").collect().map(_.getLong(0))
      assert(mins.min == 0L && mins.length == 4)
      // drives maintenance decisions: the masked-file list feeds
      // compactDeletes, and after compaction the inventory is clean
      SnapshotLog.compactDeletes(spark, t)
      assert(spark.sql(s"SELECT count(*) FROM $cat.lake.tbl.files " +
        "WHERE masked").head.getLong(0) == 0L)
      // plans driver-local like .history
      val plan = spark.sql(s"SELECT * FROM $cat.lake.tbl.files")
        .queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan"), plan.take(400))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
