package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Maintenance as SQL `CALL` procedures
  * ([[graft.sources.SnapshotProcedures]] on the snapshot catalog's
  * DSv2 ProcedureCatalog surface) plus the RESTORE verb underneath.
  * Contracts under test: every procedure routes to the log's own verb
  * and RETURNS its outcome as rows; restore is a metadata-only forward
  * commit whose read hash-matches the time-travel read of its target
  * (dv masks included); and the change feed refuses ranges crossing a
  * restore instead of silently lying. */
class SnapshotProcedureSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_proc_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.pc", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.pc.root", r)
    r
  }

  private def seed(name: String, n: Int = 64): String = {
    val dir = s"$root/lake/$name"
    SnapshotLog.commit(spark, dir, spark.range(n)
      .repartitionByRange(4, col("id"))
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    dir
  }

  test("CALL restore: read == VERSION AS OF target, history moves forward, op recorded") {
    val dir = seed("res")                                   // v0: 64 rows
    SnapshotLog.commitAppend(spark, dir, spark.range(64, 90)
      .select(col("id").as("k"), (col("id") * 7).as("v")))  // v1: 90 rows
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(1L, 2L)) // v2: 88
    val v0rows = SnapshotLog.read(spark, dir, asOf = Some(0L))
      .collect().map(_.toString).sorted
    val res = spark.sql(
      "CALL pc.system.restore(table => 'lake.res', version => 0)").collect()
    assert(res.length == 1 && res(0).getLong(0) == 0L && res(0).getLong(1) == 3L)
    // the restored read IS the target version's read
    val now = SnapshotLog.read(spark, dir).collect().map(_.toString).sorted
    assert(now.sameElements(v0rows) && now.length == 64)
    // SQL read through the catalog agrees
    assert(spark.sql("SELECT count(*) FROM pc.lake.res").head.getLong(0) == 64L)
    // history moved FORWARD: the in-between versions still time-travel
    assert(SnapshotLog.read(spark, dir, asOf = Some(1L)).count() == 90L)
    assert(SnapshotLog.read(spark, dir, asOf = Some(2L)).count() == 88L)
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "restore")
    // appends continue on top of the restored state
    SnapshotLog.commitAppend(spark, dir, spark.range(1000, 1001)
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    assert(SnapshotLog.read(spark, dir).count() == 65L)
  }

  test("restore to a dv-bearing version carries the masks; feed refuses ranges crossing a restore") {
    val dir = seed("resdv")                                  // v0
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(3L, 5L)) // v1: masked
    SnapshotLog.compactDeletes(spark, dir)                   // v2: clean
    SnapshotLog.restore(dir, 1L)                             // v3: masks back
    assert(SnapshotLog.dvAt(dir, 3L).nonEmpty, "restore dropped the dv masks")
    val rows = SnapshotLog.read(spark, dir).collect().map(_.getLong(0)).sorted
    assert(rows.length == 62 && !rows.contains(3L) && !rows.contains(5L))
    // the SQL masked read agrees with the Scala one at the restored tip
    assert(spark.sql("SELECT count(*) FROM pc.lake.resdv").head.getLong(0) == 62L)
    // the feed refuses ANY range crossing the restore — including the
    // mask-shrink shape the structural rewrite guard can't see
    val e = intercept[Exception] {
      SnapshotLog.readChangeFeed(spark, dir, 0L, 3L).collect() }
    assert(e.getMessage.contains("RESTORE") && e.getMessage.contains("diff"),
      e.getMessage.take(300))
    // the restored tip reads exactly as the target version did
    val v1 = SnapshotLog.read(spark, dir, asOf = Some(1L))
      .collect().map(_.toString).sorted
    val tip = SnapshotLog.read(spark, dir)
      .collect().map(_.toString).sorted
    assert(tip.sameElements(v1))
  }

  test("restore refuses expired targets and names history()") {
    val dir = seed("resexp")
    SnapshotLog.commitAppend(spark, dir, spark.range(100, 101)
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.expireVersions(dir, 1)
    val e = intercept[Exception] { SnapshotLog.restore(dir, 0L) }
    assert(e.getMessage.contains("expired") && e.getMessage.contains("history"),
      e.getMessage.take(300))
  }

  test("CALL optimize / compact_deletes / expire_versions / vacuum route and report") {
    val dir = seed("maint", n = 256)
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(7L, 11L))
    // compact_deletes materializes the masks
    val cd = spark.sql("CALL pc.system.compact_deletes('lake.maint')").collect()
    assert(cd(0).getLong(0) == 2L)
    assert(SnapshotLog.dvAt(dir, 2L).isEmpty)
    assert(SnapshotLog.read(spark, dir).count() == 254L)
    // optimize with positional + named args (z-order over k,v)
    val op = spark.sql("CALL pc.system.optimize('lake.maint', 100000, " +
      "zorder_by => 'k,v')").collect()
    assert(op(0).getLong(0) == 3L)
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "optimize-zorder")
    assert(SnapshotLog.read(spark, dir).count() == 254L)
    // expire everything but the last 2 versions, then vacuum with a
    // zero age floor (tests only — the default keeps a 1h safety floor)
    val ex = spark.sql(
      "CALL pc.system.expire_versions('lake.maint', 2)").collect()
    assert(ex(0).getInt(0) == 2)
    val vc = spark.sql("CALL pc.system.vacuum('lake.maint', 0)").collect()
    assert(vc(0).getInt(0) > 0, "vacuum reclaimed nothing after expiry")
    // the surviving tip still reads exactly
    assert(SnapshotLog.read(spark, dir).count() == 254L)
  }

  test("procedures resolve absolute-path tables; misses and unknowns are loud") {
    val dir = seed("bypath")
    SnapshotLog.commitAppend(spark, dir, spark.range(64, 65)
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    val res = spark.sql(
      s"CALL pc.system.restore(table => '$dir', version => 0)").collect()
    assert(res(0).getLong(1) == 2L)
    assert(SnapshotLog.read(spark, dir).count() == 64L)
    // unknown procedure: Spark wraps the load failure; the CAUSE names
    // the inventory
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val eu = intercept[Exception] { spark.sql("CALL pc.system.frobnicate('x')") }
    assert(msgs(eu).contains("restore"), msgs(eu).take(400))
    // wrong namespace: names system
    val en = intercept[Exception] { spark.sql("CALL pc.other.restore('x', 0)") }
    assert(msgs(en).contains("system"), msgs(en).take(400))
    // not a table
    val et = intercept[Exception] {
      spark.sql("CALL pc.system.vacuum('lake.absent')") }
    assert(et.getMessage.contains("not a snapshot table"), et.getMessage.take(300))
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE surface the inventory for free") {
    root
    val shown = spark.sql("SHOW PROCEDURES IN pc.system").collect()
      .map(_.toString).mkString("\n")
    assert(shown.contains("restore") && shown.contains("vacuum") &&
      shown.contains("add_constraint"), shown.take(400))
    val desc = spark.sql("DESCRIBE PROCEDURE pc.system.restore").collect()
      .map(_.toString).mkString("\n")
    assert(desc.contains("restore"), desc.take(400))
  }

  test("streaming change feed refuses a restore version loudly") {
    val dir = seed("resstream")
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(3L))
    SnapshotLog.restore(dir, 0L)
    SnapshotLog.commitAppend(spark, dir, spark.range(100, 102)
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    val q = spark.readStream.format("graft-snaplog")
      .option("tableDir", dir).option("startVersion", "1")
      .option("changeFeed", "true").load()
      .writeStream.format("memory").queryName("res_feed")
      .option("checkpointLocation", s"$dir/_ckpt_feed").start()
    val e = intercept[Exception] { q.processAllAvailable() }
    try {
      def msgs(x: Throwable): String =
        if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
      assert(msgs(e).contains("RESTORE"), msgs(e).take(400))
    } finally q.stop()
  }
}
