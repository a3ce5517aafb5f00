package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import sources.SnapshotLog

/** Table LIFECYCLE through the snapshot catalog — CREATE TABLE (the
  * log's schema-only genesis), CTAS (genesis + the ordinary INSERT
  * bridge), DROP TABLE (guarded recursive delete), RENAME TO
  * ([[SnapshotLog.rehome]]'s directory move + manifest path rewrite),
  * and namespace DDL — plus the Scala verbs underneath. The standing
  * routing contract: every lifecycle statement lands on a log-owned
  * path, so nothing the log guarantees (OCC, schema enforcement,
  * stats, time travel) is bypassed. */
class SnapshotLifecycleSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_lifecycle_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.lc", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.lc.root", r)
    r
  }

  test("CREATE TABLE publishes the schema-only genesis; reads serve the empty relation") {
    root
    spark.sql("CREATE TABLE lc.lake.fresh (k BIGINT, v STRING)")
    val dir = s"$root/lake/fresh"
    assert(SnapshotLog.latestVersion(dir).contains(0L))
    assert(SnapshotLog.history(dir).head.op == "create-table")
    assert(SnapshotLog.history(dir).head.files == 0)
    // SQL and Scala reads both serve the empty relation with the schema
    val sqlRead = spark.sql("SELECT * FROM lc.lake.fresh")
    assert(sqlRead.count() == 0L)
    assert(sqlRead.schema.fieldNames.toSeq == Seq("k", "v"))
    val scalaRead = SnapshotLog.read(spark, dir)
    assert(scalaRead.count() == 0L)
    assert(scalaRead.schema.fieldNames.toSeq == Seq("k", "v"))
    // recorded all-nullable: SQL's convention, and the always-safe
    // claim for a manifest that describes all (zero) files
    assert(scalaRead.schema.fields.forall(_.nullable))
    // aggregates over the empty genesis behave like SQL says they do
    assert(spark.sql("SELECT count(*) AS c FROM lc.lake.fresh")
      .head.getLong(0) == 0L)
  }

  test("INSERT after CREATE TABLE tightens nullability harmlessly; recorded schema stays nullable") {
    root
    spark.sql("CREATE TABLE lc.lake.ins (k BIGINT, v BIGINT)")
    val dir = s"$root/lake/ins"
    // range() produces non-nullable columns — the written files read
    // back `required`, which must tighten against the nullable genesis,
    // not refuse
    spark.sql("INSERT INTO lc.lake.ins SELECT id AS k, id * 7 AS v FROM range(64)")
    assert(SnapshotLog.read(spark, dir).count() == 64L)
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "append")
    // the recorded schema keeps the WIDER claim
    assert(SnapshotLog.read(spark, dir).schema.fields.forall(_.nullable))
    // and the full DML ladder runs on a DDL-created table
    spark.sql("DELETE FROM lc.lake.ins WHERE k IN (1, 2, 3)")
    assert(SnapshotLog.read(spark, dir).count() == 61L)
    // a type mismatch still refuses — tightening never weakened the check
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lc.lake.ins SELECT CAST(id AS STRING) AS k, id AS v FROM range(3)")
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    assert(msgs(e).contains("schema") || msgs(e).toLowerCase.contains("cast"))
  }

  test("CREATE TABLE: IF NOT EXISTS no-ops, duplicates refuse, refused shapes name their reasons") {
    root
    spark.sql("CREATE TABLE lc.lake.dup (k BIGINT)")
    spark.sql("CREATE TABLE IF NOT EXISTS lc.lake.dup (k BIGINT)") // no-op
    intercept[Exception] { spark.sql("CREATE TABLE lc.lake.dup (k BIGINT)") }
    // PARTITIONED BY names the layout story
    val ep = intercept[Exception] { spark.sql(
      "CREATE TABLE lc.lake.part (k BIGINT, d STRING) PARTITIONED BY (d)") }
    assert(ep.getMessage.contains("optimize"), ep.getMessage.take(300))
    // non-parquet provider refuses
    val eu = intercept[Exception] { spark.sql(
      "CREATE TABLE lc.lake.orc1 (k BIGINT) USING orc") }
    assert(eu.getMessage.contains("parquet"), eu.getMessage.take(300))
    // USING parquet is fine
    spark.sql("CREATE TABLE lc.lake.pq (k BIGINT) USING parquet")
    assert(SnapshotLog.latestVersion(s"$root/lake/pq").contains(0L))
    // TBLPROPERTIES / COMMENT have nowhere to live — loud, not silent
    intercept[Exception] { spark.sql(
      "CREATE TABLE lc.lake.props (k BIGINT) TBLPROPERTIES ('a'='b')") }
    // a case-variant duplicate column refuses at genesis — Spark's own
    // analyzer catches it before the catalog (COLUMN_ALREADY_EXISTS
    // under case-insensitive resolution); the Scala verb's guard is
    // pinned in its own test below
    val ec = intercept[Exception] { spark.sql(
      "CREATE TABLE lc.lake.cc (score BIGINT, Score BIGINT)") }
    assert(ec.getMessage.toLowerCase.contains("already exists"),
      ec.getMessage.take(300))
  }

  test("CTAS lands as ONE atomic create-table commit carrying its data") {
    root
    spark.sql("CREATE TABLE lc.lake.ctas AS " +
      "SELECT id AS k, id * 3 AS v FROM range(100)")
    val dir = s"$root/lake/ctas"
    val got = spark.sql("SELECT * FROM lc.lake.ctas")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == (0L until 100L).map(i => (i, i * 3)))
    // provenance shows the staged shape: one commit, data at genesis
    // (the staging catalog — SnapshotReplaceSpec pins the rest)
    val h = SnapshotLog.history(dir).sortBy(_.version)
    assert(h.map(_.op) == Seq("create-table"), h.map(_.op).toString)
    assert(h.head.files > 0)
    assert(spark.sql("SELECT count(*) FROM lc.lake.ctas VERSION AS OF 0")
      .head.getLong(0) == 100L)
  }

  test("Scala createTable is genesis-only and refuses case-variant columns") {
    val dir = s"$root/scala_ct"
    SnapshotLog.createTable(dir, StructType(Seq(
      StructField("k", LongType, nullable = false)))) // normalized nullable
    val e = intercept[Exception] { SnapshotLog.createTable(dir,
      StructType(Seq(StructField("x", LongType)))) }
    assert(e.getMessage.contains("genesis"), e.getMessage.take(200))
    intercept[Exception] { SnapshotLog.createTable(s"$root/scala_cc",
      StructType(Seq(StructField("a", LongType), StructField("A", LongType)))) }
  }

  test("DROP TABLE deletes exactly one _log-bearing directory; IF EXISTS swallows misses") {
    root
    spark.sql("CREATE TABLE lc.lake.doomed AS SELECT id FROM range(10)")
    assert(Files.isDirectory(Paths.get(s"$root/lake/doomed")))
    spark.sql("DROP TABLE lc.lake.doomed")
    assert(!Files.exists(Paths.get(s"$root/lake/doomed")))
    spark.sql("DROP TABLE IF EXISTS lc.lake.doomed") // no-op
    intercept[Exception] { spark.sql("DROP TABLE lc.lake.doomed") }
    // a directory WITHOUT the _log marker is not this catalog's to drop
    Files.createDirectories(Paths.get(s"$root/lake/not_a_table"))
    intercept[Exception] { spark.sql("DROP TABLE lc.lake.not_a_table") }
    assert(Files.isDirectory(Paths.get(s"$root/lake/not_a_table")))
  }

  test("RENAME TO rehomes: manifests rewritten, content + time travel + dv masks + stats pruning survive") {
    root
    val a = s"$root/lake/ren_a"
    SnapshotLog.commit(spark, a, spark.range(64)
      .repartitionByRange(4, col("id"))
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.commitAppend(spark, a, spark.range(64, 80)
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, a, "k", Seq(3L, 5L, 8L))
    val before = SnapshotLog.read(spark, a).collect().map(_.toString).sorted
    val beforeV1 = SnapshotLog.read(spark, a, asOf = Some(1L)).count()
    spark.sql("ALTER TABLE lc.lake.ren_a RENAME TO lake.ren_b")
    val b = s"$root/lake/ren_b"
    assert(!Files.exists(Paths.get(a)) && Files.isDirectory(Paths.get(b)))
    // content survives, dv masks included (the deleted keys stay deleted)
    val after = SnapshotLog.read(spark, b).collect().map(_.toString).sorted
    assert(after.sameElements(before))
    assert(spark.sql("SELECT count(*) FROM lc.lake.ren_b").head.getLong(0) == 77L)
    // time travel reads the rewritten old manifests
    assert(SnapshotLog.read(spark, b, asOf = Some(1L)).count() == beforeV1)
    // stats pruning still fires: the range-clustered v0 layout prunes
    val (kept, total) = SnapshotLog.pruneFiles(b, "k", Some(0L), Some(5L))
    assert(kept.size < total,
      s"stats prune dead after rehome: ${kept.size}/$total")
    // the old identifier is gone; writes land at the new one
    intercept[Exception] { spark.sql("SELECT * FROM lc.lake.ren_a") }
    spark.sql("INSERT INTO lc.lake.ren_b VALUES (999, 999)")
    assert(SnapshotLog.read(spark, b).count() == 78L)
  }

  test("rehome pre-flight refuses foreign paths before moving anything") {
    val dir = s"$root/rehome_bad"
    SnapshotLog.commit(spark, dir, spark.range(4).select(col("id").as("k")))
    // poison one manifest with a path outside the table directory
    val lp = Paths.get(dir, "_log", "0.json")
    val node = Files.readString(lp)
    val foreign = node.replaceFirst("\"files\"\\s*:\\s*\\[",
      "\"files\":[\"/somewhere/else/x.parquet\",")
    Files.writeString(lp, foreign)
    val e = intercept[Exception] {
      SnapshotLog.rehome(spark, dir, s"$root/rehome_bad_moved") }
    assert(e.getMessage.contains("outside the table directory"))
    assert(Files.isDirectory(Paths.get(dir))) // nothing moved
  }

  test("TRUNCATE is one metadata-only commit; restore un-truncates; DELETE without WHERE routes to it") {
    root
    val dir = s"$root/lake/trunc"
    SnapshotLog.commit(spark, dir, spark.range(64)
      .select(col("id").as("k"), (col("id") * 2).as("v")))
    val filesBefore = SnapshotLog.read(spark, dir).inputFiles.toSet
    spark.sql("TRUNCATE TABLE lc.lake.trunc")
    assert(spark.sql("SELECT count(*) FROM lc.lake.trunc").head.getLong(0) == 0L)
    assert(spark.table("lc.lake.trunc").schema.fieldNames.toSeq == Seq("k", "v"))
    val h = SnapshotLog.history(dir).maxBy(_.version)
    assert(h.op == "truncate" && h.files == 0)
    // METADATA-only: the old data files still exist on disk (time
    // travel serves them until expiry + vacuum)
    assert(filesBefore.forall(f =>
      Files.exists(Paths.get(new java.net.URI(f).getPath))))
    assert(spark.sql("SELECT count(*) FROM lc.lake.trunc VERSION AS OF 0")
      .head.getLong(0) == 64L)
    // appends continue on the empty table
    spark.sql("INSERT INTO lc.lake.trunc VALUES (999, 999)")
    assert(spark.sql("SELECT count(*) FROM lc.lake.trunc").head.getLong(0) == 1L)
    // restore is the exact inverse: un-truncate
    SnapshotLog.restore(dir, 0L)
    assert(SnapshotLog.read(spark, dir).count() == 64L)
    // DELETE without WHERE is the same metadata-only verb
    spark.sql("DELETE FROM lc.lake.trunc")
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "truncate")
    assert(spark.sql("SELECT count(*) FROM lc.lake.trunc").head.getLong(0) == 0L)
    // the change feed refuses ranges crossing a truncate/restore —
    // per-row pre-images for a whole table are diff()'s job
    val e = intercept[Exception] {
      SnapshotLog.readChangeFeed(spark, dir, 0L,
        SnapshotLog.latestVersion(dir).get).collect() }
    assert(e.getMessage.contains("RESTORE") || e.getMessage.contains("rewrote"),
      e.getMessage.take(300))
  }

  test("DataFrameWriterV2: writeTo(...).create() is CTAS, .append() the V1 bridge") {
    root
    spark.range(3).select(col("id").as("k"), (col("id") * 7).as("v"))
      .writeTo("lc.lake.w2").create()
    val dir = s"$root/lake/w2"
    assert(SnapshotLog.history(dir).sortBy(_.version).map(_.op) ==
      Seq("create-table")) // atomic staged CTAS: data rides the genesis
    spark.range(3, 5).select(col("id").as("k"), (col("id") * 7).as("v"))
      .writeTo("lc.lake.w2").append()
    assert(SnapshotLog.read(spark, dir).count() == 5L)
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "append")
    // the typed face enforces the recorded schema like every append
    val e = intercept[Exception] {
      spark.range(1).select(col("id").cast("string").as("k"),
        col("id").as("v")).writeTo("lc.lake.w2").append()
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    assert(msgs(e).toLowerCase.contains("schema") ||
      msgs(e).toLowerCase.contains("cast"), msgs(e).take(300))
  }

  test("namespace DDL: create = mkdir, drop only when empty, CASCADE refused") {
    root
    spark.sql("CREATE NAMESPACE lc.ns2")
    assert(Files.isDirectory(Paths.get(s"$root/ns2")))
    intercept[Exception] { spark.sql("CREATE NAMESPACE lc.ns2") }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lc.ns2") // no-op
    spark.sql("CREATE TABLE lc.ns2.t (k BIGINT)")
    val en = intercept[Exception] { spark.sql("DROP NAMESPACE lc.ns2") }
    assert(en.getMessage.toLowerCase.contains("empty")
      || en.getMessage.contains("NON_EMPTY"), en.getMessage.take(300))
    val ec = intercept[Exception] { spark.sql("DROP NAMESPACE lc.ns2 CASCADE") }
    assert(ec.getMessage.contains("per-table"), ec.getMessage.take(300))
    spark.sql("DROP TABLE lc.ns2.t")
    spark.sql("DROP NAMESPACE lc.ns2")
    assert(!Files.exists(Paths.get(s"$root/ns2")))
    // CREATE TABLE into a namespace that doesn't exist is a loud miss
    intercept[Exception] { spark.sql("CREATE TABLE lc.absent.t (k BIGINT)") }
  }
}
