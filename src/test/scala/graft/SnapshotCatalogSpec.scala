package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** SQL surface of the snapshot log ([[graft.sources.SnapshotCatalog]]):
  * catalog-resolved scans read exactly the manifest's files with the
  * manifest's schema, `VERSION AS OF` is exact-version time travel
  * (missing/expired versions fail loudly), parquet pushdown survives
  * the catalog path, and the write contract is read-only.
  */
class SnapshotCatalogSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_snapcat_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    val t = s"$r/lake/events"
    SnapshotLog.commit(spark, t, spark.range(100).select(
      col("id").as("key"), (col("id") % 7).as("bucket")))
    SnapshotLog.commitAppend(spark, t, spark.range(100, 150).select(
      col("id").as("key"), (col("id") % 7).as("bucket")))
    // a directory WITHOUT a _log must not be mistaken for a table
    Files.createDirectories(Paths.get(r, "lake", "not_a_table"))
    r
  }

  private def registered() = {
    root: Unit // force the fixture before the catalog resolves
    spark.conf.set("spark.sql.catalog.snap", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  test("namespaces and tables resolve; only _log-bearing directories are tables") {
    registered()
    val ns = spark.sql("SHOW NAMESPACES IN snap").collect().map(_.getString(0))
    assert(ns.toSeq == Seq("lake"), ns.mkString(","))
    val tables = spark.sql("SHOW TABLES IN snap.lake").collect().map(_.getString(1))
    assert(tables.toSeq == Seq("events"), tables.mkString(","))
  }

  test("a catalog scan reads the latest manifest exactly; VERSION AS OF is exact time travel") {
    registered()
    assert(spark.sql("SELECT count(*) FROM snap.lake.events").head.getLong(0) == 150L)
    assert(spark.sql("SELECT count(*) FROM snap.lake.events VERSION AS OF 0")
      .head.getLong(0) == 100L)
    assert(spark.sql("SELECT count(*) FROM snap.lake.events VERSION AS OF 1")
      .head.getLong(0) == 150L)
    // the catalog scan equals the Scala read path row-for-row
    val viaSql = spark.sql("SELECT key FROM snap.lake.events VERSION AS OF 0")
      .collect().map(_.getLong(0)).sorted
    val viaApi = SnapshotLog.read(spark, s"$root/lake/events", asOf = Some(0L))
      .select("key").collect().map(_.getLong(0)).sorted
    assert(viaSql.sameElements(viaApi))
    // a version that never existed is a loud, precise error
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM snap.lake.events VERSION AS OF 9").collect()
    }
    assert(e.getMessage.contains("no version 9"), e.getMessage)
    // TIMESTAMP AS OF resolves newest-at-or-before against the
    // manifests' recorded commit timestamps (op/ts provenance)
    val hist = SnapshotLog.history(s"$root/lake/events").sortBy(_.version)
    val Seq(ts0, ts1) = hist.map(_.tsMillis)
    assert(ts0 > 0 && ts1 >= ts0, s"provenance timestamps: $ts0, $ts1")
    def fmt(ms: Long): String =
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
    // exactly v0's commit instant: at-or-before lands on v0 (when the
    // two commits share a millisecond, on v1 — both counts are legal
    // answers to "the table as of ts0" in that degenerate case)
    if (ts1 > ts0)
      assert(spark.sql(s"SELECT count(*) FROM snap.lake.events " +
        s"TIMESTAMP AS OF '${fmt(ts0)}'").head.getLong(0) == 100L)
    // at v1's instant (and any later time): the full table
    assert(spark.sql(s"SELECT count(*) FROM snap.lake.events " +
      s"TIMESTAMP AS OF '${fmt(ts1)}'").head.getLong(0) == 150L)
    // before the first commit: a loud, precise error
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM snap.lake.events TIMESTAMP AS OF '2020-01-01'").collect()
    }
    assert(e2.getMessage.contains("at or before"), e2.getMessage)
  }

  test("an evolved schema is visible through SQL; VERSION AS OF travels the schema too") {
    registered()
    val t = s"$root/lake/evolved"
    import spark.implicits._
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("key", "payload"))
    SnapshotLog.commitAppend(spark, t,
      Seq((2L, "b", 0.5)).toDF("key", "payload", "score"),
      mergeSchema = true)
    assert(spark.sql("SELECT * FROM snap.lake.evolved").columns.toSeq ==
      Seq("key", "payload", "score"))
    val rows = spark.sql(
      "SELECT key, score FROM snap.lake.evolved ORDER BY key").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some(0.5))))
    // time travel to v0 is SCHEMA travel: score does not exist there
    assert(spark.sql("SELECT * FROM snap.lake.evolved VERSION AS OF 0")
      .columns.toSeq == Seq("key", "payload"))
  }

  test("pushdown and pruning survive the catalog path") {
    registered()
    val df = spark.sql("SELECT key FROM snap.lake.events WHERE key > 120")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(key.*"), plan)
    assert(!plan.contains("bucket"), plan)
    assert(df.count() == 29L)
  }

  test("an expired version fails loudly through SQL too") {
    registered()
    val t = s"$root/lake/events"
    // give the table a third version, expire the first
    SnapshotLog.commitAppend(spark, t, spark.range(150, 160).select(
      col("id").as("key"), (col("id") % 7).as("bucket")))
    assert(SnapshotLog.expireVersions(t, keepLast = 2) == Seq(0L))
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM snap.lake.events VERSION AS OF 0").collect()
    }
    assert(e.getMessage.contains("expired"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM snap.lake.events VERSION AS OF 1")
      .head.getLong(0) == 150L)
  }

  test("statements outside the supported surface refuse with the inventory") {
    registered()
    // CREATE TABLE is supported since round 17 (SnapshotLifecycleSpec
    // owns it); what remains out of surface must still name what IS
    // supported instead of a bare unsupported-operation
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE snap.lake.events SET TBLPROPERTIES ('a'='b')")
    }
    assert(e.getMessage.contains("unsupported") &&
      e.getMessage.contains("CALL snap.system"), e.getMessage)
  }

  test("column DDL through SQL reaches the log's metadata-only commits") {
    registered()
    val t = s"$root/lake/ddl"
    import spark.implicits._
    SnapshotLog.commit(spark, t,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("key", "src", "payload"))
    val files0 = SnapshotLog.read(spark, t).inputFiles.toSet

    spark.sql("ALTER TABLE snap.lake.ddl RENAME COLUMN src TO source")
    assert(spark.table("snap.lake.ddl").columns.toSeq ==
      Seq("key", "source", "payload"))
    // (file identity via the Scala read: a DSv2-wrapped table exposes
    // no inputFiles through DataFrame plan introspection)
    assert(SnapshotLog.read(spark, t).inputFiles.toSet == files0,
      "rename through SQL must be metadata-only")
    assert(spark.sql(
      "SELECT source FROM snap.lake.ddl WHERE key = 1").head.getString(0) == "a")

    spark.sql("ALTER TABLE snap.lake.ddl ADD COLUMN note STRING")
    assert(spark.table("snap.lake.ddl").columns.toSeq ==
      Seq("key", "source", "payload", "note"))
    assert(SnapshotLog.read(spark, t).inputFiles.toSet == files0,
      "metadata-only add writes no data")
    assert(spark.sql(
      "SELECT count(*) FROM snap.lake.ddl WHERE note IS NULL")
      .head.getLong(0) == 2L, "every existing row null-fills the added column")

    spark.sql("ALTER TABLE snap.lake.ddl DROP COLUMN payload")
    assert(spark.table("snap.lake.ddl").columns.toSeq ==
      Seq("key", "source", "note"))
    // three DDL statements = three versions; the original still travels
    assert(SnapshotLog.latestVersion(t).get == 3L)
    assert(spark.sql("SELECT * FROM snap.lake.ddl VERSION AS OF 0")
      .columns.toSeq == Seq("key", "src", "payload"))
    // appends keep composing after SQL DDL (logical names)
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, "c", "n")).toDF("key", "source", "note"))
    assert(spark.sql(
      "SELECT source FROM snap.lake.ddl WHERE key = 3").head.getString(0) == "c")
  }

  test("column DDL guardrails: NOT NULL, positions, and non-DDL changes reject loudly") {
    registered()
    val t = s"$root/lake/ddlguard"
    import spark.implicits._
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("key", "payload"))

    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE snap.lake.ddlguard ADD COLUMN x INT NOT NULL")
    }
    assert(e1.getMessage.contains("nullable"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE snap.lake.ddlguard ADD COLUMN x INT FIRST")
    }
    assert(e2.getMessage.contains("append at the end"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE snap.lake.ddlguard SET TBLPROPERTIES ('a'='b')")
    }
    assert(e3.getMessage.contains("unsupported"), e3.getMessage)
    // nothing above published a version
    assert(SnapshotLog.latestVersion(t).get == 0L)

    // DROP COLUMN IF EXISTS on an absent column is a no-op (no version
    // published); without IF EXISTS it still fails loudly
    spark.sql("ALTER TABLE snap.lake.ddlguard DROP COLUMN IF EXISTS nope")
    assert(SnapshotLog.latestVersion(t).get == 0L)
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE snap.lake.ddlguard DROP COLUMN nope")
    }
    assert(e4.getMessage.toLowerCase.contains("nope"), e4.getMessage)
    // and IF EXISTS on a PRESENT column still drops it
    spark.sql("ALTER TABLE snap.lake.ddlguard DROP COLUMN IF EXISTS payload")
    assert(spark.table("snap.lake.ddlguard").columns.toSeq == Seq("key"))
    assert(SnapshotLog.latestVersion(t).get == 1L)
  }

  test("DROP COLUMN IF EXISTS on a pre-schema table fails loudly, not a silent no-op") {
    // a manifest with NO recorded schema cannot PROVE the column absent,
    // so IF EXISTS must not short-circuit — it falls through to
    // dropColumn's actionable re-commit-to-record error, same as plain
    // DROP (isolated root: the main fixture pins SHOW TABLES/NAMESPACES)
    val r = Files.createTempDirectory("graft_snapcat_legacy_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    // real data file, but a manifest that never recorded the schema
    spark.range(10).toDF("key").coalesce(1)
      .write.parquet(s"$r/lake/preschema/data")
    val part = Files.list(Paths.get(s"$r/lake/preschema/data")).iterator()
      .asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    SnapshotLog.publish(s"$r/lake/preschema", 0L, part)
    spark.conf.set("spark.sql.catalog.snaplegacy", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.snaplegacy.root", r)
    // `key` EXISTS (inferred parquet schema resolves it — a truly
    // absent name never reaches the catalog: the analyzer no-ops it),
    // but the manifest recorded no schema, so "absent" is unprovable
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE snaplegacy.lake.preschema DROP COLUMN IF EXISTS key")
    }
    assert(e.getMessage.contains("re-commit"), e.getMessage)
    assert(SnapshotLog.latestVersion(s"$r/lake/preschema").get == 0L)
  }

  test("TIMESTAMP AS OF refuses a table with pre-provenance (ts-less) versions") {
    registered()
    val t = s"$root/lake/unstamped"
    SnapshotLog.commit(spark, t, spark.range(10).select(
      col("id").as("key"), (col("id") % 3).as("bucket")))
    SnapshotLog.commitAppend(spark, t, spark.range(10, 20).select(
      col("id").as("key"), (col("id") % 3).as("bucket")))
    // simulate a pre-round-15 manifest: strip the provenance fields
    // (this is what tables committed before op/ts existed look like)
    val mf = Paths.get(t, "_log", "0.json")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(mf))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("ts"); node.remove("op")
    Files.writeString(mf, node.toString)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM snap.lake.unstamped " +
        "TIMESTAMP AS OF '2026-01-01'").collect()
    }
    assert(e.getMessage.contains("predate commit-timestamp provenance") &&
      e.getMessage.contains("VERSION AS OF"), e.getMessage)
    // version addressing is unaffected — ts-less history still reads
    assert(spark.sql(
      "SELECT count(*) FROM snap.lake.unstamped VERSION AS OF 0")
      .head.getLong(0) == 10L)
  }
}
