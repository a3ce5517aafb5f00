package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** CREATE OR REPLACE TABLE / REPLACE TABLE / atomic CTAS through the
  * staging catalog ([[graft.sources.SnapshotCatalog]] as a
  * StagingTableCatalog). The contract under test, in order of what
  * would hurt most if broken:
  *
  *  1. REPLACE PRESERVES HISTORY — the reason the staged path exists.
  *     Spark's non-staging fallback plans REPLACE as drop+create,
  *     and this catalog's dropTable deletes the directory: every
  *     committed version gone for a statement that asked to replace
  *     content. Staged replace is ONE commit (op "replace-table") at
  *     latest+1; every pre-replace version stays time-travelable.
  *  2. ATOMICITY — no manifest until commitStagedChanges: a failing
  *     SELECT or a constraint-violating definition leaves the old
  *     table (and its guards) fully intact; a failing CTAS leaves no
  *     table at all.
  *  3. GENERATION ISOLATION — the new generation starts with no
  *     colmap/retired/dv; old generations keep reading with THEIR
  *     manifests (schema travel), restore crosses back wholesale.
  *  4. CONSTRAINT SWAP — a replace redefines the table, so the old
  *     definition's CHECK constraints die with it and the new
  *     definition's take over (Delta's REPLACE semantics). */
class SnapshotReplaceSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_replace_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.rep", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.rep.root", r)
    r
  }

  test("CTAS is atomic: one create-table commit carrying the data files") {
    root
    spark.sql("CREATE TABLE rep.lake.ctas AS " +
      "SELECT id AS k, id * 3 AS v FROM range(100)")
    val dir = s"$root/lake/ctas"
    val h = SnapshotLog.history(dir)
    assert(h.map(_.op) == Seq("create-table"), h.toString)
    assert(h.head.files > 0, "v0 should carry the CTAS data files")
    val got = spark.sql("SELECT * FROM rep.lake.ctas")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == (0L until 100L).map(i => (i, i * 3)))
    // stats landed with the genesis: pruning works from version 0
    val (kept, total) = SnapshotLog.pruneFiles(dir, "k", Some(0L), Some(0L))
    assert(total > 0 && kept.size <= total)
  }

  test("a failing CTAS leaves no table (abort deletes the staged files)") {
    root
    intercept[Exception] {
      // fails at RUNTIME, mid-write — after the staged table exists,
      // before anything could publish
      spark.sql("CREATE TABLE rep.lake.broken AS " +
        "SELECT id, CASE WHEN id < 5 THEN id " +
        "ELSE CAST(raise_error('boom') AS BIGINT) END AS v FROM range(10)")
    }
    assert(!spark.catalog.tableExists("rep.lake.broken"))
    val dir = Paths.get(s"$root/lake/broken")
    // no _log ever existed; at most an empty husk of staging dirs
    assert(!Files.isDirectory(dir.resolve("_log")))
    // and the identifier is reusable immediately
    spark.sql("CREATE TABLE rep.lake.broken AS SELECT id FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM rep.lake.broken")
      .head.getLong(0) == 3L)
  }

  test("CREATE OR REPLACE TABLE AS SELECT: one commit, history preserved, time travel intact") {
    root
    val dir = s"$root/lake/corr"
    // generation 1: two commits of orders-ish data
    spark.sql("CREATE TABLE rep.lake.corr AS " +
      "SELECT id AS k, id * 7 AS price FROM range(64)")
    spark.sql("INSERT INTO rep.lake.corr SELECT id, id * 7 FROM range(64, 80)")
    spark.sql("DELETE FROM rep.lake.corr WHERE k IN (1, 2, 3)")
    val v2Count = spark.sql("SELECT count(*) FROM rep.lake.corr")
      .head.getLong(0)
    assert(v2Count == 77L)
    // the replace: different shape entirely
    spark.sql("CREATE OR REPLACE TABLE rep.lake.corr AS " +
      "SELECT CAST(id AS STRING) AS name, id * 2 AS double_id " +
      "FROM range(10)")
    val h = SnapshotLog.history(dir).sortBy(_.version)
    assert(h.map(_.op) ==
      Seq("create-table", "append", "delete-where-in-mor", "replace-table"),
      h.map(_.op).toString)
    // new generation reads with the new schema
    val now = spark.sql("SELECT * FROM rep.lake.corr")
    assert(now.schema.fieldNames.toSeq == Seq("name", "double_id"))
    assert(now.count() == 10L)
    // EVERY pre-replace version still time-travels with ITS schema,
    // dv masks included
    assert(spark.sql("SELECT count(*) FROM rep.lake.corr VERSION AS OF 2")
      .head.getLong(0) == 77L)
    assert(spark.sql("SELECT * FROM rep.lake.corr VERSION AS OF 0")
      .schema.fieldNames.toSeq == Seq("k", "price"))
    // and the old generation's files still exist on disk
    assert(SnapshotLog.read(spark, dir, asOf = Some(0L)).count() == 64L)
  }

  test("REPLACE TABLE (no AS SELECT) publishes an empty new generation; refuses on a missing table") {
    root
    val dir = s"$root/lake/plain"
    spark.sql("CREATE TABLE rep.lake.plain AS SELECT id AS k FROM range(20)")
    spark.sql("REPLACE TABLE rep.lake.plain (a BIGINT, b STRING)")
    assert(spark.sql("SELECT count(*) FROM rep.lake.plain")
      .head.getLong(0) == 0L)
    assert(spark.table("rep.lake.plain").schema.fieldNames.toSeq ==
      Seq("a", "b"))
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "replace-table")
    // the old generation is one version back
    assert(spark.sql("SELECT count(*) FROM rep.lake.plain VERSION AS OF 0")
      .head.getLong(0) == 20L)
    // inserts land against the new schema
    spark.sql("INSERT INTO rep.lake.plain VALUES (1, 'x')")
    assert(spark.sql("SELECT count(*) FROM rep.lake.plain")
      .head.getLong(0) == 1L)
    // REPLACE of a table that doesn't exist refuses (OR CREATE is the
    // both-ways form)
    intercept[Exception] {
      spark.sql("REPLACE TABLE rep.lake.absent (k BIGINT)") }
    // CREATE OR REPLACE on a missing table creates — atomically, with
    // data at v0
    spark.sql("CREATE OR REPLACE TABLE rep.lake.fresh AS " +
      "SELECT id FROM range(5)")
    assert(SnapshotLog.history(s"$root/lake/fresh").map(_.op) ==
      Seq("create-table"))
  }

  test("REPLACE swaps CHECK constraints; a violating definition refuses with the old table intact") {
    root
    val dir = s"$root/lake/guard"
    spark.sql("CREATE TABLE rep.lake.guard (k BIGINT, " +
      "CONSTRAINT pos CHECK (k > 0))")
    spark.sql("INSERT INTO rep.lake.guard VALUES (5), (6)")
    assert(SnapshotLog.constraints(dir).map(_._1) == Seq("pos"))
    // RTAS cannot declare a schema in Spark's grammar, so constraints
    // ride the PLAIN REPLACE form; an RTAS swap means the old guards
    // die and nothing replaces them — the definition is the authority
    spark.sql("CREATE OR REPLACE TABLE rep.lake.guard AS " +
      "SELECT id AS k FROM range(200, 203)")
    assert(SnapshotLog.constraints(dir).isEmpty,
      SnapshotLog.constraints(dir).toString)
    spark.sql("INSERT INTO rep.lake.guard VALUES (-7)") // nothing guards
    // plain REPLACE TABLE with an inline CHECK installs the new guard
    // on the empty new generation
    spark.sql("REPLACE TABLE rep.lake.guard (k BIGINT, " +
      "CONSTRAINT big CHECK (k > 100))")
    assert(SnapshotLog.constraints(dir).map(_._1) == Seq("big"))
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO rep.lake.guard VALUES (7)") }
    assert(e2.getMessage.contains("big"), e2.getMessage.take(300))
    spark.sql("INSERT INTO rep.lake.guard VALUES (500)")
    assert(spark.sql("SELECT count(*) FROM rep.lake.guard")
      .head.getLong(0) == 1L)
  }

  test("staged commit pre-validates definition constraints against staged data (catalog API)") {
    root
    import org.apache.spark.sql.connector.catalog.{Identifier, TableInfo}
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val dir = s"$root/lake/prevet"
    spark.sql("CREATE TABLE rep.lake.prevet AS SELECT id AS k FROM range(4)")
    // SQL cannot spell constraints on CTAS/RTAS (no schema allowed in
    // the grammar), but the catalog API can — and an engine embedding
    // this catalog might: the staged commit must refuse BEFORE any
    // manifest publishes when the staged data violates the new
    // definition's own CHECK
    val cat = spark.sessionState.catalogManager.catalog("rep")
      .asInstanceOf[graft.sources.SnapshotCatalog]
    val schema = StructType(Seq(StructField("k", LongType)))
    val info = new TableInfo.Builder()
      .withColumns(Array(
        org.apache.spark.sql.connector.catalog.Column.create("k", LongType)))
      .withProperties(new java.util.HashMap[String, String]())
      .withPartitions(Array.empty)
      .withConstraints(Array[Constraint](
        Constraint.check("big").predicateSql("k > 100").enforced(true)
          .build()))
      .build()
    val staged = cat.stageReplace(Identifier.of(Array("lake"), "prevet"), info)
    val wb = staged.asInstanceOf[
      org.apache.spark.sql.connector.catalog.SupportsWrite]
      .newWriteBuilder(new LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          CaseInsensitiveStringMap.empty()
        override def queryId(): String = "prevet-test"
        override def schema(): StructType = schema
      })
    wb.build().asInstanceOf[V1Write].toInsertableRelation
      .insert(spark.range(1, 4).selectExpr("id AS k"), overwrite = true)
    val e = intercept[Exception] { staged.commitStagedChanges() }
    assert(e.getMessage.contains("big"), e.getMessage.take(300))
    // nothing published, old guards (none) and content intact
    assert(SnapshotLog.history(dir).map(_.op) == Seq("create-table"))
    assert(spark.sql("SELECT count(*) FROM rep.lake.prevet")
      .head.getLong(0) == 4L)
    staged.abortStagedChanges()
    // the happy path through the same API: valid data commits, the
    // constraint lands, the old generation is one version back
    val staged2 = cat.stageReplace(Identifier.of(Array("lake"), "prevet"), info)
    staged2.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
      .newWriteBuilder(new LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          CaseInsensitiveStringMap.empty()
        override def queryId(): String = "prevet-test-2"
        override def schema(): StructType = schema
      }).build().asInstanceOf[V1Write].toInsertableRelation
      .insert(spark.range(200, 203).selectExpr("id AS k"), overwrite = true)
    staged2.commitStagedChanges()
    assert(SnapshotLog.constraints(dir).map(_._1) == Seq("big"))
    assert(spark.sql("SELECT count(*) FROM rep.lake.prevet")
      .head.getLong(0) == 3L)
    intercept[Exception] {
      spark.sql("INSERT INTO rep.lake.prevet VALUES (7)") }
  }

  test("generation isolation: column DDL after replace, restore across it, feed refusal") {
    root
    val dir = s"$root/lake/gen"
    // generation 1 is column-mapped: rename mints a physical name
    spark.sql("CREATE TABLE rep.lake.gen AS " +
      "SELECT id AS src, id * 2 AS v FROM range(16)")
    spark.sql("ALTER TABLE rep.lake.gen RENAME COLUMN src TO source")
    assert(spark.sql("SELECT source FROM rep.lake.gen").count() == 16L)
    val v1 = SnapshotLog.latestVersion(dir).get
    // generation 2: fresh start, no colmap
    spark.sql("CREATE OR REPLACE TABLE rep.lake.gen AS " +
      "SELECT id AS source, CAST(id AS STRING) AS note FROM range(4)")
    // column DDL keeps working on the new generation
    spark.sql("ALTER TABLE rep.lake.gen ADD COLUMN extra BIGINT")
    spark.sql("INSERT INTO rep.lake.gen VALUES (99, 'n', 1)")
    assert(spark.sql("SELECT count(*) FROM rep.lake.gen")
      .head.getLong(0) == 5L)
    // restore to the pre-replace generation brings back ITS schema and
    // ITS column map wholesale
    SnapshotLog.restore(dir, v1)
    val back = spark.sql("SELECT * FROM rep.lake.gen")
    assert(back.schema.fieldNames.toSeq == Seq("source", "v"))
    assert(back.count() == 16L)
    // the change feed refuses ranges crossing the replace — a
    // redefinition has no per-row representation; diff() is the answer
    val e = intercept[Exception] {
      SnapshotLog.readChangeFeed(spark, dir, 0L, v1 + 1).collect() }
    assert(e.getMessage.contains("diff") || e.getMessage.contains("rewrote"),
      e.getMessage.take(300))
  }

  test("DataFrameWriterV2 createOrReplace/replace ride the same staged path") {
    root
    val dir = s"$root/lake/w2r"
    spark.range(8).select(col("id").as("k")).writeTo("rep.lake.w2r").create()
    assert(SnapshotLog.history(dir).map(_.op) == Seq("create-table"))
    spark.range(3).select(col("id").as("x"), col("id").as("y"))
      .writeTo("rep.lake.w2r").createOrReplace()
    assert(SnapshotLog.history(dir).sortBy(_.version).map(_.op) ==
      Seq("create-table", "replace-table"))
    assert(spark.table("rep.lake.w2r").schema.fieldNames.toSeq ==
      Seq("x", "y"))
    spark.range(2).select(col("id").as("z")).writeTo("rep.lake.w2r").replace()
    assert(spark.table("rep.lake.w2r").schema.fieldNames.toSeq == Seq("z"))
    assert(spark.sql("SELECT count(*) FROM rep.lake.w2r VERSION AS OF 0")
      .head.getLong(0) == 8L)
  }

  test("Scala replaceTable: new generation from a DataFrame, constraints kept and enforced") {
    val dir = s"$root/scala_rep"
    SnapshotLog.commit(spark, dir, spark.range(32)
      .select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.addConstraint(spark, dir, "vcap", "v < 10000")
    // the Scala verb KEEPS constraints (the log's other verbs never
    // touch dotfiles; redefinition is the catalog statement's job) —
    // so a violating replacement refuses
    val e = intercept[Exception] {
      SnapshotLog.replaceTable(spark, dir, spark.range(3)
        .select(col("id").as("k"), (col("id") + 20000).as("v"))) }
    assert(e.getMessage.contains("vcap"), e.getMessage.take(300))
    assert(SnapshotLog.read(spark, dir).count() == 32L)
    val v = SnapshotLog.replaceTable(spark, dir, spark.range(5)
      .select(col("id").as("k"), (col("id") + 100).as("v")))
    assert(v == 1L)
    assert(SnapshotLog.read(spark, dir).count() == 5L)
    assert(SnapshotLog.read(spark, dir, asOf = Some(0L)).count() == 32L)
    assert(SnapshotLog.history(dir).maxBy(_.version).op == "replace-table")
  }

  test("refused shapes: PARTITIONED BY, properties, non-CHECK constraints, NOT ENFORCED") {
    root
    spark.sql("CREATE TABLE rep.lake.shape AS SELECT id FROM range(4)")
    val ep = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rep.lake.shape " +
        "(k BIGINT, d STRING) PARTITIONED BY (d)") }
    assert(ep.getMessage.contains("optimize"), ep.getMessage.take(300))
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rep.lake.shape (k BIGINT) " +
        "TBLPROPERTIES ('a'='b')") }
    val en = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rep.lake.shape " +
        "(k BIGINT, CONSTRAINT c CHECK (k > 0) NOT ENFORCED)") }
    assert(en.getMessage.contains("ENFORCED"), en.getMessage.take(300))
    // nothing above published: the table still reads its 4 rows
    assert(spark.sql("SELECT count(*) FROM rep.lake.shape")
      .head.getLong(0) == 4L)
  }
}
