package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** CHECK constraints ([[SnapshotLog.addConstraint]] + the enforcement
  * funnel in every row-creating verb, + the `CALL snap.system
  * .{add,drop,show}_constraint*` procedures). The contracts under
  * test: SQL CHECK semantics (FALSE violates, NULL passes), existing
  * data validated at ADD time, every write verb enforces on exactly
  * its NEW content (deletes/maintenance/restore exempt), violations
  * refuse LOUDLY naming the constraint with NOTHING published, and
  * constraints survive a rename (they live in `_log`, which moves
  * with the table). */
class SnapshotConstraintSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_constraint_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.cns", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.cns.root", r)
    r
  }

  private def seed(name: String): String = {
    val dir = s"$root/lake/$name"
    SnapshotLog.commit(spark, dir, spark.range(1, 33)
      .select(col("id").as("k"), (col("id") * 10).as("v")))
    dir
  }

  test("add validates existing data; FALSE violates, NULL passes; nothing publishes on refusal") {
    val dir = seed("basic")
    // existing data violates -> add refuses naming a sample row
    val e0 = intercept[Exception] {
      SnapshotLog.addConstraint(spark, dir, "v_small", "v < 100") }
    assert(e0.getMessage.contains("existing data"), e0.getMessage.take(300))
    assert(SnapshotLog.constraints(dir).isEmpty)
    SnapshotLog.addConstraint(spark, dir, "v_pos", "v > 0")
    // a valid append passes
    SnapshotLog.commitAppend(spark, dir,
      spark.sql("SELECT CAST(100 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v"))
    // NULL passes (SQL CHECK semantics) — v > 0 admits null v
    SnapshotLog.commitAppend(spark, dir,
      spark.sql("SELECT CAST(101 AS BIGINT) AS k, CAST(NULL AS BIGINT) AS v"))
    val n0 = SnapshotLog.read(spark, dir).count()
    val v0 = SnapshotLog.latestVersion(dir).get
    // FALSE violates: the append refuses naming the constraint, and
    // NOTHING publishes (the orphaned directory waits for vacuum)
    val e1 = intercept[Exception] { SnapshotLog.commitAppend(spark, dir,
      spark.sql("SELECT CAST(102 AS BIGINT) AS k, CAST(-5 AS BIGINT) AS v")) }
    assert(e1.getMessage.contains("v_pos"), e1.getMessage.take(300))
    assert(SnapshotLog.latestVersion(dir).contains(v0))
    assert(SnapshotLog.read(spark, dir).count() == n0)
    // NOT NULL is spelled as a CHECK; a null k now refuses
    SnapshotLog.addConstraint(spark, dir, "k_nn", "k IS NOT NULL")
    val e2 = intercept[Exception] { SnapshotLog.commitAppend(spark, dir,
      spark.sql("SELECT CAST(NULL AS BIGINT) AS k, CAST(1 AS BIGINT) AS v")) }
    assert(e2.getMessage.contains("k_nn"), e2.getMessage.take(300))
    // drop removes the guard; the same write now lands
    SnapshotLog.dropConstraint(dir, "v_pos")
    SnapshotLog.commitAppend(spark, dir,
      spark.sql("SELECT CAST(102 AS BIGINT) AS k, CAST(-5 AS BIGINT) AS v"))
    // dropping a missing name is loud and lists what exists
    val e3 = intercept[Exception] { SnapshotLog.dropConstraint(dir, "nope") }
    assert(e3.getMessage.contains("k_nn"), e3.getMessage.take(300))
  }

  test("every row-creating verb enforces; deletes and maintenance are exempt") {
    val dir = seed("verbs")
    SnapshotLog.addConstraint(spark, dir, "v_pos", "v > 0")
    // COW update: assignment would push v negative on one key
    val e1 = intercept[Exception] { SnapshotLog.updateWhereIn(spark, dir,
      "k", Seq(5L), Map("v" -> (col("v") - lit(1000L)))) }
    assert(e1.getMessage.contains("v_pos"))
    // MOR update: same refusal
    val e2 = intercept[Exception] { SnapshotLog.updateWhereInMOR(spark, dir,
      "k", Seq(5L), Map("v" -> lit(-1L))) }
    assert(e2.getMessage.contains("v_pos"))
    // MOR merge: a violating post-image refuses; the delete feed passes
    val badFeed = spark.sql("SELECT CAST(5 AS BIGINT) AS k, " +
      "CAST(-9 AS BIGINT) AS v, 'update' AS op")
    val e3 = intercept[Exception] {
      SnapshotLog.mergeIntoMOR(spark, dir, badFeed, "k") }
    assert(e3.getMessage.contains("v_pos"))
    SnapshotLog.mergeIntoMOR(spark, dir, spark.sql(
      "SELECT CAST(5 AS BIGINT) AS k, CAST(NULL AS BIGINT) AS v, " +
        "'delete' AS op"), "k")
    // valid updates still land, and deletes/maintenance never check
    SnapshotLog.updateWhereInMOR(spark, dir, "k", Seq(6L),
      Map("v" -> lit(999L)))
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(7L))
    SnapshotLog.compactDeletes(spark, dir)
    SnapshotLog.optimize(spark, dir, targetRecordsPerFile = 100000)
    assert(SnapshotLog.read(spark, dir).filter(col("k") === 6L)
      .head.getLong(1) == 999L)
    // INSERT OVERWRITE (commit) enforces too
    val e4 = intercept[Exception] { SnapshotLog.commit(spark, dir,
      spark.sql("SELECT CAST(1 AS BIGINT) AS k, CAST(-1 AS BIGINT) AS v")) }
    assert(e4.getMessage.contains("v_pos"))
  }

  test("CALL procedures round-trip; SQL INSERT enforces; constraints survive RENAME") {
    root
    val dir = seed("sqlc")
    spark.sql("CALL cns.system.add_constraint('lake.sqlc', 'v_pos', 'v > 0')")
    val listed = spark.sql("CALL cns.system.show_constraints('lake.sqlc')")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(listed.toSeq == Seq(("v_pos", "v > 0")))
    // SQL INSERT through the catalog refuses on violation
    val e = intercept[Exception] { spark.sql(
      "INSERT INTO cns.lake.sqlc VALUES (CAST(900 AS BIGINT), CAST(-1 AS BIGINT))") }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    assert(msgs(e).contains("v_pos"), msgs(e).take(400))
    // adding a duplicate name refuses; an unresolvable predicate refuses
    intercept[Exception] { spark.sql(
      "CALL cns.system.add_constraint('lake.sqlc', 'v_pos', 'v > 10')") }
    intercept[Exception] { spark.sql(
      "CALL cns.system.add_constraint('lake.sqlc', 'bad', 'nope > 0')") }
    // rename moves the dotfiles with the directory: still enforced
    spark.sql("ALTER TABLE cns.lake.sqlc RENAME TO lake.sqlc2")
    assert(SnapshotLog.constraints(s"$root/lake/sqlc2")
      .map(_._1) == Seq("v_pos"))
    val e2 = intercept[Exception] { spark.sql(
      "INSERT INTO cns.lake.sqlc2 VALUES (CAST(901 AS BIGINT), CAST(-2 AS BIGINT))") }
    assert(msgs(e2).contains("v_pos"), msgs(e2).take(400))
    spark.sql("CALL cns.system.drop_constraint('lake.sqlc2', 'v_pos')")
    spark.sql(
      "INSERT INTO cns.lake.sqlc2 VALUES (CAST(901 AS BIGINT), CAST(-2 AS BIGINT))")
    assert(spark.sql("SELECT count(*) FROM cns.lake.sqlc2")
      .head.getLong(0) == 33L)
  }

  test("ANSI constraint DDL: ALTER TABLE ADD/DROP CONSTRAINT and CREATE TABLE … CHECK") {
    root
    val dir = seed("ddl")
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    // ALTER TABLE ADD CONSTRAINT routes to the log's own add: the
    // live data is validated first (k max is 32 — k < 10 refuses)
    val e0 = intercept[Exception] { spark.sql(
      "ALTER TABLE cns.lake.ddl ADD CONSTRAINT k_small CHECK (k < 10)") }
    assert(msgs(e0).contains("existing data") || msgs(e0).contains("violat"),
      msgs(e0).take(400))
    spark.sql("ALTER TABLE cns.lake.ddl ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(SnapshotLog.constraints(dir).map(_._1) == Seq("v_pos"))
    // …and the guard is live: a violating SQL INSERT refuses
    val e1 = intercept[Exception] { spark.sql(
      "INSERT INTO cns.lake.ddl VALUES (CAST(900 AS BIGINT), CAST(-1 AS BIGINT))") }
    assert(msgs(e1).contains("v_pos"), msgs(e1).take(400))
    // the Table reports its constraints (DESCRIBE's raw material)
    val reported = spark.sessionState.catalogManager.catalog("cns")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "ddl")).constraints()
    assert(reported.length == 1 && reported(0).name() == "v_pos" &&
      reported(0).enforced(), reported.mkString(", "))
    // DROP CONSTRAINT drops the guard; IF EXISTS swallows a repeat
    spark.sql("ALTER TABLE cns.lake.ddl DROP CONSTRAINT v_pos")
    assert(SnapshotLog.constraints(dir).isEmpty)
    spark.sql("ALTER TABLE cns.lake.ddl DROP CONSTRAINT IF EXISTS v_pos")
    val e2 = intercept[Exception] { spark.sql(
      "ALTER TABLE cns.lake.ddl DROP CONSTRAINT v_pos") }
    assert(msgs(e2).contains("v_pos"), msgs(e2).take(400))
    // CREATE TABLE with an inline CHECK: genesis + dotfile in one
    // statement, enforced from the first INSERT
    spark.sql("CREATE TABLE cns.lake.ddlc (k BIGINT, v BIGINT, " +
      "CONSTRAINT v_nn CHECK (v IS NOT NULL))")
    assert(SnapshotLog.constraints(s"$root/lake/ddlc").map(_._1) == Seq("v_nn"))
    spark.sql("INSERT INTO cns.lake.ddlc VALUES (CAST(1 AS BIGINT), CAST(5 AS BIGINT))")
    val e3 = intercept[Exception] { spark.sql(
      "INSERT INTO cns.lake.ddlc VALUES (CAST(2 AS BIGINT), CAST(NULL AS BIGINT))") }
    assert(msgs(e3).contains("v_nn"), msgs(e3).take(400))
    assert(spark.sql("SELECT count(*) FROM cns.lake.ddlc").head.getLong(0) == 1L)
  }

  test("restore is exempt by design: it may resurrect rows that predate the constraint") {
    val dir = seed("resc")                                  // v0: v in 10..320
    SnapshotLog.commit(spark, dir, spark.range(1, 9)
      .select(col("id").as("k"), (col("id") * 10).as("v"))) // v1: v <= 80
    SnapshotLog.addConstraint(spark, dir, "v_small", "v <= 80")
    // v0 violates v_small, but restore is metadata-only and exempt —
    // the constraint guards WRITES from the moment it exists
    SnapshotLog.restore(dir, 0L)
    assert(SnapshotLog.read(spark, dir).count() == 32L)
    // the next WRITE still enforces
    val e = intercept[Exception] { SnapshotLog.commitAppend(spark, dir,
      spark.sql("SELECT CAST(99 AS BIGINT) AS k, CAST(81 AS BIGINT) AS v")) }
    assert(e.getMessage.contains("v_small"))
  }
}
