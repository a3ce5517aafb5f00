package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** SQL DML on snapshot-catalog tables ([[graft.sources.SnapshotSqlDml]]
  * + [[graft.sources.SnapshotCatalog]]'s V1 write bridge). The
  * contract under test: every SQL verb routes to the log's OWN Scala
  * verb, so a SQL statement and its Scala twin leave byte-identical
  * table states — same rows, same op provenance, same MOR shape (no
  * data-file rewrites on DELETE/UPDATE/MERGE) — including dv-bearing
  * starting versions and column-mapped tables; and shapes the point-
  * DML verbs cannot express refuse LOUDLY at analysis, naming the
  * Scala alternative. */
class SnapshotSqlDmlSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_sqldml_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.sdml", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.sdml.root", r)
    r
  }

  /** Twin tables with identical content: SQL runs on `.a`, the Scala
    * verb on `.b`; the test compares final states. */
  private def twins(prefix: String, n: Int = 64): (String, String, String, String) = {
    val a = s"$root/lake/${prefix}_a"
    val b = s"$root/lake/${prefix}_b"
    def seed(t: String): Unit = SnapshotLog.commit(spark, t,
      spark.range(n).repartitionByRange(4, col("id"))
        .select(col("id").as("k"), (col("id") * 7).as("v"))): Unit
    seed(a); seed(b)
    (a, b, s"sdml.lake.${prefix}_a", s"sdml.lake.${prefix}_b")
  }

  private def state(t: String): (Seq[String], String, Int, Int) = {
    val rows = SnapshotLog.read(spark, t).collect().map(_.toString).sorted.toSeq
    val v = SnapshotLog.latestVersion(t).get
    val h = SnapshotLog.history(t).maxBy(_.version)
    (rows, h.op, h.files, h.dvFiles)
  }

  test("INSERT INTO routes to commitAppend; INSERT OVERWRITE to commit") {
    val (a, b, sqlA, _) = twins("ins")
    spark.sql(s"INSERT INTO $sqlA VALUES (1000, 7000), (1001, 7007)")
    SnapshotLog.commitAppend(spark, b, pairsDf(Seq((1000L, 7000L), (1001L, 7007L)), "k", "v"))
    val (ra, opA, _, _) = state(a)
    val (rb, opB, _, _) = state(b)
    assert(opA == "append" && opB == "append")
    assert(ra == rb && ra.size == 66, s"${ra.size}")
    // history is intact: the pre-insert version still reads
    assert(SnapshotLog.read(spark, a, asOf = Some(0L)).count() == 64L)
    // OVERWRITE is the full-replacement commit
    spark.sql(s"INSERT OVERWRITE $sqlA SELECT id AS k, id * 2 AS v FROM range(5)")
    SnapshotLog.commit(spark, b,
      spark.range(5).select(col("id").as("k"), (col("id") * 2).as("v")))
    val (ra2, opA2, _, _) = state(a)
    val (rb2, opB2, _, _) = state(b)
    assert(ra2 == rb2 && ra2.size == 5 && opA2 == "commit" && opB2 == "commit")
    // the appended generation is still one VERSION AS OF away
    assert(spark.sql(s"SELECT count(*) FROM $sqlA VERSION AS OF 1")
      .head.getLong(0) == 66L)
  }

  test("INSERT INTO enforces the recorded schema through commitAppend") {
    val (a, _, sqlA, _) = twins("insbad")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $sqlA SELECT id AS k, CAST(id AS STRING) AS v " +
        "FROM range(3)")
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    // either Spark's own type check or the verb's read-back enforcement
    assert(msgs(e).contains("schema") || msgs(e).toLowerCase.contains("cast"),
      msgs(e).take(400))
    assert(SnapshotLog.latestVersion(a).get == 0L) // nothing published
  }

  test("DELETE FROM ... WHERE k IN (...) hash-matches deleteWhereInMOR, MOR shape included") {
    val (a, b, sqlA, _) = twins("del")
    spark.sql(s"DELETE FROM $sqlA WHERE k IN (3, 5, 8)")
    SnapshotLog.deleteWhereInMOR(spark, b, "k", Seq(3L, 5L, 8L))
    val (ra, opA, filesA, dvA) = state(a)
    val (rb, opB, filesB, dvB) = state(b)
    assert(ra == rb && ra.size == 61)
    assert(opA == "delete-where-in-mor" && opB == opA)
    assert(filesA == filesB && dvA == dvB && dvA > 0,
      s"files=$filesA/$filesB dv=$dvA/$dvB — DELETE must be MOR (no rewrite)")
    // equality and OR-of-equality translate too
    spark.sql(s"DELETE FROM $sqlA WHERE k = 10 OR k = 11")
    SnapshotLog.deleteWhereInMOR(spark, b, "k", Seq(10L, 11L))
    assert(state(a)._1 == state(b)._1)
    // SQL reads compose through the new mask
    assert(spark.sql(s"SELECT count(*) FROM $sqlA").head.getLong(0) == 59L)
  }

  test("UPDATE ... SET v = v + 1 WHERE k = 7 hash-matches updateWhereInMOR (pre-image visible)") {
    val (a, b, sqlA, _) = twins("upd")
    spark.sql(s"UPDATE $sqlA SET v = v + 1000000 WHERE k = 7")
    SnapshotLog.updateWhereInMOR(spark, b, "k", Seq(7L),
      Map("v" -> (col("v") + 1000000L)))
    val (ra, opA, _, dvA) = state(a)
    val (rb, opB, _, dvB) = state(b)
    assert(ra == rb && opA == "update-where-in-mor" && opB == opA &&
      dvA == dvB && dvA > 0)
    assert(spark.sql(s"SELECT v FROM $sqlA WHERE k = 7").head.getLong(0) ==
      7L * 7 + 1000000L)
    // a second UPDATE sees the post-image (it lives in an unmasked file)
    spark.sql(s"UPDATE $sqlA SET v = v + 1 WHERE k = 7")
    assert(spark.sql(s"SELECT v FROM $sqlA WHERE k = 7").head.getLong(0) ==
      7L * 7 + 1000001L)
  }

  test("MERGE upsert hash-matches mergeIntoMOR; MERGE delete shape feeds deletes") {
    val (a, b, sqlA, _) = twins("mrg")
    val src = spark.range(60, 70)
      .select(col("id").as("k"), (col("id") * 100).as("v"))
    src.createOrReplaceTempView("mrg_src")
    spark.sql(s"""MERGE INTO $sqlA t USING mrg_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    SnapshotLog.mergeIntoMOR(spark, b,
      src.withColumn("op", lit("update")), "k")
    val (ra, opA, _, _) = state(a)
    val (rb, opB, _, _) = state(b)
    assert(ra == rb && ra.size == 70 && opA == "merge-mor" && opB == opA)
    assert(spark.sql(s"SELECT v FROM $sqlA WHERE k = 63").head.getLong(0) == 6300L)
    // delete shape: sole WHEN MATCHED THEN DELETE; absent keys (70..74
    // never existed) no-op — the verb's contract
    spark.range(68, 75).select(col("id").as("k"))
      .createOrReplaceTempView("mrg_del")
    spark.sql(s"""MERGE INTO $sqlA t USING mrg_del s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    SnapshotLog.mergeIntoMOR(spark, b, spark.range(68, 75).select(
      col("id").as("k"), lit(null).cast("bigint").as("v"),
      lit("delete").as("op")), "k")
    assert(state(a)._1 == state(b)._1)
    assert(spark.sql(s"SELECT count(*) FROM $sqlA").head.getLong(0) == 68L)
    assert(spark.sql(s"SELECT max(k) FROM $sqlA").head.getLong(0) == 67L)
  }

  test("SQL DML composes onto a dv-BEARING starting version and a COLUMN-MAPPED table") {
    val (a, b, sqlA, _) = twins("dvmap")
    // dv-bearing base: a MOR delete first
    SnapshotLog.deleteWhereInMOR(spark, a, "k", Seq(2L))
    SnapshotLog.deleteWhereInMOR(spark, b, "k", Seq(2L))
    // column map: logical v -> renamed logical "val" (physical stays v)
    SnapshotLog.renameColumn(a, "v", "val")
    SnapshotLog.renameColumn(b, "v", "val")
    spark.sql(s"UPDATE $sqlA SET val = val - 1 WHERE k IN (4, 6)")
    SnapshotLog.updateWhereInMOR(spark, b, "k", Seq(4L, 6L),
      Map("val" -> (col("val") - 1)))
    val (ra, opA, _, dvA) = state(a)
    val (rb, _, _, dvB) = state(b)
    assert(ra == rb && opA == "update-where-in-mor" && dvA == dvB)
    spark.sql(s"DELETE FROM $sqlA WHERE k = 9")
    SnapshotLog.deleteWhereInMOR(spark, b, "k", Seq(9L))
    assert(state(a)._1 == state(b)._1)
    assert(spark.sql(s"SELECT val FROM $sqlA WHERE k = 4").head.getLong(0) ==
      4L * 7 - 1)
    // INSERT under the map speaks logical names and carries the mask
    spark.sql(s"INSERT INTO $sqlA VALUES (500, 500)")
    SnapshotLog.commitAppend(spark, b,
      pairsDf(Seq((500L, 500L)), "k", "val"))
    assert(state(a)._1 == state(b)._1)
    assert(spark.sql(s"SELECT count(*) FROM $sqlA WHERE k = 2")
      .head.getLong(0) == 0L) // still masked
  }

  test("general predicates route to the WhereMOR verbs, hash-matching the Scala twins") {
    val (a, b, sqlA, _) = twins("gpred")
    // range DELETE — no membership list, masked by the predicate
    spark.sql(s"DELETE FROM $sqlA WHERE k < 5")
    SnapshotLog.deleteWhereMOR(spark, b, col("k") < 5L)
    val (ra, opA, filesA, dvA) = state(a)
    val (rb, opB, filesB, dvB) = state(b)
    assert(ra == rb && ra.size == 59)
    assert(opA == "delete-where-mor" && opB == opA)
    // file count unchanged (no rewrite) and masks present on both;
    // the PER-FILE dv spread may differ — repartitionByRange samples
    // with an RDD-id-derived seed, so the twins' range boundaries can
    // legitimately split the matched rows across different files
    assert(filesA == 4 && filesB == 4 && dvA > 0 && dvB > 0,
      s"files=$filesA/$filesB dv=$dvA/$dvB — general DELETE must be MOR")
    // cross-column OR + arithmetic — the shapes the membership path
    // refused for years
    spark.sql(s"DELETE FROM $sqlA WHERE k = 60 OR v % 100 = 49")
    SnapshotLog.deleteWhereMOR(spark, b,
      col("k") === 60L || col("v") % 100 === 49L)
    assert(state(a)._1 == state(b)._1)
    // general UPDATE: mask + post-image in one commit, assignments see
    // the pre-image
    spark.sql(s"UPDATE $sqlA SET v = v + 1000000 WHERE k >= 40 AND k < 44")
    SnapshotLog.updateWhereMOR(spark, b, col("k") >= 40L && col("k") < 44L,
      Map("v" -> (col("v") + 1000000L)))
    val (ra2, opA2, _, dvA2) = state(a)
    val (rb2, opB2, _, dvB2) = state(b)
    assert(ra2 == rb2 && opA2 == "update-where-mor" && opB2 == opA2 &&
      dvA2 > 0 && dvB2 > 0)
    assert(spark.sql(s"SELECT v FROM $sqlA WHERE k = 41").head.getLong(0) ==
      41L * 7 + 1000000L)
    // NULL never matches (SQL WHERE semantics): a predicate that is
    // NULL for every row masks nothing and publishes a dv-free version
    val vBefore = SnapshotLog.read(spark, a).count()
    spark.sql(s"DELETE FROM $sqlA WHERE k < CAST(NULL AS BIGINT)")
    assert(SnapshotLog.read(spark, a).count() == vBefore)
    // under a COLUMN MAP the predicate speaks the LOGICAL name; the
    // marks scan restates physical columns under it
    val (m, _, sqlM, _) = twins("gmap")
    SnapshotLog.renameColumn(m, "v", "val")
    spark.sql(s"DELETE FROM $sqlM WHERE val >= 7 AND val < 70") // k 1..9
    assert(SnapshotLog.read(spark, m).count() == 55L)
    assert(SnapshotLog.read(spark, m).columns.toSeq == Seq("k", "val"))
    // the predicate prunes files before the position scan: a range ask
    // on the clustered key keeps a strict subset (ScanPrune decision)
    val (c, _, sqlC, _) = twins("gprune")
    spark.sql(s"DELETE FROM $sqlC WHERE k >= 0 AND k < 8")
    val dec = graft.sources.ScanPrune.decisions.collectFirst {
      case (name, d) if name.contains("gprune_a@delete-where-mor") => d }
    assert(dec.exists { case (kept, total) => kept < total && total == 4 },
      s"expected a pruned candidate set, got $dec")
    assert(SnapshotLog.read(spark, c).count() == 56L)
  }

  test("untranslatable shapes refuse loudly, naming the Scala API") {
    val (_, _, sqlA, _) = twins("refuse")
    def rootMsg(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + rootMsg(x.getCause)
    // subquery predicate: no meaning against the verb's own later scan
    val e1 = intercept[Exception] {
      spark.sql(s"DELETE FROM $sqlA WHERE k IN (SELECT id FROM range(5))") }
    assert(rootMsg(e1).contains("subquery") ||
      rootMsg(e1).contains("deleteWhereIn"), rootMsg(e1).take(300))
    // UPDATE without WHERE: whole-table rewrite
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $sqlA SET v = 0") }
    assert(rootMsg(e2).contains("updateWhereIn"), rootMsg(e2).take(300))
    // non-deterministic predicate: the masked set must be the one
    // every re-evaluation sees
    val e3 = intercept[Exception] {
      spark.sql(s"DELETE FROM $sqlA WHERE rand() < 0.5") }
    assert(rootMsg(e3).contains("non-deterministic"), rootMsg(e3).take(300))
    // MERGE with a subquery in a clause condition
    spark.range(3).select(col("id").as("k"), col("id").as("v"))
      .createOrReplaceTempView("refuse_src")
    val e4 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $sqlA t USING refuse_src s ON t.k = s.k
        WHEN MATCHED AND t.v > (SELECT avg(id) FROM range(5))
        THEN UPDATE SET v = s.v""") }
    assert(rootMsg(e4).contains("subquery"), rootMsg(e4).take(400))
    // nothing published by any refusal
    assert(spark.sql(s"SELECT count(*) FROM $sqlA").head.getLong(0) == 64L)
  }

  test("MERGE WITH SCHEMA EVOLUTION: Spark evolves through alterTable, then merges") {
    val (a, _, sqlA, _) = twins("evomerge")
    // source carries a column the target lacks — the analyzer's
    // ResolveMergeIntoSchemaEvolution must derive ADD COLUMN extra,
    // route it through the catalog's alterTable (the log's
    // metadata-only addColumn), and re-resolve the merge against the
    // evolved relation
    spark.range(32, 96)
      .select(col("id").as("k"), (col("id") * 1000).as("v"),
        concat(lit("x"), col("id")).as("extra"))
      .createOrReplaceTempView("evomerge_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $sqlA t
      USING evomerge_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql(
      s"SELECT k, v, extra FROM $sqlA ORDER BY k").collect()
    assert(got.length == 96)
    // pre-merge rows (k < 32) read null for the evolved column; the
    // merge's own rows carry the source values
    assert(got.take(32).forall(_.isNullAt(2)))
    assert(got.drop(32).forall(r =>
      r.getString(2) == s"x${r.getLong(0)}" &&
        r.getLong(1) == r.getLong(0) * 1000))
    // the evolution is a metadata-only commit in the history, then the
    // merge's own MOR commit
    // history: genesis commit → the analyzer's metadata-only evolution
    // → the merge (the evolved SET */INSERT * is a full-row upsert, so
    // it lands on the keyed FEED fast path — evolution composes with it)
    val ops = SnapshotLog.history(a).sortBy(_.version).map(_.op)
    assert(ops.contains("add-column") &&
      Set("merge-mor", "merge-where-mor").contains(ops.last), ops.toString)
    // vacuous evolution (no new source columns) stays a plain merge
    spark.range(0, 4).select(col("id").as("k"), lit(7L).as("v"),
      lit("y").as("extra")).createOrReplaceTempView("evomerge_src2")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $sqlA t
      USING evomerge_src2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(spark.sql(s"SELECT count(*) FROM $sqlA WHERE v = 7")
      .head.getLong(0) == 4L)
  }

  test("general MERGE shapes route to mergeWhereMOR, hash-matching the Scala twin") {
    import SnapshotLog.{MergeDelete, MergeInsert, MergeUpdate}
    val (a, b, sqlA, _) = twins("gmerge")
    def src() = spark.range(32, 96)
      .select(col("id").as("sk"), (col("id") * 1000).as("sv"))
    src().createOrReplaceTempView("gmerge_src")
    // conditional matched clauses (first wins), PARTIAL assignment,
    // guarded insert, NOT MATCHED BY SOURCE — none of it feed-shaped
    spark.sql(s"""MERGE INTO $sqlA t USING gmerge_src s
      ON t.k = s.sk AND s.sk < 90
      WHEN MATCHED AND s.sk % 10 = 0 THEN DELETE
      WHEN MATCHED AND t.k % 2 = 0 THEN UPDATE SET v = s.sv
      WHEN NOT MATCHED AND s.sk < 80 THEN INSERT (k, v) VALUES (s.sk, -s.sk)
      WHEN NOT MATCHED BY SOURCE AND t.k < 5 THEN UPDATE SET v = -999""")
    SnapshotLog.mergeWhereMOR(spark, b, src(),
      col("t.k") === col("s.sk") && col("s.sk") < 90,
      matched = Seq(
        MergeDelete(Some(col("s.sk") % 10 === 0)),
        MergeUpdate(Some(col("t.k") % 2 === 0), Map("v" -> col("s.sv")))),
      notMatched = Seq(MergeInsert(Some(col("s.sk") < 80),
        Map("k" -> col("s.sk"), "v" -> (col("s.sk") * -1)))),
      notMatchedBySource = Seq(
        MergeUpdate(Some(col("t.k") < 5), Map("v" -> lit(-999L)))))
    val (ra, opA, _, dvA) = state(a)
    val (rb, opB, _, dvB) = state(b)
    assert(ra == rb, s"diff: ${ra.toSet -- rb.toSet} / ${rb.toSet -- ra.toSet}")
    assert(opA == "merge-where-mor" && opB == opA && dvA > 0 && dvB > 0)
    // the fast-path feed shapes still take the dedicated command
    spark.sql(s"""MERGE INTO $sqlA t USING gmerge_src s ON t.k = s.sk
      WHEN MATCHED THEN DELETE""")
    assert(state(a)._2 == "merge-mor")
  }

  test("a pre-schema table read-only-wraps: INSERT cannot bypass the manifest") {
    val t = s"$root/lake/preschema"
    SnapshotLog.commit(spark, t, spark.range(10).select(
      col("id").as("k"), (col("id") * 7).as("v")))
    // simulate a legacy manifest: strip the recorded schema
    val mf = Paths.get(t, "_log", "0.json")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(mf))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("schema"); node.remove("stats")
    Files.writeString(mf, node.toString)
    assert(spark.sql("SELECT count(*) FROM sdml.lake.preschema")
      .head.getLong(0) == 10L)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO sdml.lake.preschema VALUES (99, 99)") }
    // Spark's own capability check: the wrapper exposes no write surface
    assert(e.getMessage.toLowerCase.contains("support") ||
      e.getMessage.toLowerCase.contains("write"), e.getMessage.take(300))
    // and no stray parquet landed outside the manifest's knowledge
    assert(SnapshotLog.read(spark, t).count() == 10L)
  }

  /** Small helper: a local Seq to DataFrame with named columns. */
  private def pairsDf(rows: Seq[(Long, Long)], c1: String, c2: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF(c1, c2)
  }
}
