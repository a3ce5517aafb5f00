package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Column RENAME / DROP on the snapshot log — the two evolution verbs
  * additive-only had declined for want of column-id indirection, now
  * provided the way Delta's name-mode column mapping does: every column
  * has an immutable PHYSICAL name (the name in the parquet files, fixed
  * at first write), the manifest maps logical names onto physicals, and
  * rename/drop edit only the map — METADATA-ONLY commits at any table
  * size.
  *
  *  - rename: zero rewrites, data identical under the new name, stats
  *    keep pruning (they key on the physical name);
  *  - time travel is rename travel (old versions, old names);
  *  - appends after a rename speak LOGICAL names and land as physical;
  *  - drop hides the column everywhere forward; a re-ADD of the same
  *    logical name gets a FRESH physical, so the dropped bytes can
  *    never resurrect into the newcomer;
  *  - COW DML (deleteWhere/updateWhere) addresses renamed columns by
  *    their logical names;
  *  - the SQL catalog and the streaming source expose logical names;
  *  - a full rewrite (optimize) rematerializes logical names and sheds
  *    the map.
  */
class SnapshotRenameSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"$scratch/$name"
    new java.io.File(d).mkdirs()
    d
  }

  test("rename is metadata-only: same files, new name, identical data; time travel keeps the old name") {
    val t = freshDir("ren_basic")
    SnapshotLog.commit(spark, t,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("key", "payload", "score"))
    val v0files = SnapshotLog.read(spark, t).inputFiles.toSet
    val v = SnapshotLog.renameColumn(t, "score", "points")
    assert(v == 1L)
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "payload", "points"))
    // metadata-only: the files are EXACTLY v0's
    assert(cur.inputFiles.toSet == v0files)
    assert(cur.select("key", "points").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == Set((1L, 10), (2L, 20)))
    // time travel: v0 still answers under the old name
    val old = SnapshotLog.read(spark, t, asOf = Some(0L))
    assert(old.columns.toSeq == Seq("key", "payload", "score"))
    assert(old.select("score").collect().map(_.getInt(0)).toSet == Set(10, 20))
  }

  test("rename validation: unknown source, collision, case-variant collision") {
    val t = freshDir("ren_valid")
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("key", "payload"))
    intercept[Exception](SnapshotLog.renameColumn(t, "nope", "x"))
    intercept[Exception](SnapshotLog.renameColumn(t, "payload", "key"))
    intercept[Exception](SnapshotLog.renameColumn(t, "payload", "KEY"))
    intercept[Exception](SnapshotLog.renameColumn(t, "payload", "payload"))
  }

  test("appends after a rename speak logical names; old and new files read uniformly") {
    val t = freshDir("ren_append")
    SnapshotLog.commit(spark, t, Seq((1L, 10), (2L, 20)).toDF("key", "score"))
    SnapshotLog.renameColumn(t, "score", "points")
    // the appending batch uses the CURRENT logical name
    SnapshotLog.commitAppend(spark, t, Seq((3L, 30)).toDF("key", "points"))
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "points"))
    assert(cur.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 10), (2L, 20), (3L, 30)))
    // the new file physically carries the ORIGINAL physical name — a
    // second rename later still reads both generations
    SnapshotLog.renameColumn(t, "points", "pts")
    assert(SnapshotLog.read(spark, t).select("pts").collect()
      .map(_.getInt(0)).toSet == Set(10, 20, 30))
  }

  test("stats pruning keeps working on a renamed column") {
    val t = freshDir("ren_stats")
    // two well-separated files so the key range prunes
    SnapshotLog.commit(spark, t,
      spark.range(0, 100).select(col("id").as("key"), (col("id") * 2).as("score"))
        .repartitionByRange(2, col("key")))
    val (keptBefore, totalBefore) =
      SnapshotLog.pruneFiles(t, "score", Some(150L), None)
    assert(totalBefore == 2 && keptBefore.size == 1,
      s"precondition: expected a pruning layout, got $keptBefore/$totalBefore")
    SnapshotLog.renameColumn(t, "score", "points")
    val (kept, total) = SnapshotLog.pruneFiles(t, "points", Some(150L), None)
    assert(total == 2 && kept.size == 1,
      "stats are physical-keyed — the rename must not lose pruning")
    val rows = SnapshotLog.readWhere(spark, t, "points", Some(150L), None)
    assert(rows.columns.toSeq == Seq("key", "points"))
    assert(rows.count() == 25) // points = 2*key in [150, 198]
  }

  test("COW delete and update address the renamed column logically") {
    val t = freshDir("ren_dml")
    SnapshotLog.commit(spark, t,
      Seq((1L, 10), (2L, 20), (3L, 30)).toDF("key", "score"))
    SnapshotLog.renameColumn(t, "score", "points")
    SnapshotLog.deleteWhere(spark, t, "points", Some(15), Some(25))
    assert(SnapshotLog.read(spark, t).select("points").collect()
      .map(_.getInt(0)).toSet == Set(10, 30))
    SnapshotLog.updateWhere(spark, t, "points", Some(25), None,
      Map("points" -> (col("points") + 1)))
    assert(SnapshotLog.read(spark, t).select("points").collect()
      .map(_.getInt(0)).toSet == Set(10, 31))
    // the map survived both rewrites: another rename still works
    SnapshotLog.renameColumn(t, "points", "pts")
    assert(SnapshotLog.read(spark, t).columns.toSeq == Seq("key", "pts"))
  }

  test("drop hides the column; re-adding the same name never resurrects the dropped bytes") {
    val t = freshDir("drop_readd")
    SnapshotLog.commit(spark, t,
      Seq((1L, "secret1", 10), (2L, "secret2", 20)).toDF("key", "note", "score"))
    SnapshotLog.dropColumn(t, "note")
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "score"))
    // time travel still sees the dropped column (the bytes live until a
    // rewrite — the documented contract)
    assert(SnapshotLog.read(spark, t, asOf = Some(0L))
      .select("note").collect().map(_.getString(0)).toSet ==
      Set("secret1", "secret2"))
    // re-ADD a column named `note`: the old files' `note` bytes must
    // NOT leak into it — the newcomer takes a fresh physical name
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, 30, "fresh")).toDF("key", "score", "note"), mergeSchema = true)
    val readd = SnapshotLog.read(spark, t).select("key", "note").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(readd == Set((1L, null), (2L, null), (3L, "fresh")),
      s"dropped bytes resurrected: $readd")
  }

  test("drop validation: unknown column, last column") {
    val t = freshDir("drop_valid")
    SnapshotLog.commit(spark, t, Seq(Tuple1(1L)).toDF("key"))
    intercept[Exception](SnapshotLog.dropColumn(t, "nope"))
    intercept[Exception](SnapshotLog.dropColumn(t, "key"))
  }

  test("addColumn is metadata-only: zero data written, every existing row null-fills") {
    val t = freshDir("add_basic")
    SnapshotLog.commit(spark, t, Seq((1L, 10), (2L, 20)).toDF("key", "score"))
    val v0files = SnapshotLog.read(spark, t).inputFiles.toSet
    val v = SnapshotLog.addColumn(t, "note",
      org.apache.spark.sql.types.StringType)
    assert(v == 1L)
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "score", "note"))
    assert(cur.inputFiles.toSet == v0files, "metadata-only: no data written")
    assert(cur.filter(col("note").isNull).count() == 2L)
    // time travel: v0 keeps its own (narrower) schema
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).columns.toSeq ==
      Seq("key", "score"))
    // the next append may carry the column, or omit it (nullable)
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, 30, "x")).toDF("key", "score", "note"))
    SnapshotLog.commitAppend(spark, t, Seq((4L, 40)).toDF("key", "score"),
      mergeSchema = true)
    assert(SnapshotLog.read(spark, t).select("key", "note").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet == Set((1L, null), (2L, null), (3L, "x"), (4L, null)))
    // validation: duplicates and case-variants refuse
    intercept[Exception](SnapshotLog.addColumn(t, "score",
      org.apache.spark.sql.types.IntegerType))
    intercept[Exception](SnapshotLog.addColumn(t, "SCORE",
      org.apache.spark.sql.types.IntegerType))
  }

  test("addColumn re-adding a dropped name on a mapped table never resurrects the bytes") {
    val t = freshDir("add_readd")
    SnapshotLog.commit(spark, t,
      Seq((1L, "secret", 10)).toDF("key", "note", "score"))
    SnapshotLog.renameColumn(t, "score", "points") // activates the map
    SnapshotLog.dropColumn(t, "note")              // retires physical `note`
    SnapshotLog.addColumn(t, "note", org.apache.spark.sql.types.StringType)
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "points", "note"))
    assert(cur.filter(col("note").isNull).count() == 1L,
      "the re-added column must NOT read the dropped bytes")
    // and it is fully usable: an append lands values under it
    SnapshotLog.commitAppend(spark, t,
      Seq((2L, 20, "fresh")).toDF("key", "points", "note"))
    assert(SnapshotLog.read(spark, t).filter(col("note") === "fresh")
      .count() == 1L)
  }

  test("SQL catalog exposes logical names over a renamed table, with column pruning intact") {
    val t = freshDir("ren_sql")
    new java.io.File(s"$scratch/renns").mkdirs()
    val tbl = s"$scratch/renns/events"
    new java.io.File(tbl).mkdirs()
    SnapshotLog.commit(spark, tbl,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("key", "payload", "score"))
    SnapshotLog.renameColumn(tbl, "score", "points")
    spark.conf.set("spark.sql.catalog.rensnap", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.rensnap.root", scratch)
    try {
      val out = spark.sql(
        "SELECT key, points FROM rensnap.renns.events WHERE points > 15")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(out == Set((2L, 20)))
      // VERSION AS OF 0 answers under the pre-rename name
      val old = spark.sql(
        "SELECT score FROM rensnap.renns.events VERSION AS OF 0")
        .collect().map(_.getInt(0)).toSet
      assert(old == Set(10, 20))
      // pruning pushes through the wrapper: a two-column ask reads two
      // physical columns, not the table
      val plan = spark.sql(
        "SELECT points FROM rensnap.renns.events").queryExecution
        .executedPlan.toString
      assert(plan.contains("ReadSchema") && !plan.contains("payload"),
        s"column pruning lost through the mapped table:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.catalog.rensnap")
      spark.conf.unset("spark.sql.catalog.rensnap.root")
    }
  }

  test("streaming source emits logical names over a renamed table") {
    val t = freshDir("ren_stream")
    SnapshotLog.commit(spark, t, Seq((1L, 10), (2L, 20)).toDF("key", "score"))
    SnapshotLog.renameColumn(t, "score", "points")
    SnapshotLog.commitAppend(spark, t, Seq((3L, 30)).toDF("key", "points"))
    val out = s"$scratch/ren_stream_out"
    val q = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).load()
      .writeStream.format("memory").queryName("ren_stream_q")
      .option("checkpointLocation", s"$out/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ren_stream_q")
      assert(got.columns.toSeq == Seq("key", "points"))
      assert(got.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
        Set((1L, 10), (2L, 20), (3L, 30)))
    } finally q.stop()
  }

  test("diff across a rename fails with the actionable message; explicit shared payload works") {
    val t = freshDir("ren_diff")
    SnapshotLog.commit(spark, t,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("key", "payload", "score"))
    SnapshotLog.renameColumn(t, "score", "points")
    val e = intercept[IllegalArgumentException](
      SnapshotLog.diff(spark, t, 0L, 1L))
    assert(e.getMessage.contains("renameColumn"), e.getMessage)
    // the shared column still diffs (and the rename changed no data)
    val feed = SnapshotLog.diff(spark, t, 0L, 1L, payload = Seq("payload"))
    assert(feed.count() == 0L, "a metadata-only rename must diff to empty")
  }

  test("optimize rematerializes logical names and sheds the map") {
    val t = freshDir("ren_opt")
    SnapshotLog.commit(spark, t, Seq((1L, 10), (2L, 20)).toDF("key", "score"))
    SnapshotLog.renameColumn(t, "score", "points")
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = 100L)
    // after the rewrite the parquet files THEMSELVES carry the logical
    // name: a raw (mapless) read of the data files sees `points`
    val files = SnapshotLog.read(spark, t).inputFiles
    val raw = spark.read.parquet(files: _*)
    assert(raw.columns.toSeq == Seq("key", "points"))
    assert(raw.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 10), (2L, 20)))
    // and the cycle restarts: a fresh rename on the rematerialized table
    SnapshotLog.renameColumn(t, "points", "score")
    assert(SnapshotLog.read(spark, t).columns.toSeq == Seq("key", "score"))
  }
}
