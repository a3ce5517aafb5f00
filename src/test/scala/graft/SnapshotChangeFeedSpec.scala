package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** The dv-aware CHANGE DATA FEED ([[SnapshotLog.readChangeFeed]] and
  * the streaming source's `changeFeed=true` mode) — Delta's
  * `table_changes` on the log's op provenance. Pinned contracts:
  *
  *  - appends emit `insert` rows; a MOR delete emits the masked rows'
  *    PRE-IMAGES as `delete` rows; a MOR update emits delete +
  *    `update_postimage` pairs in one version; MOR merge post-images
  *    label `upsert`;
  *  - a RE-MARK (deleting an already-deleted key re-marks its position
  *    — MOR marks come from raw reads) emits NOTHING: the feed's
  *    position delta subtracts the prior mask;
  *  - maintenance rewrites (optimize / zorder / compactDeletes) are
  *    content-identical by construction and emit nothing — the feed
  *    flows straight through them; any OTHER rewrite fails loudly;
  *  - replaying the feed reconstructs the table: inserts+postimages
  *    minus deletes equals the final snapshot;
  *  - the STREAM (changeFeed=true) emits the same multiset of change
  *    rows as the batch feed over the same version range — a
  *    mid-stream MOR delete produces delete records downstream instead
  *    of the ignoreChanges ultimatum. */
class SnapshotChangeFeedSpec extends SparkSpec {

  import sources.{ChangeFeed => CF}

  private def freshTable(prefix: String, n: Int = 400): String = {
    val t = Files.createTempDirectory(s"graft_cf_$prefix").toString + "/t"
    SnapshotLog.commit(spark, t,
      spark.range(n).repartitionByRange(2, col("id")).select(
        col("id").as("k"), (col("id") * 7).as("v")))
    t
  }

  private def feed(t: String, from: Long, to: Long)
      : Seq[(Long, Long, String, Long)] =
    SnapshotLog.readChangeFeed(spark, t, from, to)
      .select(col("k"), col("v"), col(CF.ChangeTypeCol),
        col(CF.CommitVersionCol))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted

  test("inserts, MOR deletes (pre-images), and MOR update pairs emit labeled per-version") {
    val t = freshTable("basic")
    SnapshotLog.commitAppend(spark, t,                        // v1: insert
      spark.range(400, 410).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(5L, 6L))  // v2: delete
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(7L),      // v3: update
      Map("v" -> lit(-1L)))
    val rows = feed(t, -1, 3)
    val byVersion = rows.groupBy(_._4)
    assert(byVersion(0L).forall(_._3 == "insert") &&
      byVersion(0L).size == 400)
    assert(byVersion(1L).forall(_._3 == "insert") &&
      byVersion(1L).map(_._1).sorted == (400L to 409L))
    // MOR delete: pre-images with the ORIGINAL payloads
    assert(byVersion(2L).toSet ==
      Set((5L, 35L, "delete", 2L), (6L, 42L, "delete", 2L)))
    // MOR update: the masked pre-image + the post-image, one version
    assert(byVersion(3L).toSet ==
      Set((7L, 49L, "delete", 3L), (7L, -1L, "update_postimage", 3L)))
    // a sub-range feeds exactly its versions
    assert(feed(t, 1, 2) == byVersion(2L).sorted)
  }

  test("a re-mark emits nothing; maintenance versions pass through silently") {
    val t = freshTable("remark")
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(10L, 11L)) // v1
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(11L, 12L)) // v2: 11 re-marked
    val v2 = feed(t, 1, 2)
    assert(v2.map(r => (r._1, r._3)) == Seq((12L, "delete")),
      s"re-marked position 11 must not re-emit: $v2")
    // compactDeletes (rewrite, content-identical) emits nothing and
    // does NOT break the feed
    val v3 = SnapshotLog.compactDeletes(spark, t)
    assert(feed(t, 2, v3).isEmpty)
    // optimize likewise
    val v4 = SnapshotLog.optimize(spark, t, targetRecordsPerFile = 1000)
    assert(feed(t, v3, v4).isEmpty)
    // and the feed STILL works across the maintenance for later changes
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(20L))      // v5
    assert(feed(t, 2, v4 + 1).map(r => (r._1, r._3)) ==
      Seq((20L, "delete")))
  }

  test("the feed composes with COLUMN MAPPING; a mid-range DDL fails loudly") {
    val t = freshTable("mapped")
    SnapshotLog.renameColumn(t, "k", "doc_id")               // v1: map edit
    SnapshotLog.deleteWhereInMOR(spark, t, "doc_id", Seq(3L)) // v2
    // post-rename range: logical names throughout, physical files read
    // positionally underneath (batch AND stream share the machinery)
    val got = SnapshotLog.readChangeFeed(spark, t, 1, 2)
      .select(col("doc_id"), col(CF.ChangeTypeCol)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((3L, "delete")))
    // a range CROSSING the rename: the v0 slice would emit under `k`,
    // the v2 slice under `doc_id` — refuse with the actionable story
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readChangeFeed(spark, t, -1, 2).collect()
    }
    assert(e.getMessage.contains("column set changed"), e.getMessage)
    // same refusal shape for an ADD COLUMN mid-range (append after it
    // widens the emitted columns)
    val t2 = freshTable("added")
    SnapshotLog.addColumn(t2, "note",
      org.apache.spark.sql.types.StringType)                 // v1
    SnapshotLog.commitAppend(spark, t2,                      // v2
      spark.range(400, 410).select(col("id").as("k"),
        (col("id") * 7).as("v"), lit("x").as("note")))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.readChangeFeed(spark, t2, -1, 2).collect()
    }
    assert(e2.getMessage.contains("column set changed"), e2.getMessage)
    // split AT the DDL: both halves feed cleanly
    assert(SnapshotLog.readChangeFeed(spark, t2, -1, 1).count() == 400)
    assert(SnapshotLog.readChangeFeed(spark, t2, 1, 2).count() == 10)
  }

  test("a content-CHANGING rewrite fails loudly, naming diff as the alternative") {
    val t = freshTable("rewrite")
    SnapshotLog.deleteWhereIn(spark, t, "k", Seq(3L)) // COW: rewrites a file
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readChangeFeed(spark, t, -1, 1).collect()
    }
    assert(e.getMessage.contains("rewrote data files") &&
      e.getMessage.contains("diff"), e.getMessage)
  }

  test("replaying the feed reconstructs the snapshot (inserts + postimages − deletes)") {
    val t = freshTable("replay")
    SnapshotLog.commitAppend(spark, t,
      spark.range(400, 450).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(1L, 2L, 440L))
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(3L, 4L),
      Map("v" -> (col("v") + 100000L)))
    val latest = SnapshotLog.latestVersion(t).get
    val cf = SnapshotLog.readChangeFeed(spark, t, -1, latest)
    val adds = cf.filter(col(CF.ChangeTypeCol) =!= "delete")
      .select("k", "v")
    val dels = cf.filter(col(CF.ChangeTypeCol) === "delete")
      .select("k", "v")
    val replayed = adds.exceptAll(dels).collect().map(_.toString).sorted
    val table = SnapshotLog.read(spark, t).select("k", "v")
      .collect().map(_.toString).sorted
    assert(replayed.sameElements(table),
      s"replay diverged: ${replayed.length} vs ${table.length} rows")
  }

  test("time-bounded feed: readChangeFeedByTime resolves version bounds from commit provenance") {
    val t = freshTable("bytime")                               // v0
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(5L))       // v1
    SnapshotLog.commitAppend(spark, t,                         // v2
      spark.range(400, 410).select(col("id").as("k"), (col("id") * 7).as("v")))
    val h = SnapshotLog.history(t).sortBy(_.version)
    val ts = h.map(_.tsMillis)
    def at(ms: Long) = java.time.Instant.ofEpochMilli(ms)
    // window [ts(v1), ts(v2)]: versions 1..2 — the delete + the insert
    // (when two commits land in the SAME millisecond, v0 legitimately
    // joins the window; only the distinct-ts case pins the exact slice)
    if (ts(0) < ts(1)) {
      val got = SnapshotLog.readChangeFeedByTime(spark, t, at(ts(1)), at(ts(2)))
        .select(col(CF.ChangeTypeCol), col(CF.CommitVersionCol)).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got.count(_ == ("delete", 1L)) == 1 &&
        got.count(_ == ("insert", 2L)) == 10 && got.length == 11, got.toSeq)
    }
    // window strictly after the last commit: an EMPTY feed, same schema
    val empty = SnapshotLog.readChangeFeedByTime(spark, t,
      at(ts.max + 60000), at(ts.max + 120000))
    assert(empty.count() == 0 &&
      empty.columns.contains(CF.ChangeTypeCol))
    // window covering everything: the whole history from genesis
    assert(SnapshotLog.readChangeFeedByTime(spark, t,
      at(ts.min), at(ts.max)).count() == 411)
    // a `to` before the first commit is a loud, precise error
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readChangeFeedByTime(spark, t,
        at(ts.min - 120000), at(ts.min - 60000))
    }
    assert(e.getMessage.contains("at or before"), e.getMessage)
  }

  test("the feed is a SQL table function: snap_table_changes(dir, from, to)") {
    val t = freshTable("sqltvf", n = 200)
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(7L, 8L))
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(9L), Map("v" -> lit(-5L)))
    val sql = spark.sql(
      s"SELECT * FROM snap_table_changes('$t', -1, 2)")
    val viaSql = sql.collect().map(_.toString).sorted
    val viaApi = SnapshotLog.readChangeFeed(spark, t, -1, 2)
      .collect().map(_.toString).sorted
    assert(viaSql.length == 200 + 2 + 2 && viaSql.sameElements(viaApi))
    // composes like any relation: aggregate over the labels
    val byType = spark.sql(
      s"""SELECT ${CF.ChangeTypeCol} AS ct, count(*) AS n
          FROM snap_table_changes('$t', 0, 2) GROUP BY 1 ORDER BY 1""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 3L, "update_postimage" -> 1L), byType)
    // a non-literal version argument is a loud analysis-time no: the
    // range shapes the PLAN and cannot depend on row values
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM snap_table_changes('$t', -1, (SELECT 2))")
        .collect()
    }
    assert(e.getMessage.contains("literal") ||
      e.getMessage.contains("snap_table_changes"), e.getMessage)
  }

  test("the time-bounded feed is a TVF too: snap_table_changes_by_time") {
    val t = freshTable("sqltvft", n = 50)
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(3L))
    val ts = SnapshotLog.history(t).map(_.tsMillis)
    val fromS = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ts.min - 1000),
      java.time.ZoneOffset.UTC).toString.replace('T', ' ')
    val toS = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ts.max + 1000),
      java.time.ZoneOffset.UTC).toString.replace('T', ' ')
    // string bounds parse in the (UTC-pinned) session zone; TIMESTAMP
    // literals ride as internal micros — both forms must match the API
    val viaStr = spark.sql("SELECT * FROM snap_table_changes_by_time(" +
      s"'$t', '$fromS', '$toS')").collect().map(_.toString).sorted
    val viaLit = spark.sql("SELECT * FROM snap_table_changes_by_time(" +
      s"'$t', TIMESTAMP '$fromS', TIMESTAMP '$toS')")
      .collect().map(_.toString).sorted
    val viaApi = SnapshotLog.readChangeFeedByTime(spark, t,
      java.time.Instant.ofEpochMilli(ts.min - 1000),
      java.time.Instant.ofEpochMilli(ts.max + 1000))
      .collect().map(_.toString).sorted
    assert(viaStr.length == 51 && viaStr.sameElements(viaApi) &&
      viaLit.sameElements(viaApi))
  }

  test("the STREAM with changeFeed=true matches the batch feed; a mid-stream MOR delete streams as delete records") {
    val t = freshTable("stream", n = 100)
    SnapshotLog.commitAppend(spark, t,
      spark.range(100, 120).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(8L, 108L))
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(9L), Map("v" -> lit(0L)))
    val out = Files.createTempDirectory("graft_cf_sink_").toString
    val q = spark.readStream.format("graft-snaplog")
      .option("tableDir", t)
      .option("changeFeed", "true")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(s"$out/data")
      .collect().map(_.toString).sorted
    val latest = SnapshotLog.latestVersion(t).get
    val batch = SnapshotLog.readChangeFeed(spark, t, -1, latest)
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream (${streamed.length}) != batch (${batch.length})")
    // the delete records made it downstream
    assert(spark.read.parquet(s"$out/data")
      .filter(col(CF.ChangeTypeCol) === "delete")
      .select("k").collect().map(_.getLong(0)).sorted
      .sameElements(Array(8L, 9L, 108L)))
    // changeFeed + ignoreChanges refuse together
    val e = intercept[Exception] {
      spark.readStream.format("graft-snaplog")
        .option("tableDir", t)
        .option("changeFeed", "true")
        .option("ignoreChanges", "true")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/cp2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    def rootMsg(x: Throwable): String =
      if (x == null) "" else x.getMessage + rootMsg(x.getCause)
    assert(rootMsg(e).contains("exclusive"), rootMsg(e).take(300))
  }

  test("TIME-bounded STREAM: startingTimestamp/endingTimestamp resolve to versions and hash-match the version-bounded feed") {
    val t = freshTable("tstream", n = 60)                      // v0
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(7L))       // v1
    SnapshotLog.commitAppend(spark, t,                         // v2
      spark.range(60, 70).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.commitAppend(spark, t,                         // v3 (outside)
      spark.range(70, 80).select(col("id").as("k"), (col("id") * 7).as("v")))
    // controlled, distinct commit timestamps
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val log = java.nio.file.Paths.get(t, "_log")
    def stamp(v: Long, ms: Long): Unit = {
      val n = mapper.readTree(Files.readString(log.resolve(s"$v.json")))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      n.put("ts", ms): Unit
      Files.writeString(log.resolve(s"$v.json"), n.toString): Unit
    }
    stamp(0, 1000000L); stamp(1, 2000000L); stamp(2, 3000000L)
    stamp(3, 4000000L)
    val out = Files.createTempDirectory("graft_cf_ts_sink_").toString
    spark.readStream.format("graft-snaplog")
      .option("tableDir", t)
      .option("changeFeed", "true")
      // [ts(v1), ts(v2)]: versions 1..2 — the delete + one insert batch
      .option("startingTimestamp", "1970-01-01T00:33:20Z") // 2000000 ms
      .option("endingTimestamp", (3000000L).toString)      // epoch-ms form
      .load()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000): Unit
    val streamed = spark.read.parquet(s"$out/data")
      .collect().map(_.toString).sorted
    val batch = SnapshotLog.readChangeFeed(spark, t, 0, 2)
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"time-bounded stream (${streamed.length}) != version-bounded " +
        s"batch (${batch.length})")
    // v3 (stamped after the ending bound) never planned
    assert(!streamed.exists(_.contains("_3]")) &&
      spark.read.parquet(s"$out/data")
        .filter(col(CF.CommitVersionCol) === 3L).count() == 0L)
    // refusal taxonomy carries over: a ts-less version refuses naming
    // the version-bounded form
    val n0 = mapper.readTree(Files.readString(log.resolve("0.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    n0.remove("ts"): Unit
    Files.writeString(log.resolve("0.json"), n0.toString)
    val e = intercept[Exception] {
      spark.readStream.format("graft-snaplog")
        .option("tableDir", t)
        .option("startingTimestamp", "1970-01-01T00:33:20Z")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/cp2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    def rootMsg(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + rootMsg(x.getCause)
    assert(rootMsg(e).contains("predate commit-timestamp provenance") &&
      rootMsg(e).contains("startVersion"), rootMsg(e).take(400))
    // and startVersion + startingTimestamp together refuse
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-snaplog")
        .option("tableDir", t)
        .option("startVersion", "1")
        .option("startingTimestamp", "1970-01-01T00:33:20Z")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/cp3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    assert(rootMsg(e2).contains("exclusive"), rootMsg(e2).take(300))
  }

  test("birth-masked files emit on NEITHER half: no insert for masked rows, no delete pre-images") {
    // A version that both appends a file and dv's it in the same commit
    // is unreachable via the log's own verbs — craft it by folding a
    // MOR delete's dv entry back into the append's manifest. The feed
    // must withhold the masked rows from the insert half (they were
    // never visible) AND from the delete half (a replica applying a
    // delete pre-image for a never-inserted row could kill a live row
    // sharing the key).
    val t = freshTable("birth", n = 100)                       // v0
    SnapshotLog.commitAppend(spark, t,                         // v1: file F
      spark.range(100, 120).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(105L))     // v2: dv on F
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val log = java.nio.file.Paths.get(t, "_log")
    val v2 = mapper.readTree(Files.readString(log.resolve("2.json")))
    val v1 = mapper.readTree(Files.readString(log.resolve("1.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    v1.replace("dv", v2.get("dv")): Unit                       // F born masked
    Files.writeString(log.resolve("1.json"), v1.toString)
    val rows = feed(t, 0, 1)
    val inserts = rows.filter(_._3 == "insert")
    val deletes = rows.filter(_._3 == "delete")
    assert(inserts.size == 19 && !inserts.exists(_._1 == 105L),
      s"insert half must withhold the birth-masked row: $inserts")
    assert(deletes.isEmpty,
      s"delete half must not emit pre-images of never-visible rows: $deletes")
    // v2 restates the same sidecars (newSc is empty) — nothing new, and
    // full-feed replay still reconstructs the latest snapshot
    assert(feed(t, 1, 2).isEmpty)
    val cf = SnapshotLog.readChangeFeed(spark, t, -1, 2)
    val replayed = cf.filter(col(CF.ChangeTypeCol) =!= "delete")
      .select("k", "v")
      .exceptAll(cf.filter(col(CF.ChangeTypeCol) === "delete")
        .select("k", "v"))
      .collect().map(_.toString).sorted
    val table = SnapshotLog.read(spark, t).select("k", "v")
      .collect().map(_.toString).sorted
    assert(replayed.sameElements(table),
      s"replay diverged: ${replayed.length} vs ${table.length} rows")
  }

  test("clock skew: a non-contiguous in-window version set refuses loudly, naming the version-bounded feed") {
    val t = freshTable("skew", n = 50)                          // v0
    SnapshotLog.commitAppend(spark, t,                          // v1
      spark.range(50, 60).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.commitAppend(spark, t,                          // v2
      spark.range(60, 70).select(col("id").as("k"), (col("id") * 7).as("v")))
    // stamp controlled commit timestamps: v1's clock ran far AHEAD, so
    // the window [ts(v0), ts(v2)] holds versions {0, 2} but not 1
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val log = java.nio.file.Paths.get(t, "_log")
    def stamp(v: Long, ms: Long): Unit = {
      val n = mapper.readTree(Files.readString(log.resolve(s"$v.json")))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      n.put("ts", ms): Unit
      Files.writeString(log.resolve(s"$v.json"), n.toString): Unit
    }
    stamp(0, 1000000L); stamp(1, 9000000L); stamp(2, 2000000L)
    def at(ms: Long) = java.time.Instant.ofEpochMilli(ms)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readChangeFeedByTime(spark, t, at(1000000L), at(2000000L))
    }
    assert(e.getMessage.contains("clock skew") &&
      e.getMessage.contains("readChangeFeed(-1, 2)"), e.getMessage)
    // a window covering the skewed version too feeds normally
    assert(SnapshotLog.readChangeFeedByTime(spark, t,
      at(1000000L), at(9000000L)).count() == 70)
    // and a contiguous sub-window is untouched by the refusal
    assert(SnapshotLog.readChangeFeedByTime(spark, t,
      at(2000000L), at(2000000L))
      .select(col(CF.CommitVersionCol)).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  // ---- the catalog-native `.changes` metadata table (round 18) ----

  private lazy val chRoot: String = {
    val r = Files.createTempDirectory("graft_cf_cat_").toString
    Files.createDirectories(java.nio.file.Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.cfc", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.cfc.root", r)
    r
  }

  test(".changes metadata table: batch parity with the TVF, " +
      "version and time bounds, one refusal taxonomy") {
    val t = s"$chRoot/lake/t"
    SnapshotLog.commit(spark, t,                               // v0
      spark.range(200).repartitionByRange(2, col("id")).select(
        col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.commitAppend(spark, t,                         // v1
      spark.range(200, 220).select(col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(3L, 4L))   // v2
    def s(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // full-history read == the TVF over (-1, latest]
    assert(s(spark.table("cfc.lake.t.changes")) ==
      s(spark.sql(s"SELECT * FROM snap_table_changes('$t', -1, 2)")))
    // inclusive emitted-version bounds (the streaming vocabulary)
    assert(s(spark.read.option("startVersion", 2)
      .table("cfc.lake.t.changes")) ==
      s(spark.sql(s"SELECT * FROM snap_table_changes('$t', 1, 2)")))
    assert(s(spark.read.option("endVersion", 1)
      .table("cfc.lake.t.changes")) ==
      s(spark.sql(s"SELECT * FROM snap_table_changes('$t', -1, 1)")))
    // the feed schema IS the table schema (+ the two columns)
    assert(spark.table("cfc.lake.t.changes").columns.toSeq ==
      Seq("k", "v", CF.ChangeTypeCol, CF.CommitVersionCol))
    // time bounds resolve through readChangeFeedByTime
    val stamps = SnapshotLog.history(t).map(_.tsMillis)
    val fullTs = spark.read
      .option("startingTimestamp", stamps.min.toString)
      .option("endingTimestamp", stamps.max.toString)
      .table("cfc.lake.t.changes")
    assert(s(fullTs) == s(spark.table("cfc.lake.t.changes")))
    // one clock per read
    val eMix = intercept[Exception] {
      spark.read.option("startVersion", 1)
        .option("endingTimestamp", stamps.max.toString)
        .table("cfc.lake.t.changes").collect()
    }
    assert(eMix.getMessage.contains("exclusive"), eMix.getMessage.take(200))
    // predicates and aggregates compose (post-scan, exact)
    assert(spark.sql("SELECT count(*) FROM cfc.lake.t.changes " +
      s"WHERE ${CF.ChangeTypeCol} = 'delete'").collect()(0).getLong(0) == 2L)
  }

  test(".changes refuses ranges crossing restore / truncate / replace " +
      "with the verbs' own taxonomy") {
    def msg(x: Throwable): String =
      if (x == null) "" else x.getMessage + msg(x.getCause)
    // RESTORE
    val r1 = s"$chRoot/lake/r1"
    SnapshotLog.commit(spark, r1, spark.range(50).select(
      col("id").as("k"), (col("id") * 2).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, r1, "k", Seq(1L))
    SnapshotLog.restore(r1, 0L)
    val e1 = intercept[Exception] {
      spark.table("cfc.lake.r1.changes").collect()
    }
    assert(msg(e1).contains("RESTORE") && msg(e1).contains("diff"),
      msg(e1).take(300))
    // a range that stops BEFORE the restore still serves
    assert(spark.read.option("endVersion", 1)
      .table("cfc.lake.r1.changes").count() == 51L)
    // TRUNCATE (zero-file commit = a structural rewrite to the feed)
    val r2 = s"$chRoot/lake/r2"
    SnapshotLog.commit(spark, r2, spark.range(50).select(
      col("id").as("k"), (col("id") * 2).as("v")))
    SnapshotLog.truncate(r2)
    val e2 = intercept[Exception] {
      spark.table("cfc.lake.r2.changes").collect()
    }
    assert(msg(e2).contains("diff"), msg(e2).take(300))
    // REPLACE (a fresh generation)
    val r3 = s"$chRoot/lake/r3"
    SnapshotLog.commit(spark, r3, spark.range(50).select(
      col("id").as("k"), (col("id") * 2).as("v")))
    SnapshotLog.replaceTable(spark, r3, spark.range(5).select(
      col("id").as("k"), (col("id") * 3).as("v")))
    val e3 = intercept[Exception] {
      spark.table("cfc.lake.r3.changes").collect()
    }
    assert(msg(e3).contains("diff"), msg(e3).take(300))
  }

  test(".changes streams through the catalog: readStream.table, " +
      "no format surface needed") {
    val t = s"$chRoot/lake/st"
    SnapshotLog.commit(spark, t, spark.range(80).select(
      col("id").as("k"), (col("id") * 7).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(8L))
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(9L), Map("v" -> lit(0L)))
    val out = Files.createTempDirectory("graft_cf_catsink_").toString
    val q = spark.readStream.table("cfc.lake.st.changes")
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(s"$out/data")
      .collect().map(_.toString).sorted
    val batch = SnapshotLog.readChangeFeed(spark, t, -1,
      SnapshotLog.latestVersion(t).get).collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"catalog stream (${streamed.length}) != batch (${batch.length})")
    // the PLAIN table still refuses the changeFeed option, now naming
    // the .changes surface as the first escape hatch
    val e = intercept[Exception] {
      spark.readStream.option("changeFeed", "true").table("cfc.lake.st")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/cp2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    def msg(x: Throwable): String =
      if (x == null) "" else x.getMessage + msg(x.getCause)
    assert(msg(e).contains(".changes"), msg(e).take(400))
  }

  test("sidecarPositionCount saturates instead of overflowing on unreadable sidecars") {
    // >=1024 unreadable sidecars used to sum per-file sentinels past
    // Long.MaxValue into NEGATIVE territory, spuriously passing the
    // `<= inlineMax` gate; the count now short-circuits to MaxValue
    val bogus = (0 until 1500).map(i => s"/nonexistent/graft_dv_$i.parquet")
    assert(SnapshotLog.sidecarPositionCount(bogus) == Long.MaxValue)
    assert(SnapshotLog.sidecarPositionCount(bogus.take(1)) == Long.MaxValue)
    assert(SnapshotLog.sidecarPositionCount(Nil) == 0L)
  }
}
