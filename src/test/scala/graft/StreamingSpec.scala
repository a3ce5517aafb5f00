package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{AsOfInput, SessionInput, SessionUpdate}

/** Structured Streaming extension tests: watermarked tumbling windows,
  * streaming dedup, and mapGroupsWithState sessionization, driven by
  * MemoryStream (SURVEY §2.11 — extension, no reference counterpart).
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling window counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.startToMemory(
      EventStreams.tumblingCounts(events), "tumbling", OutputMode.Update())
    try {
      input.addData(
        (ts(10), "click", 1.0), (ts(20), "click", 2.0),
        (ts(70), "click", 4.0), (ts(15), "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 01:00:00.0", "click", 1L)))
      assert(rows.contains(("2024-01-01 00:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("latestPerKey maintains the compacted view across out-of-order micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.startToMemory(
      EventStreams.latestPerKey(events), "compacted", OutputMode.Complete())
    try {
      // batch 1: user 1 has two versions (the later wins), user 2 one
      input.addData(
        (10L, ts(5), 1L, "a", 1.00), (11L, ts(9), 1L, "b", 2.00),
        (20L, ts(3), 2L, "c", 3.00))
      q.processAllAvailable()
      val v1 = spark.table("compacted").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(v1 == Map(1L -> (11L, "b"), 2L -> (20L, "c")))
      // batch 2: a LATE (older) row for user 1 must NOT displace the
      // winner; a newer row for user 2 must
      input.addData((9L, ts(1), 1L, "z", 9.00), (21L, ts(8), 2L, "d", 4.00))
      q.processAllAvailable()
      val v2 = spark.table("compacted").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(v2 == Map(1L -> (11L, "b"), 2L -> (21L, "d")))
      // same-timestamp tie breaks to the higher event_id, deterministically
      input.addData((12L, ts(9), 1L, "t", 5.00))
      q.processAllAvailable()
      val v3 = spark.table("compacted").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(v3(1L) == (12L, "t"))
    } finally q.stop()
  }

  test("foreachBatch CDC apply: micro-batched changes maintain a versioned merged snapshot") {
    // the streaming WRITE half of the CDC story: each micro-batch of
    // changes applies through the SAME mergeBatch kernel the batch
    // entry uses, against a versioned parquet snapshot (v{batchId+1} —
    // the poor-man's table format; swap parquet-dir versions for
    // Delta/Iceberg commits and the topology is unchanged). State
    // crosses micro-batches through the TABLE, not stream state, so
    // the pattern survives driver restarts by construction.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"$scratch/stream_upsert"
    Seq((1L, 10L), (2L, 20L)).toDF("key", "s_price").write.parquet(s"$base/v0")
    @volatile var cur = s"$base/v0"
    val input = MemoryStream[(Long, String, Option[Long])]
    val changes = input.toDF().toDF("key", "op", "c_price")
    val q = changes.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val snap = spark.read.parquet(cur)
        val next = s"$base/v${id + 1}"
        graft.ops.MigrationOps.mergeBatch(snap, batch, Seq("price"))
          .withColumnRenamed("price", "s_price")
          .write.mode("overwrite").parquet(next)
        cur = next
        ()
    }.start()
    try {
      input.addData((1L, "update", Some(11L)), (3L, "insert", Some(30L)))
      q.processAllAvailable()
      input.addData((2L, "delete", None), (3L, "update", Some(31L)))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.read.parquet(cur).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin == Map(1L -> 11L, 3L -> 31L))
    // both versions exist — time travel over the maintained snapshot
    val v1 = spark.read.parquet(s"$base/v1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == Map(1L -> 11L, 2L -> 20L, 3L -> 30L))
  }

  test("exactly-once foreachBatch sink: batchId-keyed atomic commits make replays no-ops") {
    // the CDC-apply topology upgraded from versioned parquet dirs to
    // the snapshot log's put-if-absent: each micro-batch merges against
    // the PRIOR committed version and commits at the DETERMINISTIC
    // version batchId+1 (commitIdempotent). foreachBatch's delivery
    // contract is at-least-once — after a failure Spark re-invokes the
    // same (batch, id) — and the version-keyed publish turns that
    // replay into a no-op: at-least-once delivery + idempotent
    // versioned commit = exactly-once table state.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = s"$scratch/stream_xonce"
    graft.sources.SnapshotLog.commit(spark, table,
      Seq((1L, 10L), (2L, 20L)).toDF("key", "s_price")) // v0
    def applyBatch(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        id: Long): Boolean = {
      val snap = graft.sources.SnapshotLog.read(spark, table, asOf = Some(id))
      val merged = graft.ops.MigrationOps.mergeBatch(snap, batch, Seq("price"))
        .withColumnRenamed("price", "s_price")
      graft.sources.SnapshotLog.commitIdempotent(spark, table, merged, id + 1)
    }
    val input = MemoryStream[(Long, String, Option[Long])]
    val changes = input.toDF().toDF("key", "op", "c_price")
    val q = changes.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyBatch(batch, id): Unit
    }.start()
    val b0 = Seq((1L, "update", Some(11L)), (3L, "insert", Some(30L)))
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData((2L, "delete", Option.empty[Long]))
      q.processAllAvailable()
    } finally q.stop()
    val fin = graft.sources.SnapshotLog.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin == Map(1L -> 11L, 3L -> 30L))
    // REPLAY batch 0 (what Spark does after a foreachBatch failure):
    // the idempotent commit declines, and neither the latest state nor
    // the version history moves — exactly-once observed state
    val replayed = applyBatch(b0.toDF("key", "op", "c_price"), 0L)
    assert(!replayed, "replay must be a no-op, not a new commit")
    assert(graft.sources.SnapshotLog.latestVersion(table).contains(2L))
    val after = graft.sources.SnapshotLog.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == fin)
    // the manifest pre-check declined BEFORE rewriting any data, so a
    // sequential replay costs nothing and leaves no orphan (only a
    // replay RACING a first delivery pays a wasted rewrite, which then
    // orphans for vacuum)
    assert(graft.sources.SnapshotLog.vacuum(table, minAgeMillis = 0L).isEmpty)
  }

  test("exactly-once APPEND sink: micro-batches land as O(batch) appends, replays decline") {
    // the INGEST twin of the merge topology above: each micro-batch
    // appends its files (commitAppendIdempotent — no table rewrite per
    // batch, the property that survives a growing table), the version
    // is keyed on the batch id, and a replayed batch declines at the
    // manifest pre-check. At-least-once delivery + idempotent
    // versioned append = exactly-once table state, O(batch) per batch.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = s"$scratch/stream_xonce_append"
    def ingest(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        id: Long): Boolean =
      graft.sources.SnapshotLog.commitAppendIdempotent(spark, table, batch, id)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        ingest(batch, id): Unit
    }.start()
    val b0 = Seq((1L, "a"), (2L, "b"))
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(graft.sources.SnapshotLog.read(spark, table).count() == 3)
    // history: v0 is the first batch alone
    assert(graft.sources.SnapshotLog.read(spark, table, asOf = Some(0L)).count() == 2)
    // REPLAY batch 0: declines before writing anything
    assert(!ingest(b0.toDF("doc_id", "text"), 0L), "replay must decline")
    assert(graft.sources.SnapshotLog.latestVersion(table).contains(1L))
    assert(graft.sources.SnapshotLog.read(spark, table).count() == 3)
    assert(graft.sources.SnapshotLog.vacuum(table, minAgeMillis = 0L).isEmpty)
  }

  test("streaming dedup drops duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("event_id", "ts")
    val q = EventStreams.startToMemory(
      EventStreams.dedupedEvents(events), "deduped", OutputMode.Append())
    try {
      input.addData((1L, ts(1)), (1L, ts(1)), (2L, ts(2)), (1L, ts(1)))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses same-key rows across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.startToMemory(
      EventStreams.hourlyUserTypeDedup(events), "wm_dedup", OutputMode.Append())
    try {
      // duplicates within one batch AND across batches (state carries over)
      input.addData((ts(5), 1L, "click"), (ts(25), 1L, "click"), (ts(7), 2L, "view"))
      q.processAllAvailable()
      input.addData((ts(40), 1L, "click"), (ts(70), 1L, "click"))
      q.processAllAvailable()
      val rows = spark.table("wm_dedup")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      // hour 00 has three same-hour duplicates of (1, click) — one survives
      assert(rows == Set(
        ("2024-01-01 00", 1L, "click"),
        ("2024-01-01 00", 2L, "view"),
        ("2024-01-01 01", 1L, "click")))
    } finally q.stop()
  }

  test("flatMapGroupsWithState as-of: purchases match the latest prior signup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.startToMemory(
      EventStreams.asofSignup(input.toDS()).toDF(), "asof", OutputMode.Append())
    try {
      // batch 1: purchase before any signup → no match; signup; purchase after
      input.addData(
        AsOfInput(1L, 10L, "purchase", 100L),
        AsOfInput(2L, 10L, "signup", 200L),
        AsOfInput(3L, 10L, "purchase", 350L))
      q.processAllAvailable()
      // batch 2: state carries signup 2 across batches; newer signup wins
      input.addData(
        AsOfInput(4L, 10L, "purchase", 400L),
        AsOfInput(5L, 10L, "signup", 500L),
        AsOfInput(6L, 10L, "purchase", 650L),
        AsOfInput(7L, 99L, "purchase", 10L)) // user with no signup ever
      q.processAllAvailable()
      val got = spark.table("asof").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(got == Map(
        1L -> (-1L, -1L),   // before any signup
        3L -> (2L, 150L),   // same batch
        4L -> (2L, 200L),   // state across batches
        6L -> (5L, 150L),   // newer signup supersedes
        7L -> (-1L, -1L)))  // user never signed up
    } finally q.stop()
  }

  test("file-source stream to parquet sink with checkpoint") {
    // the production shape: readStream over an arriving-files directory,
    // transform, writeStream to parquet with exactly-once checkpointing
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val inDir = s"$scratch/stream_in"
    src.write.mode("overwrite").parquet(inDir)
    val stream = ops.EventOps.normalizeTs(
        spark.readStream.schema(src.schema).parquet(inDir),
        src.schema("ts").dataType)
      .filter("event_type = 'purchase'")
      .select("event_id", "user_id", "ts", "value")
    val q = stream.writeStream
      .format("parquet")
      .option("path", s"$scratch/stream_out")
      .option("checkpointLocation", s"$scratch/stream_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$scratch/stream_out")
    val expected = src.filter("event_type = 'purchase'").count()
    assert(out.count() == expected)
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "value"))
  }

  test("streaming near-dup band filter flags cross-batch band collisions") {
    import spark.implicits._
    implicit val sess = spark
    implicit val sqlCtx = spark.sqlContext
    // docs 1 and 2 share TEXT (all bands collide); doc 3 is disjoint
    // vocabulary (no collision); doc 4 arrives in a LATER batch with
    // doc 1's text — the state must carry the bucket claims across
    // batches. Stream semantics must agree with the batch banding.
    val d1 = "alpha beta gamma delta epsilon zeta eta theta"
    val d3 = "one two three four five six seven eight"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocStreams.nearDupBandFilter(docs).toDF()
      .writeStream.format("memory").queryName("band_hits")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, d1), (2L, d1), (3L, d3))
      q.processAllAvailable()
      input.addData((4L, d1))
      q.processAllAvailable()
      val hits = spark.table("band_hits").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getBoolean(4)))
      // every (doc, band) appears exactly once: 4 docs × 2 bands
      assert(hits.length == 8, hits.mkString(","))
      val byDoc = hits.groupBy(_._1)
      // doc 1 claimed both buckets (smallest id in its micro-batch)
      assert(byDoc(1L).forall(h => h._4 && h._3 == 1L))
      // doc 2: identical text → both bands collide with doc 1
      assert(byDoc(2L).forall(h => !h._4 && h._3 == 1L))
      // doc 3: disjoint vocabulary → first in its own buckets
      assert(byDoc(3L).forall(_._4))
      // doc 4, batch 2: state remembered doc 1's claims
      assert(byDoc(4L).forall(h => !h._4 && h._3 == 1L))
      // and the streaming banding is the batch banding: same bh values
      val batchBands = graft.ops.DedupOps.minhashBandRowsFromText(
        Seq((1L, d1)).toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(1), r.getString(2))).toSet
      val streamBands = spark.table("band_hits")
        .filter("doc_id = 1").collect().map(r => (r.getInt(1), r.getString(2))).toSet
      assert(batchBands == streamBands)
    } finally q.stop()
  }

  test("stream-static incremental screen matches the batch index probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    spark.sql("CREATE DATABASE IF NOT EXISTS stream_bkt")
    graft.ops.DedupOps.writeBandIndex(
      all.filter("doc_id % 5 != 0"), "stream_bkt.band_index")
    val newDocs = all.filter("doc_id % 5 = 0")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.incrementalScreen(
        input.toDF().toDF("doc_id", "text"), "stream_bkt.band_index")
      .writeStream.format("memory").queryName("screen")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("screen")
        .select("doc_id", "existing_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.ops.DedupOps.incrementalAgainstIndex(
          spark, all.filter("doc_id % 5 = 0"), "stream_bkt.band_index")
        .select("new_id", "existing_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(5)}, batch-only: ${(batch -- streamed).take(5)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming decontamination hits aggregate to the batch screen exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val bucket = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.expr(
        "cast(conv(substring(md5(text), 1, 13), 16, 10) as bigint)"),
      org.apache.spark.sql.functions.lit(100L))
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .withColumn("bucket", bucket)
    val heldoutGrams = all.filter(s"bucket >= ${graft.ops.TextOps.HeldoutBucket}")
      .withColumn("tk", org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("text"), " "))
      .filter("size(tk) >= 8")
      .selectExpr("doc_id AS h_id",
        "explode(transform(sequence(1, size(tk) - 7), i -> array_join(slice(tk, i, 8), ' '))) AS ngram")
      .select("ngram", "h_id").distinct()
    val train = all.filter(s"bucket < ${graft.ops.TextOps.HeldoutBucket}")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.decontaminationScreen(
        input.toDF().toDF("doc_id", "text"), heldoutGrams)
      .writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = train.splitAt(train.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("decontam")
        .groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.countDistinct("ngram").as("n_shared"),
          org.apache.spark.sql.functions.countDistinct("h_id").as("n_heldout_docs"))
      val batch = SparkEntry.queries("dedup_decontaminate")(spark, dir)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("streaming curation emits exactly the batch capstone's kept documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed the real sf0.001 corpus in doc_id order, two batches — the
    // arrival-order fingerprint election then matches the batch
    // min-doc_id election, so keep sets must be identical
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocStreams.curationStream(docs)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = all.splitAt(all.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamKept = spark.table("curated")
        .collect().map(_.getLong(0)).toSet
      val batchKept = graft.ops.TextOps.corpusCuration(spark, "/root/testdata/sf0.001")
        .filter("keep = 1").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept,
        s"stream-only: ${(streamKept -- batchKept).take(5)}, batch-only: ${(batchKept -- streamKept).take(5)}")
      assert(streamKept.nonEmpty)
    } finally q.stop()
  }

  test("dedup_incremental_stream_twin catalog entry equals the batch index probe") {
    val dir = "/root/testdata/sf0.001"
    // the catalog entry executes the REAL streaming query (file source →
    // memory sink) and rebuilds the band index itself
    val twin = graft.ops.DedupOps.dedupIncrementalStreamTwin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // batch probe of the index the entry just wrote, over the same split
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val batch = graft.ops.DedupOps.incrementalAgainstIndex(
        spark, all.filter("doc_id % 5 = 0"), "graft_stream_twin.band_index")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(twin == batch,
      s"twin-only: ${(twin -- batch).take(5)}, batch-only: ${(batch -- twin).take(5)}")
    assert(twin.nonEmpty)
    // idempotent re-run in the same session (Verify/Probe may call twice)
    val again = graft.ops.DedupOps.dedupIncrementalStreamTwin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == twin)
  }

  test("events_sessionize_tws_twin (transformWithState) equals v1 and the batch form") {
    val dir = "/root/testdata/sf0.001"
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tws = totals(graft.ops.EventOps.eventsSessionizeTwsTwin(spark, dir))
    val v1 = totals(graft.ops.EventOps.eventsSessionizeStreamTwin(spark, dir))
    val batch = totals(graft.ops.EventOps.eventsSessionize(spark, dir)
      .select("user_id", "n_events", "n_sessions"))
    assert(tws.nonEmpty)
    assert(tws == v1, s"tws-only: ${(tws -- v1).take(5)}, v1-only: ${(v1 -- tws).take(5)}")
    assert(tws == batch, s"tws-only: ${(tws -- batch).take(5)}, batch-only: ${(batch -- tws).take(5)}")
  }

  test("events_sessionize_stream_twin catalog entry equals the batch form") {
    val dir = "/root/testdata/sf0.001"
    val twin = graft.ops.EventOps.queries.toMap
      .apply("events_sessionize_stream_twin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.ops.EventOps.queries.toMap
      .apply("events_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(twin == batch,
      s"twin-only: ${(twin -- batch).take(5)}, batch-only: ${(batch -- twin).take(5)}")
    assert(twin.nonEmpty)
  }

  test("sessionization state math keeps microsecond fidelity across the 30-min gap") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    // two events 30 min + 500 µs apart: µs arithmetic opens a second
    // session; ms-truncated arithmetic reads the gap as exactly 30 min
    // and would keep one session — the regression the round-5 fix closed
    // (latent in the sf corpora: zero boundary flips there)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:30:00")
    t1.setNanos(500000) // +500 µs
    val input = MemoryStream[SessionInput]
    val q = EventStreams.startToMemory(
      EventStreams.sessionize(input.toDS()).toDF(), "us_fidelity", OutputMode.Update())
    try {
      input.addData(SessionInput(7L, t0), SessionInput(7L, t1))
      q.processAllAvailable()
      val r = spark.table("us_fidelity").as[SessionUpdate].collect()
        .filter(_.user_id == 7L).maxBy(_.n_events)
      assert(r.n_events == 2 && r.n_sessions == 2,
        s"expected 2 sessions across the 30min+500us gap, got $r")
    } finally q.stop()
  }

  test("mapGroupsWithState sessionization") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionInput]
    val q = EventStreams.startToMemory(
      EventStreams.sessionize(input.toDS()).toDF(), "sessions", OutputMode.Update())
    try {
      // user 1: events at 0 and 10 min (one session), then 50 min (> 30
      // min gap → second session); user 2: one event
      input.addData(SessionInput(1L, ts(0)), SessionInput(1L, ts(10)))
      q.processAllAvailable()
      input.addData(SessionInput(1L, ts(50)), SessionInput(2L, ts(5)))
      q.processAllAvailable()
      val byUser = spark.table("sessions").as[SessionUpdate].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      assert(byUser(1L).n_events == 3 && byUser(1L).n_sessions == 2)
      assert(byUser(2L).n_events == 1 && byUser(2L).n_sessions == 1)
    } finally q.stop()
  }

  test("graft-docs micro-batch stream composes with the stateful band machine") {
    // the custom DSv2 streaming source feeding the flatMapGroupsWithState
    // first-claimant state machine across FOUR micro-batches: because
    // offset ranges admit ids in increasing order, the cross-batch first
    // claimant of every band bucket must equal the batch groupBy-MIN
    // over the same generated corpus — the composition contract that
    // makes generator-driven streaming dedup studies trustworthy
    implicit val sess = spark
    val streamDocs = spark.readStream.format("graft-docs")
      .option("n", "1200").option("rowsPerBatch", "300").option("dupEvery", "10")
      .load().select("doc_id", "text")
    val q = graft.streaming.DocStreams.nearDupBandFilter(streamDocs).toDF()
      .writeStream.format("memory").queryName("gen_band_hits")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("gen_band_hits")
        .select("doc_id", "bi", "bh", "first_doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)) -> r.getLong(3)).toMap
      val batchDocs = spark.read.format("graft-docs")
        .option("n", "1200").option("dupEvery", "10").load().select("doc_id", "text")
      val rows = graft.ops.DedupOps.minhashBandRowsFromText(batchDocs).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      val firstByBucket = rows.groupBy(t => (t._2, t._3))
        .map { case (k, ts) => k -> ts.map(_._1).min }
      assert(got.nonEmpty && got.size == rows.length)
      rows.foreach { case (doc, bi, bh) =>
        assert(got((doc, bi, bh)) == firstByBucket((bi, bh)),
          s"doc $doc band ($bi,$bh)")
      }
      // the planted dups guarantee non-first hits exist (non-vacuous)
      assert(got.exists { case ((doc, _, _), first) => first != doc })
    } finally q.stop()
  }
}
