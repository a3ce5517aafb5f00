package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import sources.SnapshotLog

/** The snapshot-log streaming source ([[graft.sources
  * .SnapshotStreamProvider]]): version-number offsets, each micro-batch
  * = the files ADDED in its version range (exactly the appended batch
  * for a commitAppend writer), loud failure at non-append versions
  * unless ignoreChanges, and rows identical to a batch read of the same
  * files (the source reuses Spark's own parquet reader).
  */
class SnapshotStreamSpec extends SparkSpec {

  test("appends stream as exact micro-batches; a rewrite fails loudly; ignoreChanges restates") {
    import spark.implicits._
    val t = s"$scratch/snapstream"
    SnapshotLog.commit(spark, t, spark.range(3).select(
      col("id").as("key"), (col("id") * 10).as("v")).repartition(1))

    val q = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).load()
      .writeStream.format("memory").queryName("snapout").start()
    try {
      q.processAllAvailable()
      // batch 1 = version 0's full content
      assert(spark.table("snapout").count() == 3)
      // an appended version arrives as exactly its own rows
      SnapshotLog.commitAppend(spark, t, spark.range(3, 5).select(
        col("id").as("key"), (col("id") * 10).as("v")).repartition(1))
      q.processAllAvailable()
      val rows = spark.table("snapout").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == Map(0L -> 0L, 1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L))
      // exactly-once per version: nothing re-emitted
      assert(spark.table("snapout").count() == 5)
      // a COW rewrite breaks the new-files=new-rows equation → loud
      SnapshotLog.deleteWhere(spark, t, "key", Some(0L), Some(0L))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def advised(s: String) = e.getMessage.contains(s) ||
        Option(e.getCause).exists(_.getMessage.contains(s))
      assert(advised("not an append"), e.getMessage)
      // the advice must name a startVersion that actually works: a
      // fresh stream AT the rewrite version v hits the same subset
      // check (v vs v−1), so the message advises v+1
      assert(advised("startVersion=3"), e.getMessage)
    } finally q.stop()

    // ignoreChanges: a fresh stream from the rewrite version emits the
    // restated rows (at-least-once, the documented Delta semantics)
    val q2 = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).option("startVersion", 2L)
      .option("ignoreChanges", true).load()
      .writeStream.format("memory").queryName("snapout2").start()
    try {
      q2.processAllAvailable()
      val restated = spark.table("snapout2").collect()
        .map(r => r.getLong(0)).sorted
      // version 2 rewrote the file that held keys 0..2 minus the
      // deleted key 0 → the restated rows are exactly 1 and 2
      assert(restated.toSeq == Seq(1L, 2L), restated.mkString(","))
    } finally q2.stop()

    // the advised skip path: startVersion = v+1 streams past the
    // rewrite without ignoreChanges — nothing restated, and the next
    // append is picked up normally
    val q3 = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).option("startVersion", 3L).load()
      .writeStream.format("memory").queryName("snapout3").start()
    try {
      q3.processAllAvailable()
      assert(spark.table("snapout3").count() == 0)
      SnapshotLog.commitAppend(spark, t, spark.range(5, 7).select(
        col("id").as("key"), (col("id") * 10).as("v")).repartition(1))
      q3.processAllAvailable()
      assert(spark.table("snapout3").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(5L, 6L))
    } finally q3.stop()
  }

  test("the full loop: log → stream → idempotent-append sink → log replicates a table") {
    import spark.implicits._
    val src = s"$scratch/snapstream_loop_src"
    val dst = s"$scratch/snapstream_loop_dst"
    SnapshotLog.commit(spark, src, spark.range(50).select(
      col("id").as("key"), (col("id") % 7).as("v")))
    val q = spark.readStream.format("graft-snaplog")
      .option("tableDir", src).load()
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          SnapshotLog.commitAppendIdempotent(spark, dst, batch, id): Unit
      }.start()
    try {
      q.processAllAvailable()
      SnapshotLog.commitAppend(spark, src, spark.range(50, 80).select(
        col("id").as("key"), (col("id") % 7).as("v")))
      SnapshotLog.commitAppend(spark, src, spark.range(80, 90).select(
        col("id").as("key"), (col("id") % 7).as("v")))
      q.processAllAvailable()
    } finally q.stop()
    // the replica holds exactly the source's rows, arrived as appends
    val a = SnapshotLog.read(spark, src).collect().map(_.toString).sorted
    val b = SnapshotLog.read(spark, dst).collect().map(_.toString).sorted
    assert(a.length == 90 && a.sameElements(b))
    // and the replica's history is per-micro-batch (versions exist,
    // dense from 0), each an append
    assert(SnapshotLog.latestVersion(dst).exists(_ >= 1L))
  }

  test("streamed rows equal a batch read of the same versions (checkpointed restart resumes)") {
    import spark.implicits._
    val t = s"$scratch/snapstream_ckpt"
    val ckpt = s"$scratch/snapstream_ckpt_loc"
    val out = s"$scratch/snapstream_ckpt_out"
    SnapshotLog.commit(spark, t, spark.range(100).select(
      col("id").as("key"), md5(col("id").cast("string")).as("payload")))
    def start() = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(out).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = SnapshotLog.read(spark, t).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed.size == 100 && streamed == batch)
    } finally q.stop()
    // restart against the same checkpoint: the committed version is
    // not re-emitted (manifests are immutable = replayable offsets),
    // a new append is picked up from where the checkpoint left off
    SnapshotLog.commitAppend(spark, t, spark.range(100, 120).select(
      col("id").as("key"), md5(col("id").cast("string")).as("payload")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val keys = spark.read.parquet(out).select("key")
        .collect().map(_.getLong(0)).sorted
      assert(keys.length == 120 && keys.toSeq == (0L until 120L))
    } finally q2.stop()
  }

  test("the columnar path ENGAGES for a flat schema (not a silent row fallback)") {
    import org.apache.spark.sql.graftbridge.Bridge
    val t = s"$scratch/snapstream_columnar"
    SnapshotLog.commit(spark, t, spark.range(1000).select(
      col("id").as("key"), md5(col("id").cast("string")).as("payload")))
    val table = SnapshotLog.read(spark, t)
    val files = table.inputFiles.toSeq
      .map(f => new java.net.URI(f).getPath)
    val schema = table.schema
    // the eligibility predicate is Spark's own supportBatch — a flat
    // long/string schema MUST vectorize, else every stream of this
    // table silently pays the measured 1.98x row-path tax
    val fn = Bridge.parquetFileBatches(spark, schema)
    assert(fn.isDefined, "flat schema must take the columnar path")
    // and the returned batches carry exactly the committed rows
    val total = files.map(f => fn.get(f).map(_.numRows()).sum).sum
    assert(total == 1000L, s"columnar batches carried $total rows")
  }

  test("writeStream.format(graft-snaplog) is the exactly-once ingest sink; foreign commits surface as theft") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t = s"$scratch/sinktable"
    SnapshotLog.createTable(t, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    val ckpt = s"$scratch/sink_ckpt"
    val in = MemoryStream[(Long, Long)]
    def start() = in.toDF().toDF("k", "v").writeStream
      .format("graft-snaplog").option("tableDir", t)
      .option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      in.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      in.addData((3L, 30L)); q.processAllAvailable()
      assert(SnapshotLog.read(spark, t).count() == 3)
      // one version per micro-batch on top of the genesis, op = append
      assert(SnapshotLog.latestVersion(t).contains(2L))
      assert(SnapshotLog.history(t).sortBy(_.version).map(_.op) ==
        Seq("create-table", "append", "append"))
    } finally q.stop()
    // restart on the SAME checkpoint: the durable base keeps versions
    // dense; new batches land as the next versions
    val q2 = start()
    try {
      in.addData((4L, 40L)); q2.processAllAvailable()
      assert(SnapshotLog.read(spark, t).count() == 4)
      assert(SnapshotLog.latestVersion(t).contains(3L))
      // a FOREIGN commit interleaving with the sink's arithmetic is
      // theft, not a silent replay-decline: the next batch fails
      // loudly instead of dropping its rows
      SnapshotLog.commitAppend(spark, t, spark.range(100, 101)
        .select(org.apache.spark.sql.functions.col("id").as("k"),
          org.apache.spark.sql.functions.col("id").as("v")))
      in.addData((5L, 50L))
      val e = intercept[StreamingQueryException] { q2.processAllAvailable() }
      def msgs(x: Throwable): String =
        if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
      assert(msgs(e).contains("foreign commit") || msgs(e).contains("gap"),
        msgs(e).take(400))
    } finally q2.stop()
    // update/complete modes and missing tables refuse at sink build
    val eM = intercept[Exception] {
      in.toDF().toDF("k", "v").writeStream.format("graft-snaplog")
        .option("tableDir", s"$scratch/sink_absent")
        .option("checkpointLocation", s"$scratch/sink_ckpt2").start()
    }
    assert(eM.getMessage.contains("create the table first"),
      eM.getMessage.take(300))
  }

  test("writeStream.toTable is the exactly-once V2 streaming sink (executor-side parquet writers)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val root = java.nio.file.Files.createTempDirectory("graft_tablesink_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scw", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scw.root", root.toString)
    val t = root.resolve("lake").resolve("w").toString
    try {
      spark.sql("CREATE TABLE scw.lake.w (k BIGINT, v BIGINT, " +
        "CONSTRAINT v_nn CHECK (v >= 0))")
      val ckpt = s"$scratch/tablesink_ckpt"
      val in = MemoryStream[(Long, Long)]
      def start() = in.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", ckpt).toTable("scw.lake.w")
      val q = start()
      try {
        in.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
        in.addData((3L, 30L)); q.processAllAvailable()
        assert(SnapshotLog.read(spark, t).count() == 3)
        // one version per epoch on the genesis; append provenance
        assert(SnapshotLog.latestVersion(t).contains(2L))
        assert(SnapshotLog.history(t).sortBy(_.version).map(_.op) ==
          Seq("create-table", "append", "append"))
        // the executor-written files carry harvested footer stats —
        // the stats-pruned point read equals the exact filter
        val pruned = SnapshotLog.readWhere(spark, t, "k",
          lower = Some(3L), upper = Some(3L))
        assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1)))
          .toSeq == Seq((3L, 30L)))
      } finally q.stop()
      // restart on the SAME checkpoint: the durable base keeps
      // versions dense (queryId is the stable id, not runId)
      val q2 = start()
      try {
        in.addData((4L, 40L)); q2.processAllAvailable()
        assert(SnapshotLog.read(spark, t).count() == 4)
        assert(SnapshotLog.latestVersion(t).contains(3L))
        // CHECK constraints guard this surface like every other
        // row-creating verb: the violating epoch fails loudly and
        // publishes nothing
        in.addData((5L, -50L))
        val eC = intercept[StreamingQueryException] { q2.processAllAvailable() }
        assert(msgs(eC).contains("v_nn"), msgs(eC).take(400))
        assert(SnapshotLog.latestVersion(t).contains(3L))
        assert(SnapshotLog.read(spark, t).count() == 4)
      } finally q2.stop()
      // a FOREIGN commit interleaving with the arithmetic is theft:
      // the sink refuses loudly instead of dropping its batch.
      // (fresh checkpoint — the poisoned epoch above would replay)
      SnapshotLog.dropConstraint(t, "v_nn")
      val q3 = in.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", s"$scratch/tablesink_ckpt3")
        .toTable("scw.lake.w")
      try {
        in.addData((6L, 60L)); q3.processAllAvailable()
        SnapshotLog.commitAppend(spark, t, spark.range(100, 101)
          .select(col("id").as("k"), col("id").as("v")))
        in.addData((7L, 70L))
        val eF = intercept[StreamingQueryException] { q3.processAllAvailable() }
        assert(msgs(eF).contains("foreign commit") || msgs(eF).contains("gap"),
          msgs(eF).take(400))
      } finally q3.stop()
      // schema mismatch refuses loudly at stream start — this surface
      // never evolves schema
      val eS = intercept[Exception] {
        val qs = in.toDF().toDF("k", "wrong").writeStream
          .option("checkpointLocation", s"$scratch/tablesink_ckpt4")
          .toTable("scw.lake.w")
        try qs.processAllAvailable() finally qs.stop()
      }
      assert(msgs(eS).toLowerCase.contains("schema") ||
        msgs(eS).contains("wrong"), msgs(eS).take(400))
      // toTable on a MISSING table creates it through the catalog (the
      // schema-only genesis) and streams into it
      val in2 = MemoryStream[(Long, Long)]
      val q4 = in2.toDF().toDF("a", "b").writeStream
        .option("checkpointLocation", s"$scratch/tablesink_ckpt5")
        .toTable("scw.lake.fresh")
      try {
        in2.addData((1L, 2L)); q4.processAllAvailable()
        val ft = root.resolve("lake").resolve("fresh").toString
        assert(SnapshotLog.history(ft).sortBy(_.version).map(_.op) ==
          Seq("create-table", "append"))
        assert(spark.sql("SELECT a, b FROM scw.lake.fresh").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
      } finally q4.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.scw.root")
      spark.conf.unset("spark.sql.catalog.scw")
    }
  }

  test("toTable streaming writes speak PHYSICAL names under a column map") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_tablesink_cm_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scm", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scm.root", root.toString)
    val t = root.resolve("lake").resolve("m").toString
    try {
      SnapshotLog.commit(spark, t, spark.range(2).select(
        col("id").as("key"), (col("id") * 10).as("src")).repartition(1))
      // activate the column map: src → a fresh logical name
      SnapshotLog.renameColumn(t, "src", "source")
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        t, "_log", s"${SnapshotLog.latestVersion(t).get}.json"))
        .contains("colmap"))
      val in = MemoryStream[(Long, Long)]
      val q = in.toDF().toDF("key", "source").writeStream
        .option("checkpointLocation", s"$scratch/tablesink_cm_ckpt")
        .toTable("scm.lake.m")
      try {
        in.addData((7L, 70L)); q.processAllAvailable()
        // logical read sees the row under the logical name…
        val rows = spark.sql("SELECT key, source FROM scm.lake.m")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(rows == Map(0L -> 0L, 1L -> 10L, 7L -> 70L))
        // …and the stream-written FILE carries the physical name (the
        // original 'src' — rename was metadata-only)
        val streamed = SnapshotLog.read(spark, t) // resolves mask/map
        assert(streamed.columns.toSeq == Seq("key", "source"))
        val fresh = java.nio.file.Files.walk(
          java.nio.file.Paths.get(t, "data")).iterator()
        val streamFile = scala.jdk.CollectionConverters
          .IteratorHasAsScala(fresh).asScala
          .find(p => p.toString.contains("stream-") &&
            p.toString.endsWith(".parquet"))
        assert(streamFile.isDefined, "no stream-written file found")
        assert(spark.read.parquet(streamFile.get.toString)
          .columns.toSeq == Seq("key", "src"))
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.scm.root")
      spark.conf.unset("spark.sql.catalog.scm")
    }
  }

  test("readStream.table through the catalog is the same stream; changeFeed names the format surface") {
    val root = java.nio.file.Files.createTempDirectory("graft_catstream_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scs", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scs.root", root.toString)
    val t = root.resolve("lake").resolve("t").toString
    try {
      SnapshotLog.commit(spark, t, spark.range(5).select(
        col("id").as("key"), (col("id") * 10).as("v")).repartition(1))
      val q = spark.readStream.table("scs.lake.t")
        .writeStream.format("memory").queryName("catstream").start()
      try {
        q.processAllAvailable()
        assert(spark.table("catstream").count() == 5)
        // appends keep arriving — the stream tracks the LOG, not the
        // version the catalog resolved at plan time
        SnapshotLog.commitAppend(spark, t, spark.range(5, 8).select(
          col("id").as("key"), (col("id") * 10).as("v")).repartition(1))
        q.processAllAvailable()
        val rows = spark.table("catstream").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(rows == (0L until 8L).map(i => i -> i * 10).toMap)
        // options flow: startVersion through the catalog surface
        val q2 = spark.readStream.option("startVersion", 1L)
          .table("scs.lake.t")
          .writeStream.format("memory").queryName("catstream2").start()
        try {
          q2.processAllAvailable()
          assert(spark.table("catstream2").count() == 3) // v1's appended rows
        } finally q2.stop()
      } finally q.stop()
      // changeFeed cannot ride the catalog-resolved schema (no room
      // for the feed's two extra columns) — loud, naming the format
      val e = intercept[Exception] {
        val qf = spark.readStream.option("changeFeed", true)
          .table("scs.lake.t")
          .writeStream.format("memory").queryName("catstream3").start()
        try qf.processAllAvailable() finally qf.stop()
      }
      def msgs(x: Throwable): String =
        if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
      assert(msgs(e).contains("graft-snaplog"), msgs(e).take(400))
    } finally {
      spark.conf.unset("spark.sql.catalog.scs.root")
      spark.conf.unset("spark.sql.catalog.scs")
    }
  }

  test("complete mode replaces the table per epoch (idempotent INSERT OVERWRITE per trigger)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val root = java.nio.file.Files.createTempDirectory("graft_complete_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scc", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scc.root", root.toString)
    val t = root.resolve("lake").resolve("c").toString
    try {
      spark.sql("CREATE TABLE scc.lake.c (word STRING, n BIGINT)")
      val ckpt = s"$scratch/complete_ckpt"
      val in = MemoryStream[String]
      def start() = in.toDF().toDF("word").groupBy("word")
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt).toTable("scc.lake.c")
      val q = start()
      try {
        in.addData("a", "b", "a"); q.processAllAvailable()
        def state() = spark.sql("SELECT word, n FROM scc.lake.c")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(state() == Map("a" -> 2L, "b" -> 1L))
        // the epoch REPLACED the genesis: a full-rewrite commit, not
        // an append — and the next epoch replaces it again
        in.addData("a"); q.processAllAvailable()
        assert(state() == Map("a" -> 3L, "b" -> 1L))
        assert(SnapshotLog.history(t).sortBy(_.version).map(_.op) ==
          Seq("create-table", "commit", "commit"))
        // history kept every epoch: time travel reads epoch 0's result
        val v1 = SnapshotLog.read(spark, t, asOf = Some(1L)).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(v1 == Map("a" -> 2L, "b" -> 1L))
      } finally q.stop()
      // restart on the SAME checkpoint: the complete state replays and
      // the next epoch lands as the next dense version
      val q2 = start()
      try {
        in.addData("c"); q2.processAllAvailable()
        val s = spark.sql("SELECT word, n FROM scc.lake.c").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(s == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
      } finally q2.stop()
      // complete + upsertKey is a semantic conflict — loud at build
      val eC = intercept[Exception] {
        val qc = in.toDF().toDF("word").groupBy("word")
          .agg(count(lit(1)).as("n"))
          .writeStream.outputMode("complete")
          .option("upsertKey", "word")
          .option("checkpointLocation", s"$scratch/complete_ckpt2")
          .toTable("scc.lake.c")
        try qc.processAllAvailable() finally qc.stop()
      }
      assert(msgs(eC).contains("conflict"), msgs(eC).take(400))
    } finally {
      spark.conf.unset("spark.sql.catalog.scc.root")
      spark.conf.unset("spark.sql.catalog.scc")
    }
  }

  test("update mode with upsertKey is the keyed MOR upsert sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scu", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scu.root", root.toString)
    val t = root.resolve("lake").resolve("u").toString
    try {
      spark.sql("CREATE TABLE scu.lake.u (k BIGINT, v BIGINT)")
      val ckpt = s"$scratch/upsert_ckpt"
      val in = MemoryStream[(Long, Long)]
      def start() = in.toDF().toDF("k", "raw").groupBy("k")
        .agg(sum($"raw").as("v"))
        .writeStream.outputMode("update")
        .option("upsertKey", "k")
        .option("checkpointLocation", ckpt).toTable("scu.lake.u")
      def state() = spark.sql("SELECT k, v FROM scu.lake.u")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val q = start()
      try {
        in.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
        assert(state() == Map(1L -> 10L, 2L -> 20L))
        // update mode delivers only the UPDATED key; the sink merges
        // it — key 2's row survives untouched (an append would have
        // duplicated key 1; a replace would have dropped key 2)
        in.addData((1L, 5L)); q.processAllAvailable()
        assert(state() == Map(1L -> 15L, 2L -> 20L))
        assert(SnapshotLog.history(t).sortBy(_.version).map(_.op) ==
          Seq("create-table", "merge-mor", "merge-mor"))
        // time travel: the pre-update state survives
        assert(SnapshotLog.read(spark, t, asOf = Some(1L)).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
          Map(1L -> 10L, 2L -> 20L))
      } finally q.stop()
      // restart on the SAME checkpoint — dense versions continue
      val q2 = start()
      try {
        in.addData((3L, 7L)); q2.processAllAvailable()
        assert(state() == Map(1L -> 15L, 2L -> 20L, 3L -> 7L))
      } finally q2.stop()
      // the per-epoch staging files were reclaimed after each merge —
      // no orphan stream accumulates between vacuums
      val staged = java.nio.file.Files.walk(
        java.nio.file.Paths.get(t, "data")).iterator()
      val leftover = scala.jdk.CollectionConverters
        .IteratorHasAsScala(staged).asScala
        .filter(p => p.toString.contains("stream-") &&
          p.toString.endsWith(".parquet")).toSeq
      assert(leftover.isEmpty, s"staging files not reclaimed: $leftover")
      // update mode WITHOUT upsertKey: the builder does not advertise
      // update-as-append, so Spark itself refuses — no silent
      // duplicate-key appends
      val eU = intercept[Exception] {
        val qu = in.toDF().toDF("k", "raw").groupBy("k")
          .agg(sum($"raw").as("v"))
          .writeStream.outputMode("update")
          .option("checkpointLocation", s"$scratch/upsert_ckpt2")
          .toTable("scu.lake.u")
        try qu.processAllAvailable() finally qu.stop()
      }
      assert(msgs(eU).toLowerCase.contains("update"), msgs(eU).take(400))
      // a key outside the schema refuses at build, naming the columns
      val eK = intercept[Exception] {
        val qk = in.toDF().toDF("k", "raw").groupBy("k")
          .agg(sum($"raw").as("v"))
          .writeStream.outputMode("update")
          .option("upsertKey", "nope")
          .option("checkpointLocation", s"$scratch/upsert_ckpt3")
          .toTable("scu.lake.u")
        try qk.processAllAvailable() finally qk.stop()
      }
      assert(msgs(eK).contains("not a table column"), msgs(eK).take(400))
      // a BATCH write carrying upsertKey refuses loudly — silently
      // appending duplicate keys would be a lie by omission
      val eB = intercept[Exception] {
        spark.range(1).select(col("id").as("k"), col("id").as("v"))
          .writeTo("scu.lake.u").option("upsertKey", "k").append()
      }
      assert(msgs(eB).contains("streaming-sink option"), msgs(eB).take(400))
      // APPEND mode with upsertKey upserts too: the option, not the
      // mode, selects the semantics (a post-image CDC stream is
      // append-shaped but keyed)
      val in2 = MemoryStream[(Long, Long)]
      val q3 = in2.toDF().toDF("k", "v").writeStream
        .option("upsertKey", "k")
        .option("checkpointLocation", s"$scratch/upsert_ckpt4")
        .toTable("scu.lake.u")
      try {
        in2.addData((2L, 99L)); q3.processAllAvailable()
        assert(state() == Map(1L -> 15L, 2L -> 99L, 3L -> 7L))
      } finally q3.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.scu.root")
      spark.conf.unset("spark.sql.catalog.scu")
    }
  }

  test("the upsert sink speaks PHYSICAL names under a column map") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_cm_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scm2", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scm2.root", root.toString)
    val t = root.resolve("lake").resolve("m").toString
    try {
      SnapshotLog.commit(spark, t, spark.range(3).select(
        col("id").as("key"), (col("id") * 10).as("src")).repartition(1))
      SnapshotLog.renameColumn(t, "src", "source")
      val in = MemoryStream[(Long, Long)]
      // the stream speaks LOGICAL names; the staging files carry the
      // physical 'src', and the merge's post-images land through the
      // colmap like any MOR write
      val q = in.toDF().toDF("key", "source").writeStream
        .option("upsertKey", "key")
        .option("checkpointLocation", s"$scratch/upsert_cm_ckpt")
        .toTable("scm2.lake.m")
      try {
        in.addData((1L, -5L), (7L, 70L)); q.processAllAvailable()
        val rows = spark.sql("SELECT key, source FROM scm2.lake.m")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(rows == Map(0L -> 0L, 1L -> -5L, 2L -> 20L, 7L -> 70L))
        assert(SnapshotLog.history(t).maxBy(_.version).op == "merge-mor")
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.scm2.root")
      spark.conf.unset("spark.sql.catalog.scm2")
    }
  }

  test("one line of catalog surface replicates a table: .changes stream into the upsertKey sink") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrep_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.scr", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.scr.root", root.toString)
    val src = root.resolve("lake").resolve("src").toString
    val rep = root.resolve("lake").resolve("rep").toString
    try {
      // source lifecycle: commit, append, MOR delete, MOR update —
      // the feed carries inserts, deletes, and pre/post image pairs
      SnapshotLog.commit(spark, src, spark.range(100)
        .select(col("id").as("k"), (col("id") * 7).as("v"))
        .repartition(2))
      SnapshotLog.commitAppend(spark, src, spark.range(100, 120)
        .select(col("id").as("k"), (col("id") * 7).as("v")))
      SnapshotLog.deleteWhereInMOR(spark, src, "k", (0L until 5L).toSeq)
      SnapshotLog.updateWhereInMOR(spark, src, "k", Seq(10L, 11L),
        Map("v" -> lit(-1L)))
      spark.sql("CREATE TABLE scr.lake.rep (k BIGINT, v BIGINT)")
      val ckpt = s"$scratch/cdcrep_ckpt"
      def replicate(): Unit = {
        val q = spark.readStream.table("scr.lake.src.changes")
          .writeStream.option("upsertKey", "k")
          .option("checkpointLocation", ckpt)
          .toTable("scr.lake.rep")
        try q.processAllAvailable() finally q.stop()
      }
      def rows(d: String): Seq[(Long, Long)] =
        SnapshotLog.read(spark, d).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
      replicate()
      assert(rows(rep) == rows(src),
        "replica must equal the source after the first run")
      assert(rows(rep).toMap.get(10L).contains(-1L)) // update applied
      assert(!rows(rep).toMap.contains(0L))          // delete applied
      // every applied epoch is one idempotent merge on the replica
      val ops = SnapshotLog.history(rep).sortBy(_.version).map(_.op)
      assert(ops.head == "create-table" &&
        ops.tail.forall(_ == "merge-mor"), ops.toString)
      // day-2 churn catches up on the SAME checkpoint
      SnapshotLog.deleteWhereInMOR(spark, src, "k", Seq(10L))
      SnapshotLog.commitAppend(spark, src, spark.range(120, 130)
        .select(col("id").as("k"), (col("id") * 7).as("v")))
      replicate()
      assert(rows(rep) == rows(src),
        "replica must catch up after day-2 churn")
      // the per-epoch staging files were reclaimed after each apply
      val staged = java.nio.file.Files.walk(
        java.nio.file.Paths.get(rep, "data")).iterator()
      val leftover = scala.jdk.CollectionConverters
        .IteratorHasAsScala(staged).asScala
        .filter(p => p.toString.contains("stream-") &&
          p.toString.endsWith(".parquet")).toSeq
      assert(leftover.isEmpty, s"staging files not reclaimed: $leftover")
    } finally {
      spark.conf.unset("spark.sql.catalog.scr.root")
      spark.conf.unset("spark.sql.catalog.scr")
    }
  }

  test("upsertOrderBy compacts a duplicate-keyed epoch last-wins; without it the epoch fails actionably") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_ob_")
    java.nio.file.Files.createDirectories(root.resolve("lake"))
    spark.conf.set("spark.sql.catalog.sob", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.sob.root", root.toString)
    try {
      spark.sql("CREATE TABLE sob.lake.o (k BIGINT, seq BIGINT, v BIGINT)")
      def state() = spark.sql("SELECT k, seq, v FROM sob.lake.o")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // ONE epoch carrying key 1 twice — exactly the catch-up shape
      // (a multi-version micro-batch) that used to wedge the stream:
      // with upsertOrderBy the sink compacts last-wins (max seq)
      val in = MemoryStream[(Long, Long, Long)]
      val q = in.toDF().toDF("k", "seq", "v").writeStream
        .option("upsertKey", "k").option("upsertOrderBy", "seq")
        .option("checkpointLocation", s"$scratch/upsert_ob_ckpt")
        .toTable("sob.lake.o")
      try {
        in.addData((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 5L))
        q.processAllAvailable()
        assert(state() == Map(1L -> (2L, 20L), 2L -> (1L, 5L)))
        // a later epoch still upserts over the compacted winner
        in.addData((1L, 3L, 30L)); q.processAllAvailable()
        assert(state() == Map(1L -> (3L, 30L), 2L -> (1L, 5L)))
      } finally q.stop()
      // WITHOUT the option the duplicate-keyed epoch fails — but with
      // both fixes named (the old failure was the verb's bare
      // one-row-per-key require, identical on every checkpoint replay)
      val in2 = MemoryStream[(Long, Long, Long)]
      val eDup = intercept[Exception] {
        val qd = in2.toDF().toDF("k", "seq", "v").writeStream
          .option("upsertKey", "k")
          .option("checkpointLocation", s"$scratch/upsert_ob_ckpt2")
          .toTable("sob.lake.o")
        try {
          in2.addData((7L, 1L, 1L), (7L, 2L, 2L))
          qd.processAllAvailable()
        } finally qd.stop()
      }
      assert(msgs(eDup).contains("upsertOrderBy") &&
        msgs(eDup).contains(".changes"), msgs(eDup).take(600))
      // refusal taxonomy: orderBy without a key, unknown column, the
      // key itself, and the change-feed shape (which self-orders)
      val eNoKey = intercept[Exception] {
        val qn = in2.toDF().toDF("k", "seq", "v").writeStream
          .option("upsertOrderBy", "seq")
          .option("checkpointLocation", s"$scratch/upsert_ob_ckpt3")
          .toTable("sob.lake.o")
        try qn.processAllAvailable() finally qn.stop()
      }
      assert(msgs(eNoKey).contains("set upsertKey too"),
        msgs(eNoKey).take(400))
      val eCol = intercept[Exception] {
        val qc = in2.toDF().toDF("k", "seq", "v").writeStream
          .option("upsertKey", "k").option("upsertOrderBy", "nope")
          .option("checkpointLocation", s"$scratch/upsert_ob_ckpt4")
          .toTable("sob.lake.o")
        try qc.processAllAvailable() finally qc.stop()
      }
      assert(msgs(eCol).contains("not a table column"), msgs(eCol).take(400))
      val eKey = intercept[Exception] {
        val qk = in2.toDF().toDF("k", "seq", "v").writeStream
          .option("upsertKey", "k").option("upsertOrderBy", "k")
          .option("checkpointLocation", s"$scratch/upsert_ob_ckpt5")
          .toTable("sob.lake.o")
        try qk.processAllAvailable() finally qk.stop()
      }
      assert(msgs(eKey).contains("cannot order its own duplicates"),
        msgs(eKey).take(400))
      val inCdc = MemoryStream[(Long, Long, Long, String, Long)]
      val eCdc = intercept[Exception] {
        val qc = inCdc.toDF()
          .toDF("k", "seq", "v", "_change_type", "_commit_version")
          .writeStream
          .option("upsertKey", "k").option("upsertOrderBy", "seq")
          .option("checkpointLocation", s"$scratch/upsert_ob_ckpt6")
          .toTable("sob.lake.o")
        try {
          inCdc.addData((9L, 1L, 1L, "insert", 1L))
          qc.processAllAvailable()
        } finally qc.stop()
      }
      assert(msgs(eCdc).contains("change-feed-shaped"), msgs(eCdc).take(400))
    } finally {
      spark.conf.unset("spark.sql.catalog.sob.root")
      spark.conf.unset("spark.sql.catalog.sob")
    }
  }

  test("maxVersionsPerTrigger: a deep backlog drains in bounded micro-batches, restart resumes mid-backlog") {
    import org.apache.spark.sql.streaming.Trigger
    val t = s"$scratch/snapstream_admission"
    // a 10-version history (0..9), 4 rows each — the deep-backlog
    // shape that used to land as ONE giant catch-up micro-batch
    SnapshotLog.commit(spark, t, spark.range(4).select(
      col("id").as("key"), (col("id") * 10).as("v")).repartition(1))
    (1 to 9).foreach { i =>
      SnapshotLog.commitAppend(spark, t, spark.range(i * 4L, i * 4L + 4)
        .select(col("id").as("key"), (col("id") * 10).as("v"))
        .repartition(1))
    }
    val ckpt = s"$scratch/admission_ckpt"
    // restartable sink: the snaplog format sink (memory sink cannot
    // recover a checkpoint) — one sink version per micro-batch, so
    // the sink table's history IS the batch count
    val out = s"$scratch/snapstream_admission_out"
    SnapshotLog.createTable(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    def sinkRows(): Map[Long, Long] = SnapshotLog.read(spark, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def sinkVersions(): Long = SnapshotLog.latestVersion(out).get
    def start(trigger: Trigger) =
      spark.readStream.format("graft-snaplog")
        .option("tableDir", t).option("maxVersionsPerTrigger", 3)
        .load()
        .writeStream.format("graft-snaplog").option("tableDir", out)
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
    // run 1: a long ProcessingTime interval means exactly ONE
    // micro-batch fires before we stop — under the limit it advances
    // 3 versions (0..2), NOT the whole backlog. (Trigger.Once is no
    // test: Spark documents it BYPASSES admission control.)
    val q1 = start(Trigger.ProcessingTime("300 seconds"))
    try {
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (!q1.recentProgress.exists(_.numInputRows > 0) &&
        System.nanoTime < deadline) Thread.sleep(50)
    } finally q1.stop()
    assert(sinkRows().size == 12,
      "one rate-limited batch = versions 0..2 only")
    val v1 = sinkVersions()
    assert(v1 == 1L, s"one micro-batch = one sink version, got $v1")
    // run 2 on the SAME checkpoint resumes mid-backlog (offset 2) and
    // AvailableNow drains the remaining 7 versions in ceil(7/3) = 3
    // bounded batches, then stops
    val q2 = start(Trigger.AvailableNow())
    try q2.awaitTermination() finally q2.stop()
    assert(sinkVersions() - v1 == 3,
      s"expected ceil(7/3)=3 batches, got ${sinkVersions() - v1}")
    // stream == batch row parity over the whole history, exactly once
    assert(sinkRows() == SnapshotLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(sinkRows().size == 40, "exactly-once: no row re-emitted")
    // day-2: new commits drain under the same checkpoint, still capped
    (10 to 13).foreach { i =>
      SnapshotLog.commitAppend(spark, t, spark.range(i * 4L, i * 4L + 4)
        .select(col("id").as("key"), (col("id") * 10).as("v"))
        .repartition(1))
    }
    val v2 = sinkVersions()
    val q3 = start(Trigger.AvailableNow())
    try q3.awaitTermination() finally q3.stop()
    assert(sinkVersions() - v2 == 2,
      s"expected ceil(4/3)=2 batches, got ${sinkVersions() - v2}")
    assert(sinkRows().size == 56)
    // the .changes stream inherits the knob through the shared option
    // parse: 14 feed versions drain in ceil(14/5) = 3 batches
    val qc = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).option("changeFeed", "true")
      .option("maxVersionsPerTrigger", 5).load()
      .writeStream.format("memory").queryName("admcdc")
      .option("checkpointLocation", s"$scratch/admission_cdc_ckpt")
      .trigger(Trigger.AvailableNow()).start()
    try qc.awaitTermination() finally qc.stop()
    assert(qc.recentProgress.count(_.numInputRows > 0) == 3)
    assert(spark.table("admcdc").count() == 56, "every insert row once")
    // refusals: zero and non-numeric budgets
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val eZero = intercept[Exception] {
      val qz = spark.readStream.format("graft-snaplog")
        .option("tableDir", t).option("maxVersionsPerTrigger", 0).load()
        .writeStream.format("memory").queryName("admz")
        .option("checkpointLocation", s"$scratch/admission_z_ckpt")
        .start()
      try qz.processAllAvailable() finally qz.stop()
    }
    assert(msgs(eZero).contains("must be >= 1"), msgs(eZero).take(300))
  }
}
