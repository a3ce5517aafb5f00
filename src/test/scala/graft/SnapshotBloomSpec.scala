package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Per-file bloom index ([[graft.sources.SnapshotLog.writeBloomIndex]] /
  * [[graft.sources.SnapshotLog.readWhereIn]]): point-lookup file
  * pruning where min/max stats can't bite — a high-cardinality column
  * the layout does NOT cluster. The load-bearing property is the same
  * as the stats suite's: pruning NEVER changes a result (blooms have no
  * false negatives), asserted against the unpruned read + exact IN
  * filter on every shape — covered files, uncovered appends, rewritten
  * files, renamed columns, absent keys, and the int-width hash replay.
  */
class SnapshotBloomSpec extends SparkSpec {

  /** Ground truth: the unpruned read with the same exact IN predicate. */
  private def oracle(t: String, c: String, vs: Seq[Any],
      asOf: Option[Long] = None): Set[String] =
    SnapshotLog.read(spark, t, asOf).filter(col(c).isin(vs: _*))
      .collect().map(_.toString).toSet

  private def result(t: String, c: String, vs: Seq[Any],
      asOf: Option[Long] = None): Set[String] =
    SnapshotLog.readWhereIn(spark, t, c, vs, asOf)
      .collect().map(_.toString).toSet

  /** A table whose `key` is high-cardinality and deliberately
    * UNCLUSTERED (layout clusters on `grp`), so key min/max spans the
    * whole domain in every file and stats alone keep everything. */
  private def unclustered(t: String): Long = {
    // range-partition on the CONTIGUOUS id (8 exact files), while the
    // multiplicative scramble decorrelates key order from id order —
    // every file's key [min, max] spans ~the whole domain
    val df = spark.range(20000).repartitionByRange(8, col("id")).select(
      ((col("id") * 7919) % 20000).as("key"),
      (col("id") % 8).as("grp"),
      concat(lit("doc_"), col("id").cast("string")).as("payload"))
    SnapshotLog.commit(spark, t, df)
  }

  test("bloom index prunes a point lookup stats cannot; result is exact") {
    val t = s"$scratch/bloom_core"
    unclustered(t)
    val keys = Seq(17L, 4242L, 19993L)
    // stage-1 alone (no index yet): stats keep every file
    val (preKept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)
    assert(total == 8 && preKept.size == 8,
      s"unclustered key should defeat min/max stats, kept ${preKept.size}")
    assert(SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01) == 8)
    val (kept, _) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)
    // 3 keys live in ≤3 files; fpp=0.01 over 8 files adds ~0 extras
    assert(kept.size <= 4, s"bloom should prune to ≤4 of 8, kept ${kept.size}")
    assert(result(t, "key", keys) == oracle(t, "key", keys))
    assert(oracle(t, "key", keys).nonEmpty)
  }

  test("string-keyed index: present and absent keys, exact result") {
    val t = s"$scratch/bloom_str"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "payload",
      expectedItemsPerFile = 4096, fpp = 0.01)
    val vs = Seq("doc_7", "doc_19999", "doc_never_existed")
    assert(result(t, "payload", vs) == oracle(t, "payload", vs))
    assert(result(t, "payload", vs).size == 2)
    // a fully-absent key set: every file bloom-pruned, empty frame
    // with the table's schema
    val none = SnapshotLog.readWhereIn(spark, t, "payload", Seq("nope"))
    assert(none.columns.toSeq == Seq("key", "grp", "payload"))
    assert(none.count() == 0)
    val (kept, _) = SnapshotLog.bloomPruneFiles(spark, t, "payload", Seq("nope"))
    assert(kept.size <= 1, s"absent key should prune ~all files, kept ${kept.size}")
  }

  test("appended files are uncovered-but-kept until refresh; refresh blooms exactly the missing ones") {
    val t = s"$scratch/bloom_grow"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    // day-2 append under a DISJOINT key range, same unclustered layout
    val extra = spark.range(20000, 24000).repartitionByRange(4, col("id"))
      .select(
        (lit(20000) + (col("id") - 20000) * 7919 % 4000).as("key"),
        (col("id") % 8).as("grp"),
        concat(lit("doc_"), col("id").cast("string")).as("payload"))
    SnapshotLog.commitAppend(spark, t, extra)
    val newKeys = Seq(21000L, 23999L)
    // the 4 appended files are uncovered → conservatively kept; the 8
    // indexed files bloom out (stats can't help: disjoint range DOES
    // prune here via min/max... so use keys that defeat stats too)
    assert(result(t, "key", newKeys) == oracle(t, "key", newKeys))
    assert(oracle(t, "key", newKeys).size == 2)
    // refresh covers exactly the 4 missing files, idempotently
    assert(SnapshotLog.refreshBloomIndex(spark, t, "key") == 4)
    assert(SnapshotLog.refreshBloomIndex(spark, t, "key") == 0)
    val mixed = Seq(17L, 21000L) // one old-generation key, one new
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", mixed)
    assert(total == 12 && kept.size <= 4,
      s"post-refresh lookup should prune both generations, kept ${kept.size}/$total")
    assert(result(t, "key", mixed) == oracle(t, "key", mixed))
  }

  test("a COW delete's rewritten files are uncovered-but-kept; stale index rows are ignored") {
    val t = s"$scratch/bloom_cow"
    val committed = unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    SnapshotLog.deleteWhere(spark, t, "key", Some(100L), Some(200L))
    val vs = Seq(150L, 5000L) // one deleted, one surviving
    assert(result(t, "key", vs) == oracle(t, "key", vs))
    assert(!oracle(t, "key", vs).exists(_.contains("150,")),
      "deleted key must not resurface")
    // time travel to the pre-delete version still finds the deleted key
    val v0 = Some(committed)
    assert(result(t, "key", vs, v0) == oracle(t, "key", vs, v0))
    assert(oracle(t, "key", vs, v0).size == 2)
  }

  test("the index is keyed on the physical name: a rename keeps it pruning") {
    val t = s"$scratch/bloom_rename"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    SnapshotLog.renameColumn(t, "key", "doc_key")
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "doc_key", Seq(17L))
    assert(total == 8 && kept.size <= 2,
      s"renamed column should keep pruning through the colmap, kept ${kept.size}")
    assert(result(t, "doc_key", Seq(17L)) == oracle(t, "doc_key", Seq(17L)))
  }

  test("int-width hash replay: an INT column probed with Long keys casts before hashing") {
    val t = s"$scratch/bloom_int"
    val df = spark.range(5000).repartitionByRange(4, col("id")).select(
      ((col("id") * 7919) % 5000).cast("int").as("key"),
      (col("id") % 4).as("grp"))
    SnapshotLog.commit(spark, t, df)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    // Long-typed lookup values against the INT column: the replay must
    // hash 4 bytes (post-cast), or every lookup would bloom out
    val vs = Seq(17L, 4242L)
    assert(result(t, "key", vs) == oracle(t, "key", vs))
    assert(oracle(t, "key", vs).size == 2)
    val (kept, _) = SnapshotLog.bloomPruneFiles(spark, t, "key", vs)
    assert(kept.size <= 3)
  }

  test("guardrails: null keys, empty key list, unsupported column types, missing index refresh") {
    val t = s"$scratch/bloom_guard"
    val df = spark.range(100).select(col("id").as("key"),
      (col("id") * 1.5).as("score"))
    SnapshotLog.commit(spark, t, df)
    intercept[IllegalArgumentException] {
      SnapshotLog.readWhereIn(spark, t, "key", Seq(1L, null))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.readWhereIn(spark, t, "key", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.writeBloomIndex(spark, t, "score") // double: rejected
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.refreshBloomIndex(spark, t, "key") // never built
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.writeBloomIndex(spark, t, "key", fpp = 1.5)
    }
  }

  test("no index and no-stats shapes degrade to exact unpruned lookups") {
    val t = s"$scratch/bloom_degrade"
    unclustered(t)
    // no bloom index at all: readWhereIn is still exact
    val vs = Seq(17L, 4242L)
    assert(result(t, "key", vs) == oracle(t, "key", vs))
    // index present but the meta/data written for ANOTHER column
    SnapshotLog.writeBloomIndex(spark, t, "payload",
      expectedItemsPerFile = 4096, fpp = 0.01)
    assert(result(t, "key", vs) == oracle(t, "key", vs))
  }

  test("deleteWhereIn rewrites only the bloom-kept files; keys gone, everything else intact") {
    val t = s"$scratch/bloom_delete"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    val before = SnapshotLog.read(spark, t).collect().map(_.toString).toSet
    val keys = Seq(17L, 4242L)
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)
    assert(total == 8 && kept.size <= 3)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def files(v: Long): Set[String] = {
      val node = mapper.readTree(Files.readString(
        Paths.get(t, "_log", s"$v.json")))
      val it = node.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    val v1 = SnapshotLog.deleteWhereIn(spark, t, "key", keys)
    // exonerated files carried BY NAME — only the bloom-kept rewritten
    assert(files(v1 - 1).intersect(files(v1)).size == 8 - kept.size)
    val after = SnapshotLog.read(spark, t).collect().map(_.toString).toSet
    assert(after == before.filterNot(r =>
      r.startsWith("[17,") || r.startsWith("[4242,")))
    assert(after.size == before.size - 2)
    // absent keys: nothing to rewrite, every file carried verbatim
    val v2 = SnapshotLog.deleteWhereIn(spark, t, "key", Seq(-5L))
    assert(files(v2) == files(v1))
    assert(SnapshotLog.read(spark, t).count() == after.size)
  }

  test("updateWhereIn masks exactly the named keys in the bloom-kept files") {
    val t = s"$scratch/bloom_update"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    val before = SnapshotLog.read(spark, t).collect().map(_.toString).toSet
    val keys = Seq(17L, 4242L)
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)
    assert(total == 8 && kept.size <= 3)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def files(v: Long): Set[String] = {
      val node = mapper.readTree(Files.readString(
        Paths.get(t, "_log", s"$v.json")))
      val it = node.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    val v1 = SnapshotLog.updateWhereIn(spark, t, "key", keys,
      Map("payload" -> lit("REDACTED")))
    assert(files(v1 - 1).intersect(files(v1)).size == 8 - kept.size,
      "only the bloom-kept files may be rewritten")
    val after = SnapshotLog.read(spark, t).collect()
    assert(after.length == before.size, "update must not change row count")
    val masked = after.filter(r => keys.contains(r.getLong(0)))
    assert(masked.length == 2 && masked.forall(_.getString(2) == "REDACTED"))
    val untouchedRows = after.filterNot(r => keys.contains(r.getLong(0)))
      .map(_.toString).toSet
    assert(untouchedRows == before.filterNot(r =>
      r.startsWith("[17,") || r.startsWith("[4242,")))
    // schema-altering or unknown assignments reject loudly
    intercept[IllegalArgumentException] {
      SnapshotLog.updateWhereIn(spark, t, "key", keys,
        Map("nope" -> lit(1)))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.updateWhereIn(spark, t, "key", keys,
        Map("payload" -> lit(42))) // string column, int assignment
    }
  }

  test("point and range deletes never drop NULL rows from a mixed rewritten file") {
    val t = s"$scratch/bloom_delete_null"
    // every file mixes null v with live values — the shape where a bare
    // three-valued NOT would silently delete the nulls
    SnapshotLog.commit(spark, t, spark.range(400)
      .repartitionByRange(4, col("id"))
      .select(col("id").as("key"),
        when(col("id") % 5 =!= 0, col("id")).as("v")))
    val nulls = SnapshotLog.read(spark, t).filter(col("v").isNull).count()
    assert(nulls == 80)
    SnapshotLog.deleteWhereIn(spark, t, "v", Seq(7L, 13L, 201L))
    assert(SnapshotLog.read(spark, t).filter(col("v").isNull).count() == nulls)
    assert(SnapshotLog.read(spark, t).count() == 400 - 3)
    SnapshotLog.deleteWhere(spark, t, "v", Some(100L), Some(150L))
    assert(SnapshotLog.read(spark, t).filter(col("v").isNull).count() == nulls,
      "deleteWhere must not delete NULL rows when rewriting a mixed file")
    // in [100,150]: multiples of 5 are null → survive; 41 ids minus 11
    // nulls = 40 non-null... (100..150 has 51 ids, 11 of them %5==0)
    assert(SnapshotLog.read(spark, t).count() == 400 - 3 - (51 - 11))
  }

  test("streaming ingest maintains the index: idempotent append + refresh per micro-batch") {
    // the day-2 STREAMING recipe: foreachBatch { commitAppendIdempotent;
    // refreshBloomIndex }. The refresh is manifest-driven, so the
    // composition is naturally exactly-once-safe: a replayed batch's
    // append is a no-op (same manifest) → refresh finds nothing
    // missing; a crash BETWEEN append and refresh self-heals on replay
    // (the no-op append leaves the new files uncovered, the refresh
    // blooms exactly them) — and an uncovered window is never wrong,
    // only unpruned.
    val src = s"$scratch/bloom_stream_src"
    val dst = s"$scratch/bloom_stream_dst"
    def gen(from: Long, until: Long) =
      spark.range(from, until).repartitionByRange(2, col("id")).select(
        ((col("id") * 7919) % 100000).as("key"), col("id").as("n"))
    SnapshotLog.commit(spark, src, gen(0, 1000))
    // seed the replica from a DISJOINT id range (keys never collide:
    // the scramble is a bijection mod 100000 and the id ranges differ)
    SnapshotLog.commit(spark, dst, gen(50000, 51000))
    SnapshotLog.writeBloomIndex(spark, dst, "key",
      expectedItemsPerFile = 2048, fpp = 0.01)
    // the sink's version key: base + batchId (the documented derivation
    // — the replica already holds its seed version, so batch 0 must
    // land ABOVE it, not collide with it and no-op as a "replay")
    val base = SnapshotLog.latestVersion(dst).get + 1
    val q = spark.readStream.format("graft-snaplog")
      .option("tableDir", src).load()
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          SnapshotLog.commitAppendIdempotent(spark, dst, batch, base + id)
          SnapshotLog.refreshBloomIndex(spark, dst, "key"): Unit
      }.start()
    try {
      q.processAllAvailable()
      SnapshotLog.commitAppend(spark, src, gen(1000, 2000))
      SnapshotLog.commitAppend(spark, src, gen(2000, 3000))
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotLog.read(spark, dst).count() == 4000)
    // every generation is covered: nothing left to refresh, and a
    // cross-generation lookup prunes through the blooms
    assert(SnapshotLog.refreshBloomIndex(spark, dst, "key") == 0)
    val keys = Seq(0L, 1000L, 2000L).map(id =>
      java.lang.Math.floorMod(id * 7919, 100000)): Seq[Any]
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, dst, "key", keys)
    assert(total >= 6 && kept.size <= keys.size + 2,
      s"cross-generation lookup should prune, kept ${kept.size}/$total")
    assert(SnapshotLog.readWhereIn(spark, dst, "key", keys).count() == 3)
  }

  test("default sizing is footer-derived: meta records ~the largest file's row count") {
    val t = s"$scratch/bloom_autosize"
    unclustered(t) // 20000 rows over 8 even files -> ~2500 rows each
    SnapshotLog.writeBloomIndex(spark, t, "key") // no explicit sizing
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(
        Paths.get(t, "_index", "bloom", "key", "meta.json")))
    val items = meta.get("expectedItemsPerFile").asLong()
    assert(items >= 2500 && items <= 2500 * 2,
      s"auto-sizing should track the largest file's rows, got $items")
    assert(result(t, "key", Seq(17L)) == oracle(t, "key", Seq(17L)))
  }

  test("the index sidecar layout is inspectable: meta records sizing + the current data dir") {
    val t = s"$scratch/bloom_layout"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    val dir = Paths.get(t, "_index", "bloom", "key")
    assert(Files.exists(dir.resolve("meta.json")))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(dir.resolve("meta.json")))
    assert(meta.get("column").asText() == "key")
    assert(meta.get("expectedItemsPerFile").asLong() == 4096)
    assert(meta.get("numBits").asLong() > 0)
    val dataName = meta.get("data").asText()
    assert(dataName.startsWith("data-"))
    val rows = spark.read.parquet(dir.resolve(dataName).toString)
    assert(rows.count() == 8)
    assert(rows.columns.toSeq == Seq("file", "bloom"))
  }

  test("compactBloomIndex drops exactly the stale rows; lookups stay exact; idempotent") {
    val t = s"$scratch/bloom_compact"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    // churn: a point delete rewrites some files, refresh covers the
    // rewrites — leaving the rewritten-away originals as stale rows
    SnapshotLog.deleteWhereIn(spark, t, "key", Seq(17L, 4242L))
    val refreshed = SnapshotLog.refreshBloomIndex(spark, t, "key")
    assert(refreshed > 0)
    val dir = Paths.get(t, "_index", "bloom", "key")
    def indexRows(): Long = {
      val meta = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(dir.resolve("meta.json")))
      spark.read.parquet(dir.resolve(meta.get("data").asText()).toString).count()
    }
    val beforeRows = indexRows()
    val dropped = SnapshotLog.compactBloomIndex(spark, t, "key")
    assert(dropped > 0 && indexRows() == beforeRows - dropped)
    // post-compaction the index covers exactly the manifest: nothing
    // stale, nothing missing, and only ONE data generation on disk
    assert(SnapshotLog.compactBloomIndex(spark, t, "key") == 0L)
    assert(SnapshotLog.refreshBloomIndex(spark, t, "key") == 0)
    import scala.jdk.CollectionConverters._
    val dataDirs = scala.util.Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("data")).toList
    }
    assert(dataDirs.size == 1, s"superseded data dirs must be dropped: $dataDirs")
    val keys = Seq(19993L, 5000L)
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)
    assert(kept.size <= 3 && total >= 8)
    assert(result(t, "key", keys) == oracle(t, "key", keys))
    assert(oracle(t, "key", keys).size == 2)
  }

  test("optimize auto-maintains indexes: a full rewrite stays pruned with zero manual calls") {
    val t = s"$scratch/bloom_optimize"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 8192, fpp = 0.01)
    // the clustered rewrite replaces EVERY file; default maintenance
    // refreshes + compacts, so the next lookup prunes with no manual
    // refresh — and the index holds exactly the new generation
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = 2500,
      clusterBy = Seq("grp"))
    assert(SnapshotLog.refreshBloomIndex(spark, t, "key") == 0,
      "maintenance must have covered the rewritten files")
    assert(SnapshotLog.compactBloomIndex(spark, t, "key") == 0L,
      "maintenance must have dropped the stale generation")
    val keys = Seq(17L, 4242L)
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", keys)
    assert(kept.size < total, s"post-optimize lookup must prune, kept ${kept.size}/$total")
    assert(result(t, "key", keys) == oracle(t, "key", keys))
    assert(oracle(t, "key", keys).size == 2)
  }

  test("maintenance deletes an index orphaned by a column drop") {
    val t = s"$scratch/bloom_orphan"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "payload",
      expectedItemsPerFile = 8192, fpp = 0.01)
    SnapshotLog.dropColumn(t, "payload")
    val report = SnapshotLog.maintainBloomIndexes(spark, t)
    assert(!report.contains("payload"))
    assert(!Files.isDirectory(
      Paths.get(t, "_index", "bloom", "payload")),
      "an index on a dropped column is garbage and must be removed")
  }

  test("the erasure theorem: point delete forgets only after expire + vacuum, then the bytes are gone") {
    // GDPR right-to-be-forgotten is NOT deleteWhereIn alone: the COW
    // rewrite removes the row from the LATEST version while every
    // older manifest still references the original file — time travel
    // keeps serving the subject until the history is renounced. True
    // erasure = point delete + expireVersions + vacuum, and this pins
    // the full chain INCLUDING that the erased payload's bytes are
    // physically unreadable from every surviving data file.
    val t = s"$scratch/bloom_erasure"
    val v0 = unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    val subject = 4242L
    val payload = SnapshotLog.readWhereIn(spark, t, "key", Seq(subject))
      .head().getString(2)
    SnapshotLog.deleteWhereIn(spark, t, "key", Seq(subject))
    // deleted from latest — but HISTORY still serves the subject
    assert(SnapshotLog.readWhereIn(spark, t, "key", Seq(subject)).count() == 0)
    assert(SnapshotLog.readWhereIn(spark, t, "key", Seq(subject),
      asOf = Some(v0)).count() == 1,
      "time travel must still serve the subject before history expiry")
    // renounce history, reclaim, and re-point the index at the survivors
    val expired = SnapshotLog.expireVersions(t, keepLast = 1)
    assert(expired.nonEmpty)
    val reclaimed = SnapshotLog.vacuum(t, minAgeMillis = 0L)
    assert(reclaimed.nonEmpty, "the rewritten-away original must be reclaimed")
    SnapshotLog.maintainBloomIndexes(spark, t)
    intercept[Exception] { // expired version: loud, not silently empty
      SnapshotLog.read(spark, t, asOf = Some(v0)).count()
    }
    // the payload string is in no surviving data file — scan the BYTES
    // of everything left under the table dir, not just the manifest
    import scala.jdk.CollectionConverters._
    val survivors = scala.util.Using.resource(
      Files.walk(Paths.get(t))) { st =>
      st.iterator().asScala.filter(p =>
        p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toList
    }
    assert(survivors.nonEmpty)
    val needle = payload.getBytes("UTF-8")
    def contains(hay: Array[Byte]): Boolean =
      hay.indices.exists(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    survivors.foreach { f =>
      assert(!contains(Files.readAllBytes(f)),
        s"erased payload bytes survive in $f")
    }
    // and the table is otherwise intact
    assert(SnapshotLog.read(spark, t).count() == 19999)
  }

  test("a small merge feed rides the bloom screen: exact result, minimal rewrite") {
    // the point-merge shape: 3 keyed changes against the unclustered
    // table. The bloom screen (stage 1.5) exonerates candidates before
    // the probe scan OPENS them — an I/O saving the result cannot show,
    // so this pins what it must preserve: the probe stays exact (only
    // the keys' files rewrite; everything else carries by name) and
    // the merged content is right through the screened path.
    val t = s"$scratch/bloom_merge"
    unclustered(t)
    SnapshotLog.writeBloomIndex(spark, t, "key",
      expectedItemsPerFile = 4096, fpp = 0.01)
    val before = SnapshotLog.read(spark, t).collect().map(_.toString).toSet
    import spark.implicits._
    val feed = Seq(
      (17L, 9L, "patched", "update"),
      (4242L, 0L, null.asInstanceOf[String], "delete"),
      (90000L, 1L, "fresh", "insert"))
      .toDF("key", "grp", "payload", "op")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def files(v: Long): Set[String] = {
      val node = mapper.readTree(Files.readString(
        Paths.get(t, "_log", s"$v.json")))
      val it = node.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    val v1 = SnapshotLog.mergeInto(spark, t, feed, "key")
    // 17 and 4242 live in <= 2 files; only those leave the manifest
    assert(files(v1 - 1).intersect(files(v1)).size >= 6,
      "the probe must carry every file the feed does not touch")
    val after = SnapshotLog.read(spark, t).collect().map(_.toString).toSet
    assert(after.contains("[17,9,patched]"), "update must land")
    assert(after.exists(_.startsWith("[90000,")), "insert must land")
    assert(!after.exists(_.startsWith("[4242,")), "delete must land")
    assert((before -- after).count(r =>
      !r.startsWith("[17,") && !r.startsWith("[4242,")) == 0,
      "untouched rows must survive the screened merge verbatim")
    assert(after.size == before.size) // -1 delete +1 insert
  }
}
