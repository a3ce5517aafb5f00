package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Reader guarantees of the atomic snapshot log
  * ([[graft.sources.SnapshotLog]]): versions are readable exactly when
  * committed, time travel resolves the newest version at-or-before the
  * ask, uncommitted data directories are invisible (the torn-write
  * case a plain directory convention cannot exclude), and the merge
  * kernel composes through it.
  */
class SnapshotLogSpec extends SparkSpec {

  test("commit/read round-trips and versions monotonically") {
    import spark.implicits._
    val t = s"$scratch/snap_basic"
    val v0 = SnapshotLog.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("key", "s"))
    val v1 = SnapshotLog.commit(spark, t, Seq((1L, "a2"), (3L, "c")).toDF("key", "s"))
    assert(v0 == 0L && v1 == 1L)
    assert(SnapshotLog.latestVersion(t).contains(1L))
    val latest = SnapshotLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest == Map(1L -> "a2", 3L -> "c"))
    // time travel
    val old = SnapshotLog.read(spark, t, asOf = Some(0L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a", 2L -> "b"))
  }

  test("uncommitted data is invisible: data files without a manifest do not exist") {
    import spark.implicits._
    val t = s"$scratch/snap_torn"
    SnapshotLog.commit(spark, t, Seq((1L, 10L)).toDF("key", "p"))
    // simulate a crashed writer: v1 data fully written, manifest never moved
    Seq((1L, 99L), (2L, 98L)).toDF("key", "p")
      .write.parquet(s"$t/data/v1")
    assert(SnapshotLog.latestVersion(t).contains(0L))
    val rows = SnapshotLog.read(spark, t).collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 10L)
  }

  test("publishing an already-taken version fails instead of silently overwriting") {
    import spark.implicits._
    val t = s"$scratch/snap_dup"
    SnapshotLog.commit(spark, t, Seq((1L, 1L)).toDF("key", "p"))
    // the losing side of the race: a writer that read latest=-1 and now
    // tries to publish version 0, which the first commit already owns
    intercept[java.nio.file.FileAlreadyExistsException] {
      SnapshotLog.publish(t, 0L, Seq("/nonexistent.parquet"))
    }
    // the winner's manifest is untouched
    assert(SnapshotLog.read(spark, t).count() == 1)
  }

  test("vacuum reclaims orphaned data dirs, never committed or young ones") {
    import spark.implicits._
    val t = s"$scratch/snap_vac"
    SnapshotLog.commit(spark, t, Seq((1L, 10L)).toDF("key", "p"))
    SnapshotLog.commit(spark, t, Seq((1L, 11L)).toDF("key", "p"))
    // a crashed/losing writer's orphan: data written, never published
    Seq((9L, 99L)).toDF("key", "p").write.parquet(s"$t/data/v1-deadbeef")
    // young-orphan guard: with a 1h age floor nothing qualifies yet
    assert(SnapshotLog.vacuum(t).isEmpty)
    val deleted = SnapshotLog.vacuum(t, minAgeMillis = 0L)
    assert(deleted.size == 1 && deleted.head.endsWith("v1-deadbeef"))
    // every committed version still reads intact after the vacuum
    assert(SnapshotLog.read(spark, t).collect().head.getLong(1) == 11L)
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).collect().head.getLong(1) == 10L)
    // idempotent
    assert(SnapshotLog.vacuum(t, minAgeMillis = 0L).isEmpty)
  }

  test("commitWithRetry: conflicting writers serialize, neither update is lost") {
    import spark.implicits._
    val t = s"$scratch/snap_retry"
    SnapshotLog.commit(spark, t, Seq((1L, 0L)).toDF("key", "n"))
    // writer A increments key 1; a rival commit is injected between A's
    // base read and A's publish on the FIRST attempt only — the classic
    // OCC interleaving. A must conflict (it publishes baseV+1 exactly),
    // then replay against the rival's result.
    var rivalDone = false
    val v = SnapshotLog.commitWithRetry(spark, t, { base =>
      val b = base.get
      if (!rivalDone) {
        rivalDone = true
        SnapshotLog.commit(spark, t, Seq((2L, 100L)).toDF("key", "n"))
      }
      b.withColumn("n", col("n") + lit(1L))
    })
    assert(v == 2L, "first attempt must lose to the rival and replay")
    val fin = SnapshotLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the replay recomputed against the rival's snapshot: rival's write
    // survives with the increment applied on top
    assert(fin == Map(2L -> 101L))
  }

  test("commitWithRetry gives up after maxAttempts under a persistent conflict") {
    import spark.implicits._
    val t = s"$scratch/snap_retry_cap"
    SnapshotLog.commit(spark, t, Seq((1L, 0L)).toDF("key", "n"))
    var attempts = 0
    intercept[java.nio.file.FileAlreadyExistsException] {
      SnapshotLog.commitWithRetry(spark, t, { base =>
        attempts += 1
        SnapshotLog.commit(spark, t, Seq((3L, 3L)).toDF("key", "n")) // always rivals
        base.get
      }, maxAttempts = 3)
    }
    assert(attempts == 3)
  }

  test("diff between committed versions is the churn-sized change feed") {
    import spark.implicits._
    val t = s"$scratch/snap_diff"
    SnapshotLog.commit(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("key", "p"))
    SnapshotLog.commit(spark, t,
      Seq((1L, 10L), (2L, 21L), (4L, 40L)).toDF("key", "p"))
    val feed = SnapshotLog.diff(spark, t, 0L, 1L).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    // key 1 unchanged → absent; 2 updated; 3 deleted; 4 inserted
    assert(feed == Set(
      (2L, "update", Some(21L)),
      (3L, "delete", None),
      (4L, "insert", Some(40L))), feed.toString)
    // applying the feed to v0 reconstructs v1 (the roundtrip theorem
    // through the log's read path)
    val rebuilt = graft.ops.MigrationOps.applyDiff(
      SnapshotLog.read(spark, t, asOf = Some(0L)),
      SnapshotLog.diff(spark, t, 0L, 1L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rebuilt == Map(1L -> 10L, 2L -> 21L, 4L -> 40L))
  }

  test("the merge kernel composes: CDC batches maintained through the log") {
    import spark.implicits._
    val t = s"$scratch/snap_cdc"
    SnapshotLog.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("key", "s_price"))
    val batch = Seq((1L, "update", Some(11L)), (3L, "insert", Some(30L)))
      .toDF("key", "op", "c_price")
    val merged = graft.ops.MigrationOps
      .mergeBatch(SnapshotLog.read(spark, t), batch, Seq("price"))
      .withColumnRenamed("price", "s_price")
    val v = SnapshotLog.commit(spark, t, merged)
    assert(v == 1L)
    val fin = SnapshotLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin == Map(1L -> 11L, 2L -> 20L, 3L -> 30L))
    // both history points remain readable
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).count() == 2)
  }

  test("the checkpoint hint is never load-bearing: absent, stale, or bogus, latest stays right") {
    import spark.implicits._
    val t = s"$scratch/snap_ckpt"
    (0 until 12).foreach(i =>
      SnapshotLog.commit(spark, t, Seq((1L, i.toLong)).toDF("key", "p")))
    val ckpt = Paths.get(t, "_log", "_last_checkpoint")
    // the hint tracks the publishes and names a committed version
    assert(Files.exists(ckpt), "publish must leave a checkpoint hint")
    val hinted = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(ckpt)).get("version").asLong()
    assert(hinted == 11L, s"hint should track latest, got $hinted")
    assert(SnapshotLog.latestVersion(t).contains(11L))
    // STALE hint (a regressed last-write-wins value): probe walks up
    Files.writeString(ckpt, """{"version":3}""")
    assert(SnapshotLog.latestVersion(t).contains(11L))
    // BOGUS hint (names a version with no manifest): listing fallback
    Files.writeString(ckpt, """{"version":999}""")
    assert(SnapshotLog.latestVersion(t).contains(11L))
    // UNPARSEABLE hint: listing fallback
    Files.writeString(ckpt, "not json")
    assert(SnapshotLog.latestVersion(t).contains(11L))
    // ABSENT hint: listing fallback, and the next commit restores it
    Files.delete(ckpt)
    assert(SnapshotLog.latestVersion(t).contains(11L))
    SnapshotLog.commit(spark, t, Seq((1L, 99L)).toDF("key", "p"))
    assert(Files.exists(ckpt) && SnapshotLog.latestVersion(t).contains(12L))
  }

  test("commitAppend grows the table without rewriting: shared files, additive reads, intact history") {
    import spark.implicits._
    val t = s"$scratch/snap_append"
    SnapshotLog.commit(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("key", "p"))
    val v1 = SnapshotLog.commitAppend(spark, t, Seq((3L, 30L)).toDF("key", "p"))
    assert(v1 == 1L)
    // additive: v1 = v0 rows + batch rows; v0 untouched by time travel
    assert(SnapshotLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).count() == 2)
    // structurally an append: v1's manifest is a strict superset of
    // v0's file list (nothing rewritten, nothing dropped)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def files(v: Long): Set[String] = {
      val it = m.readTree(Files.readString(Paths.get(t, "_log", s"$v.json")))
        .get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    assert(files(0L).subsetOf(files(1L)) && files(1L).size > files(0L).size)
    // vacuum must not reclaim the shared files after the append
    assert(SnapshotLog.vacuum(t, minAgeMillis = 0L).isEmpty)
    assert(SnapshotLog.read(spark, t).count() == 3)
  }

  test("commitAppend enforces the recorded schema: a drifted batch fails loudly, table unchanged") {
    import spark.implicits._
    val t = s"$scratch/snap_append_schema"
    SnapshotLog.commit(spark, t, Seq((1L, 10L)).toDF("key", "p"))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.commitAppend(spark, t,
        Seq((2L, "not a long")).toDF("key", "p"))
    }
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    assert(SnapshotLog.latestVersion(t).contains(0L))
    assert(SnapshotLog.read(spark, t).count() == 1)
    // the failed batch's orphan is exactly what vacuum reclaims
    assert(SnapshotLog.vacuum(t, minAgeMillis = 0L).size == 1)
  }

  test("optimize compacts an append-grown table and repairs pruning, history intact") {
    val t = s"$scratch/snap_optimize"
    import org.apache.spark.sql.functions._
    // seed + 5 appends, EACH round-robin across 2 files so every file
    // spans the whole key domain — the shape a micro-batch writer
    // leaves behind: every file overlaps every range ask
    SnapshotLog.commit(spark, t, spark.range(0, 1200, 6)
      .select(col("id").as("key")).repartition(2))
    (1 to 5).foreach { i =>
      SnapshotLog.commitAppend(spark, t, spark.range(i.toLong, 1200, 6)
        .select(col("id").as("key")).repartition(2))
    }
    val before = SnapshotLog.read(spark, t).collect().map(_.getLong(0)).sorted
    assert(before.length == 1200)
    // degraded skipping: a narrow ask keeps every one of the 12 files
    val (keptBefore, totalBefore) = SnapshotLog.pruneFiles(t, "key", Some(0L), Some(99L))
    assert(totalBefore == 12 && keptBefore.size == 12,
      s"append-grown table should not prune: ${keptBefore.size}/$totalBefore")
    val v = SnapshotLog.optimize(spark, t, targetRecordsPerFile = 300L,
      clusterBy = Seq("key"))
    assert(v == 6L)
    // content identical, file count right-sized, pruning repaired
    val after = SnapshotLog.read(spark, t).collect().map(_.getLong(0)).sorted
    assert(after.sameElements(before))
    val (keptAfter, totalAfter) = SnapshotLog.pruneFiles(t, "key", Some(0L), Some(99L))
    assert(totalAfter == 4 && keptAfter.size == 1,
      s"clustered compaction must restore skipping: ${keptAfter.size}/$totalAfter")
    // history: the pre-optimize version still reads its 12 small files
    assert(SnapshotLog.read(spark, t, asOf = Some(5L)).count() == 1200)
    assert(SnapshotLog.vacuum(t, minAgeMillis = 0L).isEmpty,
      "every pre-optimize file is still referenced by older manifests")
  }

  test("expireVersions renounces old history so vacuum can finally reclaim it") {
    import spark.implicits._
    val t = s"$scratch/snap_expire"
    // five full-rewrite versions: each pins its own data directory
    (0 until 5).foreach(i =>
      SnapshotLog.commit(spark, t, Seq((1L, i.toLong)).toDF("key", "p")))
    // nothing reclaimable while every manifest survives
    assert(SnapshotLog.vacuum(t, minAgeMillis = 0L).isEmpty)
    val expired = SnapshotLog.expireVersions(t, keepLast = 2)
    assert(expired == Seq(0L, 1L, 2L))
    // surviving history reads; expired asOf fails loudly, never
    // silently from a different snapshot
    assert(SnapshotLog.read(spark, t).collect().head.getLong(1) == 4L)
    assert(SnapshotLog.read(spark, t, asOf = Some(3L)).collect().head.getLong(1) == 3L)
    val e = intercept[RuntimeException] {
      SnapshotLog.read(spark, t, asOf = Some(2L))
    }
    assert(e.getMessage.contains("no version"), e.getMessage)
    // the expired versions' data is now unreferenced — vacuum takes it
    assert(SnapshotLog.vacuum(t, minAgeMillis = 0L).size == 3)
    // the log keeps working: next commit lands at latest+1
    assert(SnapshotLog.commit(spark, t, Seq((1L, 9L)).toDF("key", "p")) == 5L)
    assert(SnapshotLog.expireVersions(t, keepLast = 10).isEmpty)
  }

  test("commitIdempotent rejects gap-creating versions, keeping the log dense") {
    import spark.implicits._
    val t = s"$scratch/snap_dense"
    SnapshotLog.commit(spark, t, Seq((1L, 1L)).toDF("key", "p")) // v0
    // replay of an existing version: no-op, false
    assert(!SnapshotLog.commitIdempotent(spark, t, Seq((1L, 2L)).toDF("key", "p"), 0L))
    // the next dense version publishes
    assert(SnapshotLog.commitIdempotent(spark, t, Seq((1L, 3L)).toDF("key", "p"), 1L))
    // a hole (v3 when latest is 1) fails loudly — both the checkpoint
    // probe and time travel's dense scan rely on density
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.commitIdempotent(spark, t, Seq((1L, 4L)).toDF("key", "p"), 3L)
    }
    assert(e.getMessage.contains("gap"), e.getMessage)
    assert(SnapshotLog.latestVersion(t).contains(1L))
  }

  test("idempotent sinks refuse a replay below the retention horizon") {
    import spark.implicits._
    val t = s"$scratch/snap_retention_replay"
    (0 until 5).foreach(i =>
      SnapshotLog.commit(spark, t, Seq((1L, i.toLong)).toDF("key", "p")))
    assert(SnapshotLog.expireVersions(t, keepLast = 2) == Seq(0L, 1L, 2L))
    // an expired version fails the Files.exists pre-check, so without
    // the horizon guard a replayed batch would REPUBLISH the expired
    // slot (commitIdempotent — time travel then answers wrong data)
    // or re-append its stale rows as a new version
    // (commitAppendIdempotent — duplicate rows, exactly-once broken)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.commitIdempotent(spark, t, Seq((1L, 99L)).toDF("key", "p"), 1L)
    }
    assert(e1.getMessage.contains("retention horizon"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.commitAppendIdempotent(spark, t, Seq((2L, 99L)).toDF("key", "p"), 2L)
    }
    assert(e2.getMessage.contains("retention horizon"), e2.getMessage)
    // surviving slots keep their idempotent semantics: an existing
    // version is a declined no-op, the next dense one still publishes
    assert(!SnapshotLog.commitIdempotent(spark, t, Seq((1L, 0L)).toDF("key", "p"), 4L))
    assert(SnapshotLog.commitAppendIdempotent(spark, t, Seq((2L, 5L)).toDF("key", "p"), 5L))
    assert(SnapshotLog.read(spark, t).count() == 2)
  }
}
