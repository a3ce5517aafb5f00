package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** [[SnapshotLog.mergeInto]] — MERGE through the log on the post-image
  * change-feed convention. Pins, in order: the apply theorem (merge of
  * a tableDiff feed lands the diffed-to content, atomically), both
  * pruning stages observable as carried-verbatim files (stats interval
  * alone; find-touched exoneration inside the interval), the
  * upsert/absent-delete edges, every loud precondition, the colmap and
  * time-travel compositions, and that the rewritten files' fresh stats
  * keep [[SnapshotLog.readWhere]] pruning afterwards. */
class SnapshotMergeSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"$scratch/$name"
    new java.io.File(d).mkdirs()
    d
  }

  private def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** 8 exact-range files: range i holds keys [i*100, i*100+99], one
    * file each (appends are single-file), so pruning assertions can
    * name precisely which files a feed may touch. */
  private def rangedTable(name: String): (String, Map[Int, String]) = {
    val t = freshDir(name)
    (0 until 8).foreach { i =>
      val df = ((i * 100) until (i * 100 + 100)).map(k => (k.toLong, s"p$k", i))
        .toDF("key", "payload", "range").repartition(1)
      if (i == 0) SnapshotLog.commit(spark, t, df)
      else SnapshotLog.commitAppend(spark, t, df)
    }
    val files = SnapshotLog.read(spark, t).inputFiles.toSeq
    assert(files.size == 8)
    val byRange = (0 until 8).map { i =>
      val f = SnapshotLog.readWhere(spark, t, "key",
        Some(i * 100L), Some(i * 100L + 99L)).inputFiles
      assert(f.length == 1, s"range $i should live in one file")
      i -> base(f.head)
    }.toMap
    (t, byRange)
  }

  private def feed(rows: Seq[(Long, String, String, Integer)]): DataFrame =
    rows.toDF("key", "op", "payload", "range")

  test("apply theorem: merging a tableDiff feed lands exactly applyDiff's content, as one new version") {
    val t = freshDir("merge_theorem")
    val v0 = (0L until 500L).map(k => (k, s"p$k", (k % 7).toInt))
      .toDF("key", "payload", "range")
    SnapshotLog.commit(spark, t, v0.repartition(4))
    // a churn batch: delete k%10==0, update k%10∈{1,2} (payload rewrite,
    // one of them to NULL — post-images can null a column), insert a
    // disjoint range
    val changes = feed(
      (0L until 500L by 10L).map(k => (k, "delete", null: String, null: Integer)) ++
      (1L until 500L by 10L).map(k => (k, "update", s"u$k", Integer.valueOf(9))) ++
      (2L until 500L by 10L).map(k => (k, "update", null: String, Integer.valueOf(9))) ++
      (1000L until 1020L).map(k => (k, "insert", s"n$k", Integer.valueOf(8))))
    val expected = graft.ops.MigrationOps.applyDiff(v0, changes)
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
    val v = SnapshotLog.mergeInto(spark, t, changes, "key")
    assert(v == 1L)
    val got = SnapshotLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
    assert(got == expected)
    assert(got.size == 500 - 50 + 20)
    // the nulled post-image really nulled (non-null -> null transits)
    assert(SnapshotLog.read(spark, t)
      .filter(col("key") === 2L).select("payload").head().isNullAt(0))
    // time travel: v0 intact under the merge
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).count() == 500)
  }

  test("stage-1 stats pruning: a feed confined to one file's key range carries the other 7 verbatim") {
    val (t, byRange) = rangedTable("merge_stats_prune")
    val before = SnapshotLog.read(spark, t).inputFiles.map(base).toSet
    SnapshotLog.mergeInto(spark, t,
      feed(Seq((105L, "delete", null, null), (110L, "update", "u", 1))), "key")
    val after = SnapshotLog.read(spark, t).inputFiles.map(base).toSet
    // ranges 0,2..7 carry byte-identical (same manifest paths); range 1
    // is rewritten (its old file gone, a new one present)
    (0 until 8).filterNot(_ == 1).foreach(i => assert(after.contains(byRange(i))))
    assert(!after.contains(byRange(1)))
    // the rewrite may span a few part files (survivor + post-image
    // partitions) — what matters is that ONLY range 1 re-materialized
    assert((after -- before).nonEmpty && (before -- after) == Set(byRange(1)))
    assert(SnapshotLog.read(spark, t).count() == 799)
  }

  test("stage-2 find-touched: files inside the interval but holding none of the keys are exonerated") {
    val (t, byRange) = rangedTable("merge_touch_prune")
    // keys 5 and 750: the stats interval [5,750] admits ALL 8 files,
    // but only ranges 0 and 7 contain the keys — the key-column scan
    // must exonerate ranges 1..6
    SnapshotLog.mergeInto(spark, t,
      feed(Seq((5L, "update", "u5", 0), (750L, "delete", null, null))), "key")
    val after = SnapshotLog.read(spark, t).inputFiles.map(base).toSet
    (1 until 7).foreach(i => assert(after.contains(byRange(i))))
    assert(!after.contains(byRange(0)) && !after.contains(byRange(7)))
    assert(SnapshotLog.read(spark, t).count() == 799)
    assert(SnapshotLog.read(spark, t).filter(col("key") === 5L)
      .select("payload").head().getString(0) == "u5")
  }

  test("upsert on insert-collision; delete of an absent key is a no-op; pure-insert merge touches nothing") {
    val (t, byRange) = rangedTable("merge_edges")
    // an "insert" whose key exists replaces the row (post-image wins)
    // — this rewrites range 3's file, and ONLY it
    SnapshotLog.mergeInto(spark, t,
      feed(Seq((300L, "insert", "clobbered", 3))), "key")
    assert(SnapshotLog.read(spark, t).filter(col("key") === 300L)
      .select("payload").head().getString(0) == "clobbered")
    assert(SnapshotLog.read(spark, t).count() == 800)
    // deleting keys that don't exist changes nothing but the version
    val v = SnapshotLog.mergeInto(spark, t,
      feed(Seq((5000L, "delete", null, null))), "key")
    assert(v == 9L)
    assert(SnapshotLog.read(spark, t).count() == 800)
    // disjoint-range inserts rewrite NO existing file (stats clear all):
    // every pre-insert file — the 7 original ranges plus the first
    // merge's rewrite of range 3 — carries verbatim
    val preInsert = SnapshotLog.read(spark, t).inputFiles.map(base).toSet
    SnapshotLog.mergeInto(spark, t,
      feed(Seq((9000L, "insert", "n", 9), (9001L, "insert", "n", 9))), "key")
    val after = SnapshotLog.read(spark, t).inputFiles.map(base).toSet
    (0 until 8).filterNot(_ == 3).foreach(i => assert(after.contains(byRange(i))))
    assert(preInsert.subsetOf(after))
    assert(SnapshotLog.read(spark, t).count() == 802)
  }

  test("loud preconditions: duplicate keys, bad op, null key, wrong columns, wrong type, empty feed no-op") {
    val t = freshDir("merge_guards")
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("key", "payload"))
    def tryMerge(df: DataFrame): Unit = {
      intercept[Exception](SnapshotLog.mergeInto(spark, t, df, "key")); ()
    }
    tryMerge(Seq((1L, "update", "x"), (1L, "delete", null))
      .toDF("key", "op", "payload")) // two rows, one key
    tryMerge(Seq((1L, "upsert", "x")).toDF("key", "op", "payload")) // bad op
    tryMerge(Seq((null.asInstanceOf[java.lang.Long], "delete", null))
      .toDF("key", "op", "payload")) // null key
    tryMerge(Seq((1L, "update")).toDF("key", "op")) // missing payload col
    tryMerge(Seq((1L, "update", "x", 1)).toDF("key", "op", "payload", "extra"))
    tryMerge(Seq((1, "update", "x")).toDF("key", "op", "payload")) // int key vs long
    // empty feed: no commit at all
    val v = SnapshotLog.mergeInto(spark, t,
      Seq.empty[(Long, String, String)].toDF("key", "op", "payload"), "key")
    assert(v == 0L)
    assert(SnapshotLog.latestVersion(t).contains(0L))
  }

  test("colmap composition: merge speaks logical names over renamed columns, files stay physical") {
    val t = freshDir("merge_colmap")
    SnapshotLog.commit(spark, t,
      (0L until 100L).map(k => (k, s"p$k")).toDF("key", "src").repartition(2))
    SnapshotLog.renameColumn(t, "src", "source")
    SnapshotLog.mergeInto(spark, t,
      Seq((5L, "update", "u5"), (200L, "insert", "n200"), (6L, "delete", null: String))
        .toDF("key", "op", "source"), "key")
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "source"))
    assert(cur.count() == 100)
    assert(cur.filter(col("key") === 5L).select("source").head().getString(0) == "u5")
    assert(cur.filter(col("key") === 200L).select("source").head().getString(0) == "n200")
    assert(cur.filter(col("key") === 6L).count() == 0)
    // a LATER rename still reads the merge's files: they carry the
    // immutable physical name, not the logical one they merged under
    SnapshotLog.renameColumn(t, "source", "body")
    assert(SnapshotLog.read(spark, t).filter(col("key") === 200L)
      .select("body").head().getString(0) == "n200")
    // the feed must speak the CURRENT logical name, not the physical
    intercept[Exception](SnapshotLog.mergeInto(spark, t,
      Seq((7L, "delete", null: String)).toDF("key", "op", "src"), "key"))
  }

  test("rewritten files get fresh stats: readWhere keeps pruning after a merge") {
    val (t, _) = rangedTable("merge_stats_fresh")
    SnapshotLog.mergeInto(spark, t,
      feed(Seq((105L, "update", "u", 1), (710L, "delete", null, null))), "key")
    // a point ask inside untouched range 3 still reads exactly one
    // file (carried stats); an ask inside REWRITTEN range 1 reads only
    // the rewrite's files (harvested stats — a couple of part files,
    // never the 9-file table)
    assert(SnapshotLog.readWhere(spark, t, "key", Some(300L), Some(310L))
      .inputFiles.length == 1)
    val r1 = SnapshotLog.readWhere(spark, t, "key", Some(100L), Some(199L))
    assert(r1.inputFiles.length <= 2)
    assert(r1.count() == 100)
  }

  test("mergeWhereMOR: full clause algebra vs a first-principles oracle; cardinality refuses") {
    import SnapshotLog.{MergeDelete, MergeInsert, MergeUpdate}
    val t = freshDir("merge_general")
    SnapshotLog.commit(spark, t, spark.range(64)
      .select(col("id").as("k"), (col("id") * 7).as("v"),
        (col("id") % 2 === 0).as("even")).repartition(4))
    val src = spark.range(32, 96)
      .select(col("id").as("sk"), (col("id") * 1000).as("sv"))
    val preFiles = SnapshotLog.read(spark, t).inputFiles.toSet
    val v = SnapshotLog.mergeWhereMOR(spark, t, src,
      col("t.k") === col("s.sk") && col("s.sk") < 90,
      matched = Seq(
        MergeDelete(Some(col("s.sk") % 10 === 0)),
        MergeUpdate(Some(col("t.even")), Map("v" -> col("s.sv")))),
      notMatched = Seq(MergeInsert(Some(col("s.sk") < 80),
        Map("k" -> col("s.sk"), "v" -> (col("s.sk") * -1),
          "even" -> (col("s.sk") % 2 === 0)))),
      notMatchedBySource = Seq(
        MergeUpdate(Some(col("t.k") < 5), Map("v" -> lit(-999L)))))
    assert(v == 1L)
    // first-principles oracle. matched = target k in [32, 63] (ON's
    // extra conjunct sk<90 is vacuous there): k%10==0 deleted (40, 50,
    // 60); else even k updated v=k*1000 (first-clause-wins: 40/50/60
    // are even but the DELETE clause claimed them); odd k unchanged.
    // not-matched source: sk in [64, 95] minus nothing (no target
    // match), insert-guard sk<80 keeps [64, 79] at v=-sk. by-source:
    // target k in [0, 31] (no source row), k<5 updated to -999.
    val expected = (0L until 64L).flatMap { k =>
      if (k >= 32 && k % 10 == 0) None
      else if (k >= 32 && k % 2 == 0) Some((k, k * 1000, true))
      else if (k < 5) Some((k, -999L, k % 2 == 0))
      else Some((k, k * 7, k % 2 == 0))
    } ++ (64L until 80L).map(sk => (sk, -sk, sk % 2 == 0))
    val got = SnapshotLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got.sorted == expected.sorted,
      s"diff: got ${got.toSet -- expected.toSet} vs missing " +
        s"${expected.toSet -- got.toSet}")
    // cost model: no pre-merge file rewritten, masks present
    val postFiles = SnapshotLog.read(spark, t).inputFiles.toSet
    assert(preFiles.subsetOf(postFiles), "general merge rewrote a file")
    assert(SnapshotLog.dvAt(t, v).nonEmpty)
    assert(SnapshotLog.history(t).maxBy(_.version).op == "merge-where-mor")
    // cardinality: two source rows ACTING on one target row refuse
    val dupSrc = spark.range(2).select(lit(6L).as("sk"), col("id").as("sv"))
    val e = intercept[Exception] { SnapshotLog.mergeWhereMOR(spark, t,
      dupSrc, col("t.k") === col("s.sk"),
      matched = Seq(MergeUpdate(None, Map("v" -> col("s.sv")))),
      notMatched = Nil) }
    assert(e.getMessage.contains("multiple source rows"),
      e.getMessage.take(300))
    // ...but two source rows where only ONE acts pass (Delta's rule)
    val dupOneActs = spark.range(2)
      .select(lit(7L).as("sk"), (col("id") * 100).as("sv"))
    SnapshotLog.mergeWhereMOR(spark, t, dupOneActs,
      col("t.k") === col("s.sk"),
      matched = Seq(MergeUpdate(Some(col("s.sv") === 100), Map("v" -> col("s.sv")))),
      notMatched = Nil): Unit
    assert(SnapshotLog.read(spark, t).filter(col("k") === 7L)
      .head.getLong(1) == 100L)
    // non-deterministic and subquery expressions refuse loudly
    val eN = intercept[Exception] { SnapshotLog.mergeWhereMOR(spark, t,
      src, col("t.k") === col("s.sk"),
      matched = Seq(MergeDelete(Some(rand() < 0.5))), notMatched = Nil) }
    assert(eN.getMessage.contains("non-deterministic"), eN.getMessage.take(200))
    // insert leaving columns unassigned NULL-FILLS them (the recorded
    // schema is nullable — parquet read-back widens — so the
    // non-nullable refusal branch stays defensive, not reachable here)
    SnapshotLog.mergeWhereMOR(spark, t,
      spark.range(1).select(lit(500L).as("sk")),
      col("t.k") === col("s.sk"), matched = Nil,
      notMatched = Seq(MergeInsert(None, Map("k" -> col("s.sk"))))): Unit
    val inserted = SnapshotLog.read(spark, t).filter(col("k") === 500L)
      .head
    assert(inserted.isNullAt(1) && inserted.isNullAt(2),
      s"unassigned columns should null-fill: $inserted")
  }

  test("mergeIntoMOR lands the SAME content as the COW merge with ZERO files rewritten") {
    // the apply theorem's MOR twin: one churn feed, both verbs, one
    // expected content — plus the cost-model require()s the COW verb
    // cannot make (every pre-merge file carried; masks, not rewrites)
    val t = freshDir("merge_mor")
    val v0 = (0L until 500L).map(k => (k, s"p$k", (k % 7).toInt))
      .toDF("key", "payload", "range")
    SnapshotLog.commit(spark, t, v0.repartition(4))
    val changes = feed(
      (0L until 500L by 10L).map(k => (k, "delete", null: String, null: Integer)) ++
      (1L until 500L by 10L).map(k => (k, "update", s"u$k", Integer.valueOf(9))) ++
      (1000L until 1020L).map(k => (k, "insert", s"n$k", Integer.valueOf(8))))
    val expected = graft.ops.MigrationOps.applyDiff(v0, changes)
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
    val preFiles = SnapshotLog.pruneFiles(t, "key", None, None)._1
    val v = SnapshotLog.mergeIntoMOR(spark, t, changes, "key")
    assert(v == 1L)
    val got = SnapshotLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
    assert(got == expected)
    // cost model: every v0 file carried; the only new files are the
    // post-images; masks exist
    val postFiles = SnapshotLog.pruneFiles(t, "key", None, None)._1
    assert(preFiles.forall(postFiles.contains),
      "MOR merge rewrote a pre-merge data file")
    assert(postFiles.size > preFiles.size, "no post-image files appended")
    assert(SnapshotLog.dvAt(t, v).nonEmpty)
    // upsert on an existing key + absent-key delete no-op, through MOR
    SnapshotLog.mergeIntoMOR(spark, t, feed(Seq(
      (3L, "insert", "up3", 0), (99999L, "delete", null, null))), "key")
    val after = SnapshotLog.read(spark, t)
    assert(after.filter(col("key") === 3L).count() == 1)
    assert(after.filter(col("key") === 3L)
      .select("payload").head().getString(0) == "up3")
    assert(after.count() == got.size)
    // compaction materializes: same content, no masks
    val cv = SnapshotLog.compactDeletes(spark, t)
    assert(SnapshotLog.dvAt(t, cv).isEmpty)
    assert(SnapshotLog.read(spark, t).count() == got.size)
    // empty feed: no commit
    assert(SnapshotLog.mergeIntoMOR(spark, t,
      feed(Nil), "key") == cv)
  }
}
