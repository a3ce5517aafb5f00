package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Additive schema evolution on the snapshot log (`mergeSchema = true`
  * on the append path) — the last table-format feature the log had
  * declined, now at the same load-bearing minimum:
  *
  *  - a batch ADDING a nullable column evolves the manifest schema
  *    with ZERO rewrites (old files null-fill by parquet's by-name
  *    matching);
  *  - a batch OMITTING a nullable column appends fine (its rows
  *    null-fill the same way);
  *  - time travel is SCHEMA travel — each version reads with its own
  *    manifest's schema;
  *  - the default stays loud (no flag → drifted batch fails), and
  *    type changes fail even WITH the flag;
  *  - stats pruning on a post-evolution column stays exact: files
  *    with no stats entry for the column are kept by construction;
  *  - COW DML (deleteWhere) composes across the file generations;
  *  - the streaming source keeps its pinned schema through a mid-
  *    stream evolution (the narrow projection — new columns need a
  *    stream restart, the Delta decision at this log's minimum).
  */
class SnapshotEvolveSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"$scratch/$name"
    new java.io.File(d).mkdirs()
    d
  }

  test("additive append evolves the schema with zero rewrites; time travel is schema travel") {
    val t = freshDir("evolve_add")
    val v0files = {
      SnapshotLog.commit(spark,
        t, Seq((1L, "a"), (2L, "b")).toDF("key", "payload"))
      SnapshotLog.read(spark, t).inputFiles.toSet
    }
    // evolved batch: adds `score`
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("key", "payload", "score"),
      mergeSchema = true)
    val cur = SnapshotLog.read(spark, t)
    assert(cur.columns.toSeq == Seq("key", "payload", "score"))
    // zero rewrites: every v0 file is carried by name
    assert(v0files.subsetOf(cur.inputFiles.toSet))
    val rows = cur.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(rows == Set(
      (1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5)), (4L, "d", Some(0.7))))
    // time travel to v0 sees the PRE-evolution schema
    val old = SnapshotLog.read(spark, t, asOf = Some(0L))
    assert(old.columns.toSeq == Seq("key", "payload"))
    assert(old.count() == 2)
  }

  test("a batch omitting a nullable column appends and null-fills") {
    val t = freshDir("evolve_omit")
    SnapshotLog.commit(spark,
      t, Seq((1L, "a"), (2L, "b")).toDF("key", "payload"))
    SnapshotLog.commitAppend(spark, t,
      Seq(Tuple1(3L)).toDF("key"), mergeSchema = true)
    val rows = SnapshotLog.read(spark, t).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("a")), (2L, Some("b")), (3L, None)))
  }

  test("the default append stays loud; type changes fail even with mergeSchema") {
    val t = freshDir("evolve_loud")
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("key", "payload"))
    val drifted = Seq((2L, "b", 1.0)).toDF("key", "payload", "score")
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.commitAppend(spark, t, drifted)
    }
    assert(e1.getMessage.contains("mergeSchema"))
    // payload changes string -> long: additive-only rule fires
    val retyped = Seq((2L, 9L)).toDF("key", "payload")
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.commitAppend(spark, t, retyped, mergeSchema = true)
    }
    assert(e2.getMessage.contains("ADDITIVE"))
    // a case-variant of an existing column must refuse at evolve time,
    // not poison the manifest for a later read
    val cased = Seq((3L, "x")).toDF("key", "Payload")
    val e3 = intercept[IllegalArgumentException] {
      SnapshotLog.commitAppend(spark, t, cased, mergeSchema = true)
    }
    assert(e3.getMessage.contains("case"), e3.getMessage)
  }

  test("stats pruning on a post-evolution column keeps every pre-evolution file") {
    val t = freshDir("evolve_stats")
    SnapshotLog.commit(spark,
      t, Seq((1L, "a"), (2L, "b")).toDF("key", "payload").repartition(2))
    // two evolved appends with disjoint score ranges -> prunable files
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, "c", 10.0), (4L, "d", 20.0)).toDF("key", "payload", "score")
        .coalesce(1), mergeSchema = true)
    SnapshotLog.commitAppend(spark, t,
      Seq((5L, "e", 100.0), (6L, "f", 200.0)).toDF("key", "payload", "score")
        .coalesce(1), mergeSchema = true)
    val pruned = SnapshotLog.readWhere(spark, t, "score",
      lower = Some(50.0), upper = None)
    // exactness: pruned read == exact filter over the full read
    val exact = SnapshotLog.read(spark, t).filter(col("score") >= 50.0)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      exact.collect().map(_.getLong(0)).sorted.toSeq)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L))
    // and the scan itself skipped the out-of-range evolved file while
    // KEEPING the stat-less pre-evolution files (conservative contract)
    val full = SnapshotLog.read(spark, t).inputFiles.length
    assert(pruned.inputFiles.length < full,
      s"expected a pruned file list, got $full of $full")
  }

  test("COW delete composes across file generations") {
    val t = freshDir("evolve_cow")
    SnapshotLog.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("key", "payload"))
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, "c", 0.5)).toDF("key", "payload", "score"), mergeSchema = true)
    SnapshotLog.deleteWhere(spark, t, "key", Some(2L), Some(3L))
    val rows = SnapshotLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a")))
  }

  test("optimize after evolution rewrites to the merged schema, nulls preserved") {
    val t = freshDir("evolve_opt")
    SnapshotLog.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("key", "payload"))
    SnapshotLog.commitAppend(spark, t,
      Seq((3L, "c", 0.5)).toDF("key", "payload", "score"), mergeSchema = true)
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = 10L,
      clusterBy = Seq("key"))
    val rows = SnapshotLog.read(spark, t).collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
  }

  test("streaming source keeps its pinned schema through a mid-stream evolution") {
    val t = freshDir("evolve_stream")
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("key", "payload"))
    val sink = "evolve_stream_sink"
    val stream = spark.readStream.format("graft-snaplog")
      .option("tableDir", t).load()
    assert(stream.columns.toSeq == Seq("key", "payload"))
    val q = stream.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$scratch/evolve_stream_ckpt").start()
    try {
      q.processAllAvailable()
      SnapshotLog.commitAppend(spark, t,
        Seq((2L, "b", 1.5)).toDF("key", "payload", "score"),
        mergeSchema = true)
      q.processAllAvailable()
      // the evolved batch arrives through the PINNED 2-column schema —
      // the new column needs a stream restart (the Delta decision)
      val got = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b")))
    } finally q.stop()
  }
}
