package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Manifest-stats data skipping ([[graft.sources.SnapshotLog]]):
  * commits record per-file min/max column stats from the parquet
  * footers, [[SnapshotLog.readWhere]] prunes files against them, and —
  * the load-bearing property — pruning NEVER changes a result: every
  * case here asserts equality against the unpruned read + exact
  * filter, including the shapes where stats are deliberately absent
  * (pre-stats manifests, non-ASCII strings, unsupported types).
  */
class SnapshotStatsSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Ground truth: the unpruned read with the same exact predicate. */
  private def oracle(t: String, c: String, lo: Option[Any], hi: Option[Any],
      asOf: Option[Long] = None): Set[String] = {
    val base = SnapshotLog.read(spark, t, asOf)
    val preds = lo.map(l => col(c) >= lit(l)) ++ hi.map(u => col(c) <= lit(u))
    preds.reduceOption(_ && _).map(base.filter).getOrElse(base)
      .collect().map(_.toString).toSet
  }

  private def result(t: String, c: String, lo: Option[Any], hi: Option[Any],
      asOf: Option[Long] = None): Set[String] =
    SnapshotLog.readWhere(spark, t, c, lo, hi, asOf)
      .collect().map(_.toString).toSet

  test("range-clustered commit records footer stats and a narrow read prunes files") {
    val t = s"$scratch/stats_range"
    val df = spark.range(10000).select(
      col("id").as("key"),
      (col("id") % 97).as("mod"),
      concat(lit("u"), lpad(col("id").cast("string"), 5, "0")).as("s"))
      .repartitionByRange(8, col("key"))
    val v = SnapshotLog.commit(spark, t, df)

    // the manifest carries min/max for every column of every file
    val node = mapper.readTree(Files.readString(Paths.get(t, "_log", s"$v.json")))
    val stats = node.get("stats")
    assert(stats != null, "commit must record a stats node")
    val files = node.get("files").elements()
    var n = 0
    while (files.hasNext) {
      val f = files.next().asText()
      n += 1
      val cols = stats.get(f)
      assert(cols != null, s"no stats for $f")
      for (c <- Seq("key", "mod", "s")) {
        assert(cols.get(c) != null && cols.get(c).get("min") != null,
          s"no min for $c in $f")
      }
    }
    assert(n == 8)

    // key is range-clustered: a 2-range ask scans ~2 of 8 files
    val (kept, total) = SnapshotLog.pruneFiles(t, "key", Some(100L), Some(2599L))
    assert(total == 8 && kept.size < total,
      s"expected pruning on the clustered column, kept ${kept.size}/$total")
    assert(result(t, "key", Some(100L), Some(2599L)) ==
      oracle(t, "key", Some(100L), Some(2599L)))

    // mod is uniform across files: nothing prunes, result still exact
    val (keptMod, _) = SnapshotLog.pruneFiles(t, "mod", Some(3L), Some(5L))
    assert(keptMod.size == total, "an unclustered column must not prune")
    assert(result(t, "mod", Some(3L), Some(5L)) ==
      oracle(t, "mod", Some(3L), Some(5L)))

    // one-sided bounds prune too
    val (keptHi, _) = SnapshotLog.pruneFiles(t, "key", Some(9000L), None)
    assert(keptHi.size < total)
    assert(result(t, "key", Some(9000L), None) ==
      oracle(t, "key", Some(9000L), None))

    // a range outside the domain prunes EVERYTHING and still returns
    // an empty frame with the table's schema
    val out = SnapshotLog.readWhere(spark, t, "key", Some(50000L), Some(60000L))
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("key", "mod", "s"))
  }

  test("string stats prune lexically; fractional bounds compare exactly against long stats") {
    val t = s"$scratch/stats_str"
    val df = spark.range(2600).select(
      col("id").as("key"),
      concat(
        lit(('a' to 'z').mkString).substr((col("id") % 26 + 1).cast("int"), lit(1)),
        lpad(col("id").cast("string"), 4, "0")).as("s"))
      .repartitionByRange(4, col("s"))
    SnapshotLog.commit(spark, t, df)
    val (kept, total) = SnapshotLog.pruneFiles(t, "s", Some("b"), Some("c~"))
    assert(total == 4 && kept.size < total)
    assert(result(t, "s", Some("b"), Some("c~")) ==
      oracle(t, "s", Some("b"), Some("c~")))
    // fractional bounds on an integral column: BigDecimal compare, no
    // long→double cast — and the residual filter keeps exactness
    assert(result(t, "key", Some(10.5), Some(12.5)) ==
      oracle(t, "key", Some(10.5), Some(12.5)))
    // a kind-mismatched bound never prunes and never crashes
    val (keptMix, _) = SnapshotLog.pruneFiles(t, "key", Some("zzz"), None)
    assert(keptMix.size == total)
  }

  test("non-ASCII string values drop the column's stats for that file rather than risk a wrong prune") {
    val t = s"$scratch/stats_nonascii"
    // file 0 holds a supplementary-plane string (UTF-8 byte order and
    // UTF-16 order diverge there); files 1..3 are pure ASCII
    val df = spark.range(400).select(
      col("id").as("key"),
      when(col("id") < 100, lit("𐀀ok")) // U+10000
        .otherwise(concat(lit("plain"), col("id").cast("string"))).as("s"))
      .repartitionByRange(4, col("id"))
    val v = SnapshotLog.commit(spark, t, df)
    val node = mapper.readTree(Files.readString(Paths.get(t, "_log", s"$v.json")))
    val stats = node.get("stats")
    val fileStats = node.get("files").elements()
    var withS = 0
    var withoutS = 0
    while (fileStats.hasNext) {
      val cols = stats.get(fileStats.next().asText())
      assert(cols.get("key") != null, "numeric stats must survive")
      if (cols.get("s") == null) withoutS += 1 else withS += 1
    }
    assert(withoutS == 1 && withS == 3,
      s"exactly the non-ASCII file drops s-stats, got $withoutS/$withS")
    // the stat-less file is always kept, so results stay exact
    assert(result(t, "s", Some("a"), Some("z")) ==
      oracle(t, "s", Some("a"), Some("z")))
  }

  test("an all-null column file is pruned by any bound (a range never selects NULL)") {
    val t = s"$scratch/stats_allnull"
    val df = spark.range(400).select(
      col("id").as("key"),
      when(col("id") >= 100, col("id") * 2).as("v")) // file 0: v all null
      .repartitionByRange(4, col("key"))
    SnapshotLog.commit(spark, t, df)
    val (kept, total) = SnapshotLog.pruneFiles(t, "v", Some(0L), Some(1000000L))
    assert(total == 4 && kept.size == 3, s"kept ${kept.size}")
    assert(result(t, "v", Some(0L), Some(1000000L)) ==
      oracle(t, "v", Some(0L), Some(1000000L)))
  }

  test("a Z-order clustered commit prunes on EITHER dimension") {
    val t = s"$scratch/stats_zorder"
    // 256x256 grid, Morton-clustered exactly as LayoutOps builds it
    val df = spark.range(65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).as("y"))
      .withColumn("z", expr(graft.ops.LayoutOps.zOrderSparkSql("x", "y", 8)))
      .repartitionByRange(16, col("z"))
    SnapshotLog.commit(spark, t, df)
    val (keptX, total) = SnapshotLog.pruneFiles(t, "x", Some(0L), Some(31L))
    val (keptY, _) = SnapshotLog.pruneFiles(t, "y", Some(0L), Some(31L))
    assert(total == 16)
    assert(keptX.size < total && keptY.size < total,
      s"both dimensions must prune: x ${keptX.size}, y ${keptY.size} of $total")
    assert(result(t, "x", Some(0L), Some(31L)) ==
      oracle(t, "x", Some(0L), Some(31L)))
    assert(result(t, "y", Some(0L), Some(31L)) ==
      oracle(t, "y", Some(0L), Some(31L)))
  }

  test("appends carry the old generation's stats verbatim and harvest only the new files") {
    val t = s"$scratch/stats_append"
    SnapshotLog.commit(spark, t, spark.range(400)
      .select(col("id").as("key")).repartitionByRange(4, col("key")))
    val m0 = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
    val v1 = SnapshotLog.commitAppend(spark, t, spark.range(1000, 1200)
      .select(col("id").as("key")).repartitionByRange(2, col("key")))
    val m1 = mapper.readTree(Files.readString(Paths.get(t, "_log", s"$v1.json")))
    // every v0 file's stats node is copied into v1 UNCHANGED (no
    // re-harvest of committed data), and the new files bring their own
    val it0 = m0.get("files").elements()
    while (it0.hasNext) {
      val f = it0.next().asText()
      assert(m1.get("stats").get(f) == m0.get("stats").get(f),
        s"carried stats must be verbatim for $f")
    }
    assert(m1.get("stats").size() == 6)
    // pruning spans generations: an old-range ask keeps only old
    // files, a new-range ask only new ones — both results exact
    val (keptOld, total) = SnapshotLog.pruneFiles(t, "key", Some(0L), Some(50L))
    val (keptNew, _) = SnapshotLog.pruneFiles(t, "key", Some(1000L), Some(1050L))
    assert(total == 6 && keptOld.size == 1 && keptNew.size == 1,
      s"old ${keptOld.size} new ${keptNew.size} of $total")
    assert(result(t, "key", Some(0L), Some(50L)) ==
      oracle(t, "key", Some(0L), Some(50L)))
    assert(result(t, "key", Some(1000L), Some(1050L)) ==
      oracle(t, "key", Some(1000L), Some(1050L)))
  }

  test("the manifest records the written schema and reads plan from it") {
    val t = s"$scratch/stats_schema"
    SnapshotLog.commit(spark, t, spark.range(10).select(
      col("id").as("key"),
      array(col("id"), col("id") * 2).as("arr"),
      struct(col("id").as("a"), lit("x").as("b")).as("st")))
    val node = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
    assert(node.get("schema") != null, "commit must record the schema")
    val recorded = org.apache.spark.sql.types.DataType
      .fromJson(node.get("schema").asText())
    assert(recorded == SnapshotLog.read(spark, t).schema)
    // nested/array columns carry no stats (unsupported by design) but
    // never break the read or the residual filter
    assert(result(t, "key", Some(3L), Some(5L)) ==
      oracle(t, "key", Some(3L), Some(5L)))
  }

  test("copy-on-write delete rewrites only the files the stats cannot exonerate") {
    val t = s"$scratch/stats_delete"
    SnapshotLog.commit(spark, t, spark.range(8000)
      .select(col("id").as("key"), (col("id") % 13).as("v"))
      .repartitionByRange(8, col("key")))
    val m0 = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
    val files0 = {
      val it = m0.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSeq
    }
    // delete a range inside one clustered file (range-partition
    // boundaries are sample-based, so leave jitter margin)
    val v = SnapshotLog.deleteWhere(spark, t, "key", Some(1100L), Some(1899L))
    assert(v == 1L)
    val m1 = mapper.readTree(Files.readString(Paths.get(t, "_log", "1.json")))
    val files1 = {
      val it = m1.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSeq
    }
    // 7 of 8 old files carried by NAME (zero I/O for them), with their
    // stats nodes byte-identical; only the affected file was replaced
    val carried = files0.toSet.intersect(files1.toSet)
    assert(carried.size == 7, s"carried ${carried.size} of ${files0.size}")
    carried.foreach(f =>
      assert(m1.get("stats").get(f) == m0.get("stats").get(f)))
    // content: exactly the interval is gone
    val keys = SnapshotLog.read(spark, t).select("key")
      .collect().map(_.getLong(0)).sorted
    assert(keys.length == 7200 && !keys.exists(k => k >= 1100 && k <= 1899))
    // history intact; a narrow ask still prunes on the new version
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).count() == 8000)
    val (kept, total) = SnapshotLog.pruneFiles(t, "key", Some(7300L), Some(7600L))
    assert(total == files1.size && kept.size == 1, s"kept ${kept.size}/$total")
  }

  test("copy-on-write update rewrites only intersecting files, in-range rows only, schema preserved") {
    val t = s"$scratch/stats_update"
    SnapshotLog.commit(spark, t, spark.range(8000)
      .select(col("id").as("key"), (col("id") % 13).as("v"))
      .repartitionByRange(8, col("key")))
    val files0 = {
      val it = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
        .get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    val ver = SnapshotLog.updateWhere(spark, t, "key", Some(1100L), Some(1899L),
      Map("v" -> (col("v") + lit(1000L))))
    assert(ver == 1L)
    val files1 = {
      val it = mapper.readTree(Files.readString(Paths.get(t, "_log", "1.json")))
        .get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    assert(files0.intersect(files1).size == 7, "exonerated files carry by name")
    // in-range rows updated, everything else byte-identical
    val rows = SnapshotLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 8000)
    rows.foreach { case (k, v) =>
      val expect = if (k >= 1100 && k <= 1899) k % 13 + 1000 else k % 13
      assert(v == expect, s"key $k: $v != $expect")
    }
    // history intact
    assert(SnapshotLog.read(spark, t, asOf = Some(0L))
      .filter(col("v") >= 1000).count() == 0)
    // a schema-altering assignment fails loudly, table unmoved (a
    // double literal widens the CaseWhen to double — a string cast
    // would NOT alter anything, ANSI coercion casts it back to long)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.updateWhere(spark, t, "key", Some(0L), Some(10L),
        Map("v" -> lit(0.5)))
    }
    assert(e.getMessage.contains("preserve the schema"), e.getMessage)
    // an unknown-column assignment fails loudly too
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.updateWhere(spark, t, "key", Some(0L), Some(10L),
        Map("nope" -> lit(1L)))
    }
    assert(e2.getMessage.contains("unknown column"), e2.getMessage)
    assert(SnapshotLog.latestVersion(t).contains(1L))
  }

  test("delete semantics: NULL never matches a range, and null-only files are exonerated by allNull stats") {
    val t = s"$scratch/stats_delete_null"
    // file 0 (key 0..99) carries only null v; the rest have values
    SnapshotLog.commit(spark, t, spark.range(400).select(
      col("id").as("key"),
      when(col("id") >= 100, col("id")).as("v"))
      .repartitionByRange(4, col("key")))
    val m0 = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
    val files0 = {
      val it = m0.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    SnapshotLog.deleteWhere(spark, t, "v", Some(0L), Some(10000L))
    val m1 = mapper.readTree(Files.readString(Paths.get(t, "_log", "1.json")))
    val files1 = {
      val it = m1.get("files").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asText()).toSet
    }
    // the all-null file survived WITHOUT a rewrite (carried by name)
    assert(files0.intersect(files1).size == 1)
    // and its null rows are the only survivors
    val rows = SnapshotLog.read(spark, t).collect()
    assert(rows.length == 100 && rows.forall(_.isNullAt(1)))
  }

  test("pre-stats manifests never prune and still read exactly; time travel prunes per-version") {
    val t = s"$scratch/stats_prestats"
    // v0 via the normal commit (has stats), then a hand-published v1
    // WITHOUT stats — the pre-round-10 manifest shape
    SnapshotLog.commit(spark, t,
      spark.range(100).select(col("id").as("key")).repartitionByRange(2, col("key")))
    val dd = s"$t/data/v1-manual"
    spark.range(100, 300).select(col("id").as("key"))
      .repartitionByRange(2, col("key")).write.parquet(dd)
    val files = Files.list(Paths.get(dd)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted.toSeq
    SnapshotLog.publish(t, 1L, files)
    val (kept1, total1) = SnapshotLog.pruneFiles(t, "key", Some(0L), Some(10L))
    assert(kept1.size == total1, "a stat-less manifest must keep every file")
    assert(result(t, "key", Some(0L), Some(10L)) ==
      oracle(t, "key", Some(0L), Some(10L)))
    // time travel to v0 resolves THAT version's stats and prunes again
    val (kept0, total0) =
      SnapshotLog.pruneFiles(t, "key", Some(0L), Some(10L), asOf = Some(0L))
    assert(total0 == 2 && kept0.size == 1)
    assert(result(t, "key", Some(0L), Some(10L), asOf = Some(0L)) ==
      oracle(t, "key", Some(0L), Some(10L), asOf = Some(0L)))
  }

  test("non-finite bounds never crash pruning: every file kept, residual filter decides") {
    val t = s"$scratch/stats_nonfinite"
    SnapshotLog.commit(spark, t,
      spark.range(1000).select(col("id").as("key"),
        (col("id").cast("double") / 10.0).as("x"))
        .repartitionByRange(4, col("x")))
    // NaN / Infinity can't enter a BigDecimal compare — the documented
    // odd-bounds contract (keep the file) must hold, not a
    // NumberFormatException out of readWhere/pruneFiles
    for (b <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val (kept, total) = SnapshotLog.pruneFiles(t, "x", Some(b), None)
      assert(kept.size == total, s"bound $b must keep every file")
      assert(result(t, "x", Some(b), None) == oracle(t, "x", Some(b), None))
      assert(result(t, "x", None, Some(b)) == oracle(t, "x", None, Some(b)))
    }
    // the float path hits the same guard
    assert(result(t, "x", Some(Float.NaN), None) ==
      oracle(t, "x", Some(Float.NaN), None))
  }

  test("an empty pre-schema manifest fails loudly; with a recorded schema it is a well-formed empty table") {
    val t = s"$scratch/stats_empty_legacy"
    SnapshotLog.publish(t, 0L, Nil)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readWhere(spark, t, "key", Some(0L), None)
    }
    assert(e.getMessage.contains("lists no files"), e.getMessage)
    val t2 = s"$scratch/stats_empty_schema"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType)))
    SnapshotLog.publish(t2, 0L, Nil, schemaJson = Some(schema.json))
    val out = SnapshotLog.readWhere(spark, t2, "key", Some(0L), None)
    assert(out.schema == schema && out.count() == 0)
  }
}
