package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Metadata-only aggregate pushdown through the snapshot catalog
  * ([[graft.sources.SnapshotCatalog]]'s `aggAnswer` +
  * `SupportsPushDownAggregates` on the bridge builder): an ungrouped
  * COUNT(*)/COUNT(col)/MIN(col)/MAX(col) over a clean version plans as
  * ONE [[SnapAggScan]] row answered from the manifest's per-file stats
  * (`:rows` pseudo-stat + min/max/nulls) — zero data I/O at any table
  * size. The contract has two halves, and the DECLINE half matters
  * more: a pushed aggregate's answer IS the query result (no residual
  * re-check protects it, unlike file pruning), so every case the
  * stats cannot answer EXACTLY must fall back to an honest scan —
  * filters, group-bys, DISTINCT, NaN-able double/float min-max,
  * truncatable string bounds, stat-less INT96 timestamps, and files
  * missing the row-count pseudo-stat. Dv-bearing versions are SPLIT:
  * COUNT(*) answers exactly (the dv-writing verbs record each file's
  * deduped mask cardinality as `:masked` — Σ:rows − Σ:masked), while
  * COUNT(col)/MIN/MAX keep declining (a mask can hide any share of a
  * column's nulls or exactly the extreme the footer recorded). */
class SnapshotAggPushSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_aggpush_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.agp", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.agp.root", r)
    r
  }

  private def pushedScan(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.exists(_.getClass.getSimpleName.contains("SnapAggScan"))

  /** Rows with every answerable kind (long/int/date/micros-ts) plus
    * the two decline kinds (double, string) and nulls in the mix. */
  private def seed(dir: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try {
      val df = spark.range(0, 1000).toDF("k")
        .withColumn("i", (col("k") % 97).cast("int"))
        .withColumn("d", expr("date_add(date'2020-01-01', CAST(k % 366 AS INT))"))
        .withColumn("ts", expr(
          "timestamp'2021-06-01 00:00:00' + make_interval(0,0,0,0,0,0,k)"))
        .withColumn("x", col("k") * 1.5)
        .withColumn("s", concat(lit("row-"), col("k")))
        // nullable column: every 10th row null
        .withColumn("nv", when(col("k") % 10 === 0, lit(null).cast("long"))
          .otherwise(col("k")))
      SnapshotLog.commit(spark, dir, df.repartitionByRange(4, col("k")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("ungrouped COUNT/MIN/MAX answers from manifest stats alone") {
    root
    val dir = s"$root/lake/t1"
    seed(dir)
    val q = spark.sql(
      """SELECT count(*) AS cnt, count(nv) AS cnt_nv,
           min(k) AS min_k, max(k) AS max_k,
           min(i) AS min_i, max(i) AS max_i,
           min(d) AS min_d, max(d) AS max_d,
           min(ts) AS min_ts, max(ts) AS max_ts
         FROM agp.lake.t1""")
    assert(pushedScan(q), q.queryExecution.optimizedPlan.toString)
    val r = q.collect()(0)
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(1) == 900L, "count(nv) must exclude the 100 nulls")
    assert(r.getLong(2) == 0L && r.getLong(3) == 999L)
    assert(r.getInt(4) == 0 && r.getInt(5) == 96)
    // every value must equal the honest Scala read path's (no catalog,
    // no pushdown — the ground truth the stats answer must equal);
    // temporal values compare as externals, dodging JVM-default-TZ
    // toString ambiguity
    val sr = SnapshotLog.read(spark, dir).agg(
      count(lit(1)), count(col("nv")), min(col("k")), max(col("k")),
      min(col("i")), max(col("i")), min(col("d")), max(col("d")),
      min(col("ts")), max(col("ts"))).collect()(0)
    (0 until 10).foreach { i =>
      assert(sr.get(i) == r.get(i), s"column $i: ${sr.get(i)} vs ${r.get(i)}")
    }
  }

  test("declines: WHERE, GROUP BY, DISTINCT, double/string min-max, avg") {
    root
    val dir = s"$root/lake/t1"
    if (!Files.exists(Paths.get(dir))) seed(dir)
    val cases = Seq(
      "SELECT count(*) FROM agp.lake.t1 WHERE k > 10",
      "SELECT i, count(*) FROM agp.lake.t1 GROUP BY i",
      "SELECT count(DISTINCT i) FROM agp.lake.t1",
      // doubles: footers ignore NaN, Spark's MAX sorts NaN above all
      "SELECT min(x) FROM agp.lake.t1",
      // strings: writers may truncate binary bounds
      "SELECT max(s) FROM agp.lake.t1",
      // one unanswerable member declines the whole aggregation
      "SELECT count(*), min(x) FROM agp.lake.t1",
      "SELECT avg(k) FROM agp.lake.t1")
    cases.foreach { sql =>
      val df = spark.sql(sql)
      assert(!pushedScan(df), s"must decline: $sql")
      df.collect(): Unit // and still answer correctly through the scan
    }
    // spot-check one declined value against the pushed twin
    assert(spark.sql("SELECT count(*) FROM agp.lake.t1 WHERE k >= 0")
      .collect()(0).getLong(0) == 1000L)
  }

  test("dv version: COUNT(*) pushes exactly (re-marks deduped), " +
      "MIN/MAX decline; compactDeletes restores the full shortcut") {
    root
    val dir = s"$root/lake/t2"
    seed(dir)
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(0L, 1L, 2L, 999L))
    // a MIN/MAX-carrying aggregation still declines as a whole: the
    // mask could hide exactly the extreme the footer recorded
    val masked = spark.sql("SELECT count(*) AS c, min(k), max(k) FROM agp.lake.t2")
    assert(!pushedScan(masked),
      "a dv version must not answer MIN/MAX from stats")
    val mr = masked.collect()(0)
    assert(mr.getLong(0) == 996L && mr.getLong(1) == 3L &&
      mr.getLong(2) == 998L)
    // ...but a bare COUNT(*) answers from :rows − :masked
    val cq = spark.sql("SELECT count(*) AS c FROM agp.lake.t2")
    assert(pushedScan(cq), "dv-aware COUNT(*) must answer from the manifest")
    assert(cq.collect()(0).getLong(0) == 996L)
    // COUNT(col) keeps declining: per-column null shares are invisible
    // to the mask stat
    val ccq = spark.sql("SELECT count(nv) AS c FROM agp.lake.t2")
    assert(!pushedScan(ccq))
    ccq.collect(): Unit
    // RE-MARKS across commits: key 2 deleted again (the marks scan is
    // mask-free, so its position lands in a SECOND sidecar) — the
    // recorded cardinality must dedup, never double-subtract
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(2L, 3L))
    val cq2 = spark.sql("SELECT count(*) AS c FROM agp.lake.t2")
    assert(pushedScan(cq2), "the second MOR commit must refresh :masked")
    assert(cq2.collect()(0).getLong(0) == 995L,
      "overlapping re-marks double-subtracted")
    SnapshotLog.compactDeletes(spark, dir)
    val clean = spark.sql("SELECT count(*) AS c, min(k), max(k) FROM agp.lake.t2")
    assert(pushedScan(clean), "compaction retires the masks — the " +
      "metadata shortcut must come back")
    val cr = clean.collect()(0)
    assert(cr.getLong(0) == 995L && cr.getLong(1) == 4L &&
      cr.getLong(2) == 998L)
    // VERSION AS OF a pre-delete version answers ITS stats
    val v0 = spark.sql("SELECT count(*) FROM agp.lake.t2 VERSION AS OF 0")
    assert(pushedScan(v0))
    assert(v0.collect()(0).getLong(0) == 1000L)
  }

  test("column-mapped table answers under the logical name") {
    root
    val dir = s"$root/lake/t3"
    seed(dir)
    SnapshotLog.renameColumn(dir, "k", "key")
    val q = spark.sql(
      "SELECT count(*) AS c, min(key) AS mn, max(key) AS mx FROM agp.lake.t3")
    assert(pushedScan(q), q.queryExecution.optimizedPlan.toString)
    val r = q.collect()(0)
    assert(r.getLong(0) == 1000L && r.getLong(1) == 0L && r.getLong(2) == 999L)
  }

  test("empty genesis answers count 0 and null min/max") {
    root
    spark.sql("CREATE TABLE agp.lake.empty (k BIGINT, v STRING)")
    val q = spark.sql(
      "SELECT count(*) AS c, min(k) AS mn, count(v) AS cv FROM agp.lake.empty")
    assert(pushedScan(q), q.queryExecution.optimizedPlan.toString)
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.getLong(2) == 0L)
  }

  test("all-null files: min/max null, count(col) zero — still pushed") {
    root
    val dir = s"$root/lake/t4"
    val df = spark.range(0, 100).toDF("k")
      .withColumn("nv", lit(null).cast("long"))
    SnapshotLog.commit(spark, dir, df.repartition(2))
    val q = spark.sql(
      "SELECT count(*) AS c, count(nv) AS cn, min(nv) AS mn FROM agp.lake.t4")
    assert(pushedScan(q), q.queryExecution.optimizedPlan.toString)
    val r = q.collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("INT96 timestamps are stat-less: min(ts) declines, count(*) pushes") {
    root
    val dir = s"$root/lake/t5"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try SnapshotLog.commit(spark, dir, spark.range(0, 50).toDF("k")
      .withColumn("ts", expr("timestamp'2021-06-01 00:00:00'")))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val tsq = spark.sql("SELECT min(ts) FROM agp.lake.t5")
    assert(!pushedScan(tsq), "INT96 stats are deliberately unharvested")
    tsq.collect(): Unit
    val cq = spark.sql("SELECT count(*) AS c FROM agp.lake.t5")
    assert(pushedScan(cq), "the :rows pseudo-stat is type-independent")
    assert(cq.collect()(0).getLong(0) == 50L)
  }

  test("LIMIT prunes the file list to the covering manifest prefix") {
    root
    val dir = s"$root/lake/t6"
    SnapshotLog.commit(spark, dir,
      spark.range(0, 1000).toDF("k").repartition(8))
    val got = spark.sql("SELECT k FROM agp.lake.t6 LIMIT 10").collect()
    assert(got.length == 10)
    val dec = graft.sources.ScanPrune.decisions.collectFirst {
      case (k, v) if k.contains("lake.t6@") && k.endsWith("#limit") => v
    }
    assert(dec.contains((1, 8)), s"limit prune decision: $dec")
    // a limit past the table keeps every file and every row
    assert(spark.sql("SELECT k FROM agp.lake.t6 LIMIT 5000").collect()
      .length == 1000)
    // a WHERE blocks the prune (residual filters drop rows) — results
    // stay exact
    val filtered = spark.sql(
      "SELECT k FROM agp.lake.t6 WHERE k >= 990 LIMIT 10").collect()
    assert(filtered.length == 10 &&
      filtered.map(_.getLong(0)).toSet == (990L until 1000L).toSet)
  }

  test("LIMIT prunes through a dv-bearing version on exact LIVE counts") {
    root
    val dir = s"$root/lake/t7"
    SnapshotLog.commit(spark, dir,
      spark.range(0, 100).toDF("k").repartition(4))
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", (0L until 50L).toSeq)
    // the prefix is computed on :rows − :masked per file, so a limit
    // the 50 LIVE rows can cover keeps pruning (files holding only
    // masked rows never satisfy it vacuously — counts are exact)
    val got = spark.sql("SELECT k FROM agp.lake.t7 LIMIT 10").collect()
    assert(got.length == 10)
    val dec = graft.sources.ScanPrune.decisions.collectFirst {
      case (k, v) if k.contains("lake.t7@") && k.endsWith("#limit") => v
    }
    assert(dec.exists(_._2 == 4), s"limit prune decision: $dec")
    // a limit PAST the live rows keeps every file and every live row
    assert(spark.sql("SELECT k FROM agp.lake.t7 LIMIT 60").collect()
      .length == 50, "only the 50 unmasked rows survive")
  }

  test("the .files metadata table surfaces the recorded row counts") {
    root
    val dir = s"$root/lake/t1"
    if (!Files.exists(Paths.get(dir))) seed(dir)
    val rows = spark.sql(
      "SELECT rows FROM agp.lake.t1.files").collect().map(_.getLong(0))
    assert(rows.nonEmpty && rows.sum == 1000L, rows.mkString(", "))
  }
}
