package graft

import java.nio.file.{Files, Paths}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.functions._

import sources.{ScanPrune, SnapshotLog}

/** Temporal data skipping: DATE and TIMESTAMP(MICROS) columns — the
  * clustering dimensions real lakehouse tables actually sort by — now
  * harvest footer stats (epoch days / epoch micros, one fixed unit
  * each) and prune through every ask shape: the Scala range path
  * ([[SnapshotLog.readWhere]] with java.time / java.sql bounds), the
  * bloom membership path, COW DML, and SQL through the catalog.
  * NANOS-encoded files stay deliberately stat-less (their Spark-side
  * value is reader-session-dependent) — asserted so the conservative
  * contract is pinned, not assumed. */
class SnapshotTemporalSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def afterAll(): Unit = {
    try spark.conf.unset("spark.sql.parquet.outputTimestampType")
    finally super.afterAll()
  }

  /** 2000 rows over ~2000 days from 2020-01-01, date-clustered into 8
    * files; ts = the same instant at 12:00 UTC. Written MICROS — the
    * standard parquet encoding — because Spark's INT96 writer default
    * produces files whose (deprecated) statistics parquet itself marks
    * unordered: timestamp PRUNING is a property of standard-encoded
    * tables, and the suite's last case pins the INT96 degradation. */
  private def temporal(t: String): Unit = {
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val df = spark.range(2000).repartitionByRange(8, col("id")).select(
      col("id").as("n"),
      date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("id").cast("int"))
        .as("d"),
      expr("timestampadd(DAY, id, timestamp'2020-01-01 12:00:00')").as("ts"))
    SnapshotLog.commit(spark, t, df): Unit
  }

  test("date and micros-timestamp columns harvest footer stats in fixed units") {
    val t = s"$scratch/temporal_stats"
    temporal(t)
    val node = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
    val stats = node.get("stats")
    val f0 = node.get("files").elements().next().asText()
    val d = stats.get(f0).get("d")
    val ts = stats.get(f0).get("ts")
    assert(d != null && ts != null, s"missing temporal stats for $f0")
    // first file covers the earliest dates: min = 2020-01-01 in days
    assert(d.get("min").asLong() == LocalDate.parse("2020-01-01").toEpochDay)
    val expectMicros = LocalDateTime.parse("2020-01-01T12:00:00")
      .toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(ts.get("min").asLong() == expectMicros,
      s"ts min ${ts.get("min").asLong()} != $expectMicros")
  }

  test("readWhere prunes on date bounds (java.sql.Date and LocalDate), result exact") {
    val t = s"$scratch/temporal_range"
    temporal(t)
    val lo = java.sql.Date.valueOf("2021-01-01")
    val hi = LocalDate.parse("2021-03-31")
    val (kept, total) = SnapshotLog.pruneFiles(t, "d", Some(lo), Some(hi))
    assert(total == 8 && kept.size <= 2, s"kept ${kept.size}/$total")
    val got = SnapshotLog.readWhere(spark, t, "d", Some(lo), Some(hi))
      .collect().map(_.toString).toSet
    val want = SnapshotLog.read(spark, t)
      .filter(col("d") >= lit(lo) && col("d") <= lit(hi))
      .collect().map(_.toString).toSet
    assert(got == want && got.size == 90)
  }

  test("readWhere prunes on timestamp bounds (Timestamp and Instant), result exact") {
    val t = s"$scratch/temporal_ts"
    temporal(t)
    val lo = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
    val hi = Instant.parse("2021-03-31T23:59:59Z")
    val (kept, total) = SnapshotLog.pruneFiles(t, "ts", Some(lo), Some(hi))
    assert(total == 8 && kept.size <= 2, s"kept ${kept.size}/$total")
    val got = SnapshotLog.readWhere(spark, t, "ts", Some(lo), Some(hi))
      .collect().map(_.toString).toSet
    val want = SnapshotLog.read(spark, t)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
      .collect().map(_.toString).toSet
    assert(got == want && got.size == 90)
  }

  test("bloom membership on a date column: index, lookup, point delete") {
    val t = s"$scratch/temporal_bloom"
    // date NOT clustered (clustered by n reversed), so stats keep all
    val df = spark.range(2000).repartitionByRange(8, col("id")).select(
      col("id").as("n"),
      date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        ((col("id") * 757) % 2000).cast("int")).as("d"))
    SnapshotLog.commit(spark, t, df)
    SnapshotLog.writeBloomIndex(spark, t, "d",
      expectedItemsPerFile = 1024, fpp = 0.01)
    val key = LocalDate.parse("2020-01-01").plusDays(1234)
    val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "d", Seq(key))
    assert(total == 8 && kept.size <= 2, s"kept ${kept.size}/$total")
    val rows = SnapshotLog.readWhereIn(spark, t, "d", Seq(key)).collect()
    assert(rows.length == 1)
    SnapshotLog.deleteWhereIn(spark, t, "d", Seq(key))
    assert(SnapshotLog.read(spark, t).count() == 1999)
    assert(SnapshotLog.readWhereIn(spark, t, "d", Seq(key)).count() == 0)
  }

  test("SQL through the catalog prunes on date and timestamp predicates") {
    val r = Files.createTempDirectory("graft_temporal_sql_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    temporal(s"$r/lake/days")
    spark.conf.set("spark.sql.catalog.snaptmp", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.snaptmp.root", r)
    val n = spark.sql("SELECT count(*) AS n FROM snaptmp.lake.days " +
      "WHERE d BETWEEN DATE'2021-01-01' AND DATE'2021-03-31'").head().getLong(0)
    val (_, kept, total) = ScanPrune.last.get
    assert(n == 90 && total == 8 && kept <= 2, s"kept $kept/$total")
    val m = spark.sql("SELECT count(*) AS n FROM snaptmp.lake.days " +
      "WHERE ts >= TIMESTAMP'2025-01-01 00:00:00'").head().getLong(0)
    val (_, kept2, _) = ScanPrune.last.get
    assert(m == SnapshotLog.read(spark, s"$r/lake/days")
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .count())
    assert(kept2 <= 2, s"kept $kept2")
    val eq = spark.sql("SELECT n FROM snaptmp.lake.days WHERE d = DATE'2021-02-03'")
      .collect()
    val (_, kept3, _) = ScanPrune.last.get
    assert(eq.length == 1 && kept3 <= 1, s"kept $kept3")
  }

  test("INT96-written timestamps degrade to stat-less files; reads stay exact") {
    val t = s"$scratch/temporal_int96"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      SnapshotLog.commit(spark, t,
        spark.range(100).repartitionByRange(2, col("id")).select(
          col("id").as("n"),
          expr("timestampadd(DAY, id, timestamp'2020-01-01 12:00:00')").as("ts")))
    } finally spark.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val node = mapper.readTree(Files.readString(Paths.get(t, "_log", "0.json")))
    val f0 = node.get("files").elements().next().asText()
    val sNode = node.get("stats")
    assert(sNode == null || sNode.get(f0) == null || sNode.get(f0).get("ts") == null,
      "INT96 must record no timestamp stats (deprecated, unordered)")
    val lo = java.sql.Timestamp.valueOf("2020-03-01 00:00:00")
    val (kept, total) = SnapshotLog.pruneFiles(t, "ts", Some(lo), None)
    assert(kept.size == total, "stat-less timestamps must keep every file")
    assert(SnapshotLog.readWhere(spark, t, "ts", Some(lo), None).count() ==
      SnapshotLog.read(spark, t).filter(col("ts") >= lit(lo)).count())
  }

  test("NANOS-encoded files stay stat-less and unpruned — the conservative contract") {
    // the driver fixture's events table is TIMESTAMP(NANOS)/long in
    // some generations; committing THROUGH Spark rewrites as micros,
    // so pin the contract at the harvest level instead: a long column
    // carrying nanos magnitudes (plain INT64) still records plain-long
    // stats and prunes only against raw-long bounds — no unit is ever
    // guessed
    val t = s"$scratch/temporal_nanos"
    val base = Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000000L
    SnapshotLog.commit(spark, t,
      spark.range(1000).repartitionByRange(4, col("id")).select(
        col("id").as("n"),
        (lit(base) + col("id") * 60L * 1000000000L).as("ts_nanos")))
    // a raw-long ask prunes; an Instant ask (wrong unit for this
    // column) normalizes to micros, which sit BELOW every nanos value
    // — belowRange exonerates nothing and everything is kept: the
    // residual filter still answers exactly
    val loRaw = base + 500L * 60L * 1000000000L
    val (kept, total) = SnapshotLog.pruneFiles(t, "ts_nanos", Some(loRaw), None)
    assert(total == 4 && kept.size <= 2, s"kept ${kept.size}/$total")
    val viaInstant = SnapshotLog.pruneFiles(t, "ts_nanos",
      Some(Instant.ofEpochSecond(0)), None)
    assert(viaInstant._1.size == 4, "a mis-unit bound must keep every file")
  }
}
