package graft

import org.apache.spark.sql.functions._

import ops.{EventOps, MigrationOps}

/** Contracts of the CDC family: the join-based MERGE kernel
  * (`cdc_merge_upsert`), changelog compaction (`cdc_changelog_compact`),
  * and SCD2 interval expansion (`cdc_scd2_intervals`). The driver gate
  * pins hash parity with DuckDB; these tests pin the SEMANTICS —
  * cardinality accounting across ops, per-key uniqueness, and the
  * interval-partition invariants an SCD2 consumer relies on.
  */
class CdcSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("merge cardinality: |result| = |snapshot| - deletes + inserts, keys disjoint by op") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("m", pmod(expr(
        "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 13), 16, 10) as bigint)"),
        lit(10L)))
    val nSnap = orders.count()
    val nDel = orders.filter(col("m") === 0).count()
    val nIns = orders.filter(col("m") === 4).count()
    val merged = MigrationOps.queries.toMap.apply("cdc_merge_upsert")(spark, sfDir)
    assert(nDel > 0 && nIns > 0, "fixture hash produced no deletes/inserts — test is vacuous")
    assert(merged.count() == nSnap - nDel + nIns)
    // deleted keys are gone; inserted keys live in the disjoint range with status 'I'
    val delKeys = orders.filter(col("m") === 0).select(col("o_orderkey").as("key"))
    assert(merged.join(delKeys, Seq("key"), "left_semi").count() == 0)
    assert(merged.filter(col("key") >= 10000000L).count() == nIns)
    assert(merged.filter(col("key") >= 10000000L)
      .filter(col("status") =!= "I").count() == 0)
  }

  test("merge payload: updates add exactly 500 cents, untouched rows carry over bit-exact") {
    val snap = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("m", pmod(expr(
        "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 13), 16, 10) as bigint)"),
        lit(10L)))
      .select(col("o_orderkey").as("key"), col("m"),
        round(col("o_totalprice") * 100, 0).cast("long").as("orig_c"))
    val merged = MigrationOps.queries.toMap.apply("cdc_merge_upsert")(spark, sfDir)
    val joined = merged.join(snap, "key")
    assert(joined.filter(col("m").between(1, 3))
      .filter(col("price_c") =!= col("orig_c") + 500L).count() == 0)
    assert(joined.filter(col("m") >= 5)
      .filter(col("price_c") =!= col("orig_c")).count() == 0)
  }

  test("compaction returns one row per key and it is the (ts, event_id)-max version") {
    val compact = EventOps.queries.toMap.apply("cdc_changelog_compact")(spark, sfDir)
    val perKey = compact.groupBy("user_id").count().filter(col("count") > 1)
    assert(perKey.count() == 0)
    // winner check against an independent formulation (window max)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val norm = EventOps.normalizeTs(events, events.schema("ts").dataType)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val expected = norm.groupBy("user_id")
      .agg(max(struct(col("us"), col("event_id"))).as("w"))
      .select(col("user_id"), col("w.event_id").as("exp_event_id"))
    val mismatch = compact.join(expected, "user_id")
      .filter(col("last_event_id") =!= col("exp_event_id"))
    assert(mismatch.count() == 0)
    assert(compact.count() == norm.select("user_id").distinct().count())
  }

  test("SCD2 intervals partition each key's timeline: chained, non-overlapping, one current") {
    val scd = EventOps.queries.toMap.apply("cdc_scd2_intervals")(spark, sfDir)
    // exactly one open (current) interval per key
    val open = scd.filter(col("is_current")).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1L).count() == 0)
    // each closed interval's valid_to is the next interval's valid_from
    // (chain check via self-join on the successor position)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("valid_from_us"), col("event_id"))
    val chained = scd
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us").isNotNull)
    assert(chained.filter(col("valid_to_us") =!= col("next_from")).count() == 0)
    // row-count preserving: every change becomes exactly one interval
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(scd.count() == nEvents)
  }

  test("salted compaction is row-identical to the unsalted plan") {
    // the gate pins this via the shared oracle; pinning it here too
    // means a refactor that breaks the associativity argument fails
    // in seconds, not at the next Verify run
    val a = EventOps.queries.toMap.apply("cdc_changelog_compact")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val b = EventOps.queries.toMap.apply("cdc_changelog_compact_salted")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("the compacted winner is exactly SCD2's open (is_current) row per key") {
    // cross-operator invariant: compaction and SCD2 expansion are two
    // views of one changelog — the latest version equals the one
    // open-ended validity interval
    val compact = EventOps.queries.toMap.apply("cdc_changelog_compact")(spark, sfDir)
      .select(col("user_id"), col("last_event_id"))
    val current = EventOps.queries.toMap.apply("cdc_scd2_intervals")(spark, sfDir)
      .filter(col("is_current"))
      .select(col("user_id"), col("event_id").as("cur_event_id"))
    val joined = compact.join(current, "user_id")
    assert(joined.count() == compact.count())
    assert(joined.filter(col("last_event_id") =!= col("cur_event_id")).count() == 0)
  }

  test("AS OF read returns exactly one live interval per key active at T") {
    val asof = EventOps.queries.toMap.apply("cdc_scd2_asof")(spark, sfDir).cache()
    // one row per user that has any event at-or-before T
    assert(asof.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val t = asof.select("t_us").head().getLong(0)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val norm = EventOps.normalizeTs(events, events.schema("ts").dataType)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val activeUsers = norm.filter(col("us") <= t).select("user_id").distinct().count()
    assert(asof.count() == activeUsers)
    // the live row is the (us, event_id)-max among events at-or-before T
    val expected = norm.filter(col("us") <= t)
      .groupBy("user_id").agg(max(struct(col("us"), col("event_id"))).as("w"))
      .select(col("user_id"), col("w.event_id").as("exp_id"))
    val mismatch = asof.join(expected, "user_id")
      .filter(col("live_event_id") =!= col("exp_id"))
    assert(mismatch.count() == 0)
  }

  test("compact-then-merge composes: compaction output is a legal one-op-per-key batch") {
    // the documented contract that multi-version batches reduce through
    // cdc_changelog_compact before cdc_merge_upsert: post-compaction
    // every key appears once, which is the merge kernel's precondition
    val compact = EventOps.queries.toMap.apply("cdc_changelog_compact")(spark, sfDir)
    assert(compact.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }
}
