package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Time-series / event-stream operators over the `events` table — the
  * batch expressions of the Structured Streaming surface (the streaming
  * twins live in graft.streaming and are exercised by tests; the batch
  * forms here are what the DuckDB oracle can check).
  *
  * Parity note: timestamps are compared in integer microseconds
  * (`unix_micros` ↔ `epoch_us`) and rendered as strings — raw
  * timestamp columns never leave a query.
  */
object EventOps {

  /** Normalize a raw events `ts` column to a µs-precision TIMESTAMP
    * regardless of how the fixture writer encoded it — the encoding has
    * changed across driver testdata generations, and the operators must
    * not care:
    *  - TIMESTAMP(NANOS) parquet read as long nanos
    *    (spark.sql.legacy.parquet.nanosAsLong) → truncate to µs;
    *  - TIMESTAMP_NTZ (a µs writer without timezone metadata) →
    *    reinterpret the wall clock as UTC. Every graft session pins
    *    spark.sql.session.timeZone=UTC, so the cast is
    *    instant-preserving and byte-identical to DuckDB's epoch_us on
    *    the same file;
    *  - TIMESTAMP → already what we want.
    * Works on batch and streaming frames alike (pass the batch-read
    * schema's ts type for a readStream frame). */
  private[graft] def normalizeTs(df: DataFrame,
      dt: org.apache.spark.sql.types.DataType): DataFrame = dt match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  /** events with `ts` normalized to a µs-precision timestamp (see
    * [[normalizeTs]]). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    normalizeTs(raw, raw.schema("ts").dataType)
  }

  /** Tumbling 1-hour window aggregation. */
  val eventsTumbling: Q = (s, dir) =>
    events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_c"),
        countDistinct(col("user_id")).as("n_users"))

  /** Sessionization: a new session starts after a >30 min gap; per-user
    * session counts. Exact integer-microsecond gap arithmetic. */
  val eventsSessionize: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("new_s")).cast("long").as("n_sessions"))
  }

  /** Spark's native `session_window` operator (dynamic-gap session
    * aggregation inside groupBy — the built-in alternative to the
    * hand-rolled lag/cumsum in [[eventsSessionize]] and the
    * mapGroupsWithState machine in the stream twin). Boundary contract
    * differs from eventsSessionize's: session_window merges an event
    * iff it starts STRICTLY before the current session end (last + gap),
    * so a gap of exactly 30 min starts a NEW session here (vs `>` =
    * same session there) — the oracle mirrors the `>=` convention.
    * Parity: session start is emitted as exact integer microseconds
    * (min event ts of the session), never a raw timestamp. */
  val eventsSessionWindow: Q = (s, dir) =>
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_c"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("value_c"))

  /** Per-day × event-type pivot. */
  val eventsPivotType: Q = (s, dir) =>
    events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnRenamed("click", "n_click").withColumnRenamed("error", "n_error")
      .withColumnRenamed("purchase", "n_purchase").withColumnRenamed("signup", "n_signup")
      .withColumnRenamed("view", "n_view")

  /** Top-N users by purchase value with deterministic ranking.
    *
    * Scale shape: `orderBy(...).limit(10)` plans as
    * `TakeOrderedAndProject` — per-partition top-10 then a 10-row merge
    * on the driver. The rank window runs AFTER the limit, over the 10
    * surviving rows only. (The previous form ranked with an
    * unpartitioned `Window.orderBy`, which funnels every per-user
    * aggregate through one task — a bottleneck at hundreds of millions
    * of users.) */
  val eventsTopUsers: Q = (s, dir) => {
    val w = Window.orderBy(col("purchase_c").desc, col("user_id")) // ≤10 rows
    events(s, dir).filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(cents(col("value"))).as("purchase_c"), count(lit(1)).as("n_purchases"))
      .orderBy(col("purchase_c").desc, col("user_id"))
      .limit(10)
      .withColumn("rk", row_number().over(w).cast("long"))
  }

  /** Hopping (sliding) 1-hour window with a 30-minute slide: each event
    * lands in two windows. Spark's window() generates the assignment;
    * the oracle mirrors it by exploding each event into its two hop
    * starts. Rendered as strings for parity. */
  val eventsHopping: Q = (s, dir) =>
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("w_start"),
        col("n"), col("value_c"))

  /** As-of join — for each purchase, the latest signup of the same user
    * at or before it. Spark has no ASOF JOIN operator; the scalable
    * re-expression is a single window pass over the unioned, user-
    * partitioned, time-ordered stream carrying the last-seen signup
    * forward (`last(..., ignoreNulls)`) — one shuffle on user_id, no
    * range-join explosion. (SURVEY §2.3: as-of joins only as extension.) */
  val asofJoinSignup: Q = (s, dir) => {
    val ev = events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_signup_us",
        last(when(col("event_type") === "signup", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("last_signup_id"),
        (col("us") - col("last_signup_us")).as("gap_us"))
  }

  /** The same as-of semantics through the custom Catalyst operator
    * ([[graft.plans.AsOfJoinExec]]): one shuffle per side + linear
    * partition-local merge instead of a window buffer. Falls back to
    * the window form when the strategy isn't registered. Shares the
    * asof_join_signup oracle semantics. */
  val asofJoinCustom: Q = (s, dir) => {
    val registered = s.sessionState.planner.strategies
      .exists(_ eq graft.plans.AsOfJoinStrategy)
    if (!registered) asofJoinSignup(s, dir)
    else {
      val ev = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_event_id"), col("user_id").as("s_user_id"),
          col("us").as("s_us"))
      graft.plans.AsOf.join(purchases, signups, "user_id", "s_user_id", "us", "s_us")
        .select(col("event_id"), col("user_id"),
          col("s_event_id").as("last_signup_id"),
          (col("us") - col("s_us")).as("gap_us"))
    }
  }

  /** FORWARD as-of — for each signup, the time to the user's NEXT
    * purchase at-or-after it (conversion latency), null if they never
    * convert. Through [[graft.plans.AsOf.joinForward]] (the negated
    * backward exec) when the strategy is registered; the scalable
    * fallback is the value-RANGE window `min(purchase us) OVER
    * (ORDER BY us RANGE CURRENT ROW .. UNBOUNDED FOLLOWING)` — a
    * value frame, not ROWS, so a purchase at the signup's exact
    * microsecond counts in both forms (the exec's eligibility is
    * rt >= lt by time alone). Output carries the GAP, not the
    * purchase id: under exact-time ties any eligible choice yields
    * the same gap, keeping both engines and both forms
    * deterministic. */
  val asofJoinForward: Q = (s, dir) => {
    val registered = s.sessionState.planner.strategies
      .exists(_ eq graft.plans.AsOfJoinStrategy)
    val ev = events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("us", unix_micros(col("ts")))
    if (!registered) {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_p",
        min(when(col("event_type") === "purchase", col("us"))).over(w))
        .filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          (col("next_p") - col("us")).as("conv_gap_us"))
    } else {
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("us").as("p_us"))
      graft.plans.AsOf.joinForward(signups, purchases,
        "user_id", "p_user_id", "us", "p_us")
        .select(col("event_id"), col("user_id"),
          (col("p_us") - col("us")).as("conv_gap_us"))
    }
  }

  /** NEAREST as-of — `merge_asof(direction='nearest')`, the remaining
    * direction, as ONE window pass over the user-partitioned stream:
    * the backward carry (`last(..., ignoreNulls)` up to the current
    * row) and the forward value-RANGE `min` ride the SAME partition —
    * no second shuffle, no join of two as-of results. For each signup:
    * the smaller of (gap to latest purchase at-or-before, gap to
    * first purchase at-or-after); an exact |gap| tie prefers BACKWARD
    * (stated contract — pandas leaves it unspecified), which the
    * `<=` in both engines' CASE encodes identically. Null-safe via
    * COALESCE against a sentinel larger than any real gap. */
  val asofJoinNearest: Q = (s, dir) => {
    val Inf = Long.MaxValue
    val ev = events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("us", unix_micros(col("ts")))
    val wBack = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("prev_p",
        last(when(col("event_type") === "purchase", col("us")), ignoreNulls = true)
          .over(wBack))
      .withColumn("next_p",
        min(when(col("event_type") === "purchase", col("us"))).over(wFwd))
      .filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"),
        when(coalesce(col("us") - col("prev_p"), lit(Inf)) <=
          coalesce(col("next_p") - col("us"), lit(Inf)),
          when(col("prev_p").isNotNull, lit("b")))
          .otherwise(lit("f")).as("side"),
        least(
          coalesce(col("us") - col("prev_p"), lit(Inf)),
          coalesce(col("next_p") - col("us"), lit(Inf))).cast("long")
          .as("nearest_raw"))
      .select(col("event_id"), col("user_id"),
        when(col("nearest_raw") < Inf, col("side")).as("side"),
        when(col("nearest_raw") < Inf, col("nearest_raw")).as("nearest_gap_us"))
  }

  /** Tolerance-bounded as-of — pandas `merge_asof(tolerance=...)`: a
    * purchase only attributes to a signup within ONE HOUR before it.
    * Composed over either as-of form (the custom exec when registered,
    * the window idiom otherwise) as a pure null-out Project: the as-of
    * already found the LATEST signup ≤ the purchase, so a too-stale
    * match proves no in-tolerance match exists. Both the matched and
    * the nulled-out shapes occur on the fixture, which the oracle hash
    * certifies. */
  val asofJoinTolerance: Q = (s, dir) => {
    val TolUs = 3600000000L // 1 hour in microseconds
    val base = asofJoinCustom(s, dir) // (event_id, user_id, last_signup_id, gap_us)
    val stale = col("gap_us").isNull || col("gap_us") > lit(TolUs)
    base.select(col("event_id"), col("user_id"),
      when(stale, lit(null).cast("long")).otherwise(col("last_signup_id"))
        .as("signup_id_1h"),
      when(stale, lit(null).cast("long")).otherwise(col("gap_us")).as("gap_us_1h"))
  }

  /** Ordered funnel (first view → first click → first purchase): one
    * row of stage counts. Per-user stage times are a single grouped
    * aggregation (map-side partial min per type — one shuffle on
    * user_id); the strict time ordering then collapses to three global
    * counts. Integer-microsecond comparisons only — no float drift. */
  val eventsFunnel: Q = (s, dir) => {
    val perUser = events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("us"))).as("t_view"),
        min(when(col("event_type") === "click", col("us"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("us"))).as("t_purchase"))
    perUser.agg(
      count(when(col("t_view").isNotNull, 1)).as("n_view"),
      count(when(col("t_view") < col("t_click"), 1)).as("n_view_click"),
      count(when(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"), 1))
        .as("n_view_click_purchase"))
  }

  /** Cohort retention: cohort = a user's first active day; count
    * distinct users active at each (cohort_day, day_offset). Two
    * user_id-clustered shuffles (cohort assignment, then the
    * distinct-count) — the standard retention-matrix plan. Day math on
    * DATEs, offsets as exact integers. */
  val eventsRetention: Q = (s, dir) => {
    val withDay = events(s, dir)
      .withColumn("day", to_date(date_format(col("ts"), "yyyy-MM-dd")))
    val cohort = withDay.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    withDay.join(cohort, "user_id")
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Hourly volume anomalies per event type: z-score of each hour's
    * count against the type's own hourly distribution. Cross-engine
    * determinism without trusting either engine's stddev accumulation
    * order: the variance is spelled out from EXACT integer window sums
    * (Σn, Σn², H) with an identical handful of IEEE double operations
    * on both sides — the same expression tree, so bit-equal before the
    * round-6. Degenerate partitions (zero variance) pin z to 0. One
    * grouped count + one partition window — two shuffles, both on
    * event_type, the 100 TB-safe shape (types are few; the window
    * state per type is its hour list, bounded by the calendar). */
  val eventsHourlyAnomaly: Q = (s, dir) => {
    val hourly = events(s, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
    hourly
      .withColumn("h", count(lit(1)).over(w))
      .withColumn("sum_n", sum(col("n")).over(w))
      .withColumn("sum_n2", sum(col("n") * col("n")).over(w))
      .withColumn("mean", col("sum_n").cast("double") / col("h"))
      .withColumn("variance",
        (col("sum_n2").cast("double") - col("sum_n").cast("double") * col("sum_n") / col("h"))
          / (col("h") - 1))
      .withColumn("z6",
        when(col("variance") <= 0, lit(0.0))
          .otherwise(round((col("n").cast("double") - col("mean")) / sqrt(col("variance")), 6)))
      .select(col("event_type"), col("hour"), col("n"), col("z6"))
  }

  /** The STATEFUL streaming topology surfaced into the CORRECTNESS
    * gate — the third stream-twin family after the stream-static index
    * probe and the stateless broadcast screen: EXECUTES
    * [[graft.streaming.EventStreams.sessionize]] (a mapGroupsWithState
    * session state machine) as a real streaming query over a
    * file-source stream of the events table, memory sink in Update
    * mode. Update rows are cumulative per user, so the per-user MAX is
    * the final total — identical to the batch window/lag form and its
    * oracle (shared SQL). Depends on the round-5 µs-fidelity fix in
    * the state machine (ms-truncated arithmetic can flip a session
    * boundary that a gap exceeds by under 1 ms) — latent on this
    * corpus (verified: zero boundary flips at sf0.01), so the
    * deterministic sub-ms fixture in StreamingSpec, not this oracle,
    * is what pins it. */
  val eventsSessionizeStreamTwin: Q = (s, dir) => {
    import graft.streaming.EventStreams
    implicit val sp: SparkSession = s
    import s.implicits._
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    val raw = s.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(raw, sch("ts").dataType)
    val input = norm.select(col("user_id"), col("ts"))
      .as[EventStreams.SessionInput]
    val sink = "graft_sessionize_twin_sink"
    s.catalog.dropTempView(sink)
    val q = EventStreams.sessionize(input).toDF()
      .writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try q.processAllAvailable() finally q.stop()
    // Update-mode rows are cumulative; the per-user max IS the final
    // state (single micro-batch here, but correct under replays too)
    s.table(sink).groupBy("user_id")
      .agg(max(col("n_events")).cast("long").as("n_events"),
        max(col("n_sessions")).cast("long").as("n_sessions"))
  }

  /** The NINTH oracle-checked streaming topology — the SAME session
    * state machine through Spark 4's `transformWithState` (arbitrary
    * stateful processing v2: typed ValueState handles + the RocksDB
    * state store). Runs in a CHILD session because the v2 API requires
    * `RocksDBStateStoreProvider`, and that conf must not leak into the
    * sibling catalog queries sharing the Verify session. Same
    * aggregation-of-update-rows tail and same oracle as
    * `events_sessionize_stream_twin` — one oracle cross-checks the
    * batch window form, the v1 mapGroupsWithState machine, and this
    * v2 processor. */
  val eventsSessionizeTwsTwin: Q = (s, dir) => {
    import graft.streaming.EventStreams
    val ns = s.newSession()
    ns.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sp: SparkSession = ns
    import ns.implicits._
    val sch = ns.read.parquet(s"$dir/events.parquet").schema
    val raw = ns.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(raw, sch("ts").dataType)
    val input = norm.select(col("user_id"), col("ts"))
      .as[EventStreams.SessionInput]
    val sink = "graft_sessionize_tws_sink"
    ns.catalog.dropTempView(sink)
    val q = EventStreams.sessionizeTWS(input).toDF()
      .writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try q.processAllAvailable() finally q.stop()
    ns.table(sink).groupBy("user_id")
      .agg(max(col("n_events")).cast("long").as("n_events"),
        max(col("n_sessions")).cast("long").as("n_sessions"))
  }

  /** The windowed-aggregation streaming topology surfaced into the
    * CORRECTNESS gate — COMPLETE output mode re-emits the whole hourly
    * table each micro-batch, so the final sink equals the batch
    * aggregate with no watermark-finalization gymnastics. Carries
    * [[eventsTumbling]]'s hour bucketing and exact-cents sum; its
    * COUNT(DISTINCT user_id) column stays batch-only (distinct
    * aggregation is unsupported over streams), so this entry has its
    * own oracle = the tumbling oracle minus that column. */
  val eventsTumblingStreamTwin: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(stream, sch("ts").dataType)
    val sink = "graft_events_tumbling_sink"
    s.catalog.dropTempView(sink)
    val q = graft.streaming.EventStreams.hourlyTotals(norm)
      .writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
  }

  /** Event-type transition matrix (first-order Markov): per user the
    * stream orders by (ts, event_id), each consecutive pair is a
    * transition, and the matrix carries counts plus the per-source
    * transition probability. One user-keyed window (per-user
    * partitions — high cardinality, skew-free) then two tiny
    * aggregations over the |types|² matrix; p6 is a single division
    * of exact counts. The funnel/retention queries tell you WHETHER
    * users convert — this tells you where the paths actually go. */
  val eventsPathTransitions: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    val cells = trans.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("from_type").agg(count(lit(1)).as("n_from"))
    cells.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p6"))
  }

  /** The SEVENTH oracle-checked streaming topology — stream-stream
    * interval join (view→click attribution within 30 min per user),
    * run as a real file-source → memory-sink query. Both sides are
    * watermarked and the join condition carries the time bound (state
    * expiry); over the finite source the append-mode inner join equals
    * the batch interval join, which is the DuckDB oracle (epoch_us
    * arithmetic — µs-exact on both engines). See
    * [[graft.streaming.EventStreams.attributionJoin]]. */
  val eventsJoinStreamTwin: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(stream, sch("ts").dataType)
    val sink = "graft_events_join_sink"
    s.catalog.dropTempView(sink)
    val q = graft.streaming.EventStreams.attributionJoin(norm)
      .writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
  }

  /** The EIGHTH oracle-checked streaming topology — watermark-bounded
    * streaming dedup (`dropDuplicatesWithinWatermark`), the one
    * stateful-dedup operator the topology set lacked (the incremental
    * band-index twin dedups against a STATIC index; this one carries
    * pure in-stream key state with time-based eviction). Rows carry
    * only the dedup key columns, so append-mode output == the distinct
    * (hour, user_id, event_type) triples == the DuckDB oracle. See
    * [[graft.streaming.EventStreams.hourlyUserTypeDedup]]. */
  val eventsDedupStreamTwin: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(stream, sch("ts").dataType)
    val sink = "graft_events_dedup_sink"
    s.catalog.dropTempView(sink)
    val q = graft.streaming.EventStreams.hourlyUserTypeDedup(norm)
      .writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
  }

  /** The TENTH oracle-checked streaming topology — a streaming
    * frequent-items screen: per-hour Misra–Gries sketch state (native
    * `mg_sketch` TypedImperativeAggregate inside a complete-mode
    * streaming aggregation), then an exact batch recount of the
    * emitted candidates. Oracle-expressible because the MG inclusion
    * theorem — every item above N_h/(k+1) survives the sketch — holds
    * regardless of arrival order, micro-batch boundaries, or partition
    * merges, so the recounted output thresholded at N_h/32 equals the
    * batch exact per-hour heavy hitters whatever path the stream took
    * (k = 64 ≥ 32, the same coupling as `text_heavy_hitters_mg`).
    * Degrades to exact streaming (hour, item) counts as candidates
    * when the extension is absent. */
  val eventsHeavyHittersStreamTwin: Q = (s, dir) => {
    import graft.streaming.EventStreams
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(stream, sch("ts").dataType)
    val sink = "graft_events_hh_sink"
    s.catalog.dropTempView(sink)
    val (streamed, extract) =
      if (s.catalog.functionExists("mg_sketch"))
        (EventStreams.hourlyFrequentItems(norm, TextOps.HhSketchK),
          (t: DataFrame) => t.select(col("hour"),
            explode(map_keys(col("sk"))).as("item")))
      else
        (EventStreams.hourlyItemCounts(norm),
          (t: DataFrame) => t.select("hour", "item"))
    val q = streamed.writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val cand = extract(s.table(sink))
    val items = EventStreams.eventItems(events(s, dir))
      .select(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("item"))
    val totals = items.groupBy("hour").agg(count(lit(1)).as("n_h"))
    items.join(broadcast(cand), Seq("hour", "item"))
      .groupBy("hour", "item").agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("hour"))
      .filter(col("cnt") * TextOps.HhThreshold >= col("n_h"))
      .select("hour", "item", "cnt", "n_h")
  }

  /** Changelog compaction — latest state per key, the CDC kernel that
    * turns an append-only event log back into a snapshot (Kafka
    * log-compaction / Debezium "last image wins" semantics; also the
    * read side of every incremental-materialization pipeline). The
    * events table is read as a changelog keyed by user_id, versioned
    * by (ts, event_id) — event_id breaks same-microsecond ties, so the
    * winner is total-order deterministic on both engines.
    *
    * Shape: groupBy(key).max(struct(version, payload)) — ONE partial
    * aggregation, map-side combined, shuffle bounded by DISTINCT KEYS
    * not log length. Deliberately NOT a row_number window: an equi-agg
    * is AQE-splittable on a skewed key while a window partition is not
    * (the dedup_paragraph doctrine), and at 100 TB a changelog's key
    * skew (one hot entity) is the norm. Struct max compares fields
    * lexicographically; (us, event_id) is unique, so the payload
    * fields behind them never arbitrate.
    *
    * The transform is [[graft.streaming.EventStreams.latestPerKey]] —
    * ONE definition executed by both this batch entry and the stream
    * twin, so "stream == batch" cannot drift out from under the
    * shared oracle by an edit to one copy. */
  val cdcChangelogCompact: Q = (s, dir) =>
    graft.streaming.EventStreams.latestPerKey(events(s, dir))

  /** Salted two-stage twin of [[cdcChangelogCompact]] — the plan for
    * the changelog whose key skew AQE can't fully save (one entity
    * receiving millions of updates; even a split equi-agg leaves the
    * partial-merge of that key's splits on one task): stage 1 groups
    * on (key, salt = version-hash mod 16) so the hot key's partials
    * spread across 16 tasks; stage 2 max-merges the ≤16 survivors per
    * key. EXACT by max's associativity — any grouping of the rows
    * yields the same maximum — so the twin shares the oracle verbatim
    * and "salted ≡ unsalted" is a driver-gate theorem (the
    * `token_doc_freq_salted` pattern applied to struct-max). The salt
    * must key on a CHANGE attribute (version), never the key alone —
    * salting by key-hash would put the hot key's rows back on one
    * salt. */
  val cdcChangelogCompactSalted: Q = (s, dir) =>
    events(s, dir)
      .select(col("user_id"),
        struct(
          unix_micros(col("ts")).as("us"),
          col("event_id"),
          col("event_type"),
          cents(col("value")).as("value_c")).as("v"))
      .withColumn("salt", pmod(xxhash64(col("v.event_id")), lit(16L)))
      .groupBy("user_id", "salt").agg(max(col("v")).as("pv"))
      .groupBy("user_id").agg(max(col("pv")).as("last"))
      .select(col("user_id"),
        col("last.us").as("last_us"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value_c").as("last_value_c"))

  /** SCD type-2 expansion — the inverse of [[cdcChangelogCompact]]:
    * every change becomes a validity interval [valid_from, valid_to)
    * with an open-ended current row, the shape warehouse dimensions
    * keep history in (Kimball SCD2). valid_to is the NEXT change's
    * timestamp via lead() over a PER-KEY window — windows partitioned
    * by a high-cardinality key are the sanctioned kind (state is one
    * key's rows, never a global sort; contrast the banned
    * Window.orderBy-global shapes in PLANS_r5). Exact integer
    * microseconds cross the engines; the open interval is NULL (the
    * driver hashes nulls fine — `null_handling` pins that). */
  val cdcScd2Intervals: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Point-in-time (AS OF) read over the SCD2 intervals — the query
    * side the validity-interval layout exists for: the state of every
    * key at time T is the ONE interval containing T
    * (valid_from ≤ T < valid_to, open current interval = +∞). T here
    * is the fixture's exact midpoint ((min+max) DIV 2 of the
    * microsecond range — integer-exact on both engines, stable across
    * fixture regenerations), broadcast as a 1-row aggregate. Scale
    * shape: a map-side range filter over the interval table — no join,
    * no window; at 100 TB an interval table partitioned on
    * valid_from date ranges additionally prunes most partitions for
    * any given T. */
  val cdcScd2Asof: Q = (s, dir) => {
    val scd = cdcScd2Intervals(s, dir)
    val tRow = events(s, dir)
      .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2").as("t_us"))
    scd.crossJoin(broadcast(tRow))
      .filter(col("valid_from_us") <= col("t_us") &&
        (col("valid_to_us").isNull || col("valid_to_us") > col("t_us")))
      .select(col("user_id"),
        col("event_id").as("live_event_id"),
        col("event_type").as("live_event_type"),
        col("valid_from_us"), col("t_us"))
  }

  /** The TWELFTH streaming topology, surfaced into the gate: executes
    * [[graft.streaming.EventStreams.latestPerKey]] as a real
    * Structured Streaming query (file-source events stream, stateful
    * complete-mode max(struct) aggregation, memory sink) and shares
    * [[cdcChangelogCompact]]'s oracle VERBATIM — so "the compacted
    * view a stream maintains equals the batch compaction of the same
    * log" is a driver-gate theorem, independent of micro-batch
    * boundaries and state-merge order. */
  val cdcCompactStreamTwin: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val norm = normalizeTs(stream, sch("ts").dataType)
    val sink = "graft_cdc_compact_sink"
    s.catalog.dropTempView(sink)
    val q = graft.streaming.EventStreams.latestPerKey(norm)
      .writeStream.format("memory").queryName(sink)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
  }

  val queries: Seq[(String, Q)] = Seq(
    "events_tumbling" -> eventsTumbling,
    "cdc_changelog_compact" -> cdcChangelogCompact,
    "cdc_changelog_compact_salted" -> cdcChangelogCompactSalted,
    "cdc_scd2_intervals" -> cdcScd2Intervals,
    "cdc_scd2_asof" -> cdcScd2Asof,
    "cdc_compact_stream_twin" -> cdcCompactStreamTwin,
    "events_dedup_stream_twin" -> eventsDedupStreamTwin,
    "events_heavy_hitters_stream_twin" -> eventsHeavyHittersStreamTwin,
    "events_tumbling_stream_twin" -> eventsTumblingStreamTwin,
    "events_join_stream_twin" -> eventsJoinStreamTwin,
    "events_path_transitions" -> eventsPathTransitions,
    "events_hourly_anomaly" -> eventsHourlyAnomaly,
    "events_sessionize" -> eventsSessionize,
    "events_session_window" -> eventsSessionWindow,
    "events_sessionize_stream_twin" -> eventsSessionizeStreamTwin,
    "events_sessionize_tws_twin" -> eventsSessionizeTwsTwin,
    "events_pivot_type" -> eventsPivotType,
    "events_top_users" -> eventsTopUsers,
    "events_hopping" -> eventsHopping,
    "events_funnel" -> eventsFunnel,
    "events_retention" -> eventsRetention,
    "asof_join_signup" -> asofJoinSignup,
    "asof_join_custom" -> asofJoinCustom,
    "asof_join_tolerance" -> asofJoinTolerance,
    "asof_join_forward" -> asofJoinForward,
    "asof_join_nearest" -> asofJoinNearest)

  /** Shared by `events_sessionize` and its stateful stream twin. */
  private val sessionizeOracleSql: String =
    """WITH x AS (
         SELECT user_id, epoch_us(ts) AS us,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         FROM events)
       SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
       FROM x GROUP BY user_id"""

  /** Shared by `cdc_changelog_compact` and its streaming twin — one
    * oracle, two execution paths, stream == batch == oracle. */
  private val cdcCompactOracleSql: String =
    """WITH v AS (
         SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
           CAST(round(value*100) AS BIGINT) AS value_c,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
         FROM events)
       SELECT user_id, us AS last_us, event_id AS last_event_id,
         event_type AS last_event_type, value_c AS last_value_c
       FROM v WHERE rn = 1"""

  val oracles: Seq[(String, String)] = Seq(
    "cdc_changelog_compact" -> cdcCompactOracleSql,
    "cdc_changelog_compact_salted" -> cdcCompactOracleSql,
    "cdc_compact_stream_twin" -> cdcCompactOracleSql,
    "cdc_scd2_asof" ->
      """WITH scd AS (
           SELECT user_id, event_id, event_type,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS valid_to_us
           FROM events),
         tt AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS t_us
                FROM events)
         SELECT s.user_id, s.event_id AS live_event_id,
           s.event_type AS live_event_type, s.valid_from_us, tt.t_us
         FROM scd s, tt
         WHERE s.valid_from_us <= tt.t_us
           AND (s.valid_to_us IS NULL OR s.valid_to_us > tt.t_us)""",
    "cdc_scd2_intervals" ->
      """SELECT user_id, event_id, event_type,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS valid_to_us,
           (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) IS NULL)
             AS is_current
         FROM events""",
    "events_tumbling" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c,
         COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1""",
    "events_tumbling_stream_twin" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY 1""",
    // exact per-hour heavy hitters over the derived item stream — the
    // MG inclusion theorem makes the streaming sketch + batch recount
    // equal this regardless of the stream's arrival/merge order
    "events_heavy_hitters_stream_twin" ->
      s"""WITH it AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
               CASE WHEN u < 512 THEN 'hot_' || CAST(u // 64 AS VARCHAR)
                    ELSE 'rare_' || CAST(u AS VARCHAR) END AS item
             FROM (SELECT ts, CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))
                     AS BIGINT) % 1024 AS u FROM events)),
          nh AS (SELECT hour, COUNT(*) AS n_h FROM it GROUP BY hour)
          SELECT i.hour, i.item, COUNT(*) AS cnt, n.n_h
          FROM it i JOIN nh n ON i.hour = n.hour
          GROUP BY 1, 2, 4 HAVING COUNT(*) * ${TextOps.HhThreshold} >= n.n_h""",
    // batch interval join == the append-mode stream-stream inner join
    // over the finite source; epoch_us matches Spark's unix_micros
    "events_join_stream_twin" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us, user_id, event_type FROM events),
         v AS (SELECT event_id AS view_id, us AS v_us, user_id FROM e WHERE event_type = 'view'),
         c AS (SELECT event_id AS click_id, us AS c_us, user_id FROM e WHERE event_type = 'click')
         SELECT v.view_id, c.click_id, v.user_id,
           CAST(c.c_us - v.v_us AS BIGINT) AS delta_us
         FROM v JOIN c ON v.user_id = c.user_id
           AND c.c_us > v.v_us AND c.c_us <= v.v_us + 1800000000""",
    // every output column is a dedup key, so the stream's kept-row
    // race is invisible: output == DISTINCT triples
    "events_dedup_stream_twin" ->
      """SELECT DISTINCT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
         user_id, event_type FROM events""",
    "events_path_transitions" ->
      """WITH seq AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS to_type
           FROM events),
         trans AS (SELECT from_type, to_type FROM seq WHERE to_type IS NOT NULL),
         cells AS (SELECT from_type, to_type, COUNT(*) AS n FROM trans GROUP BY 1, 2),
         totals AS (SELECT from_type, COUNT(*) AS n_from FROM trans GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n,
           round(CAST(c.n AS DOUBLE) / t.n_from, 6) AS p6
         FROM cells c JOIN totals t ON c.from_type = t.from_type""",
    "events_hourly_anomaly" ->
      """WITH hourly AS (
           SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         win AS (
           SELECT event_type, hour, n,
             COUNT(*) OVER (PARTITION BY event_type) AS h,
             SUM(n) OVER (PARTITION BY event_type) AS sum_n,
             SUM(n * n) OVER (PARTITION BY event_type) AS sum_n2
           FROM hourly),
         stats AS (
           SELECT event_type, hour, n,
             CAST(sum_n AS DOUBLE) / h AS mean,
             (CAST(sum_n2 AS DOUBLE) - CAST(sum_n AS DOUBLE) * sum_n / h) / (h - 1) AS variance
           FROM win)
         SELECT event_type, hour, n,
           CASE WHEN variance <= 0 THEN CAST(0 AS DOUBLE)
                ELSE round((CAST(n AS DOUBLE) - mean) / sqrt(variance), 6) END AS z6
         FROM stats""",
    "events_sessionize" -> sessionizeOracleSql,
    // gaps-and-islands mirror of session_window: new session iff the
    // gap is >= 30 min (session_window's strict-before merge rule)
    "events_session_window" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(ts) AS us, value,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         flagged AS (
           SELECT user_id, event_id, us, value,
             CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM x),
         sess AS (
           SELECT user_id, us, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagged)
         SELECT user_id, CAST(MIN(us) AS BIGINT) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
         FROM sess GROUP BY user_id, sid""",
    // the stateful stream twin computes the SAME per-user totals
    // through the mapGroupsWithState machine — one oracle text
    "events_sessionize_stream_twin" -> sessionizeOracleSql,
    // v2 (transformWithState) machine — same totals, same oracle text
    "events_sessionize_tws_twin" -> sessionizeOracleSql,
    "events_pivot_type" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
         COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
         COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
         FROM events GROUP BY 1""",
    "events_top_users" ->
      """SELECT user_id, purchase_c, n_purchases, rk FROM (
           SELECT user_id, purchase_c, n_purchases,
             row_number() OVER (ORDER BY purchase_c DESC, user_id) AS rk
           FROM (
             SELECT user_id,
               CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS purchase_c,
               COUNT(*) AS n_purchases
             FROM events WHERE event_type = 'purchase' GROUP BY user_id))
         WHERE rk <= 10""",
    "events_hopping" ->
      // each event belongs to the hops starting at floor(t/1800)*1800
      // and that minus 1800, intersected with 1-hour window length
      """WITH hops AS (
           SELECT epoch_us(ts) AS us, CAST(round(value*100) AS BIGINT) AS v_c,
             unnest(ARRAY[
               (epoch_us(ts) // 1800000000) * 1800000000,
               (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000]) AS w_us
           FROM events)
         SELECT strftime(make_timestamp(w_us), '%Y-%m-%d %H:%M') AS w_start,
           COUNT(*) AS n, CAST(SUM(v_c) AS BIGINT) AS value_c
         FROM hops WHERE us - w_us < 3600000000 AND us >= w_us
         GROUP BY w_us""",
    "events_funnel" ->
      """WITH per_user AS (
           SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
           FROM events GROUP BY user_id)
         SELECT
           COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
           COUNT(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
           COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END)
             AS n_view_click_purchase
         FROM per_user""",
    "events_retention" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
         SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(datediff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
           COUNT(DISTINCT d.user_id) AS n_users
         FROM d JOIN cohort c ON d.user_id = c.user_id
         GROUP BY 1, 2""",
    "asof_join_signup" -> asofOracleSql,
    "asof_join_custom" -> asofOracleSql,
    // same marked CTE; the CASE's NULL side mirrors the null-out
    // Project (a NULL last_signup_us makes the subtraction NULL, and
    // NULL <= tol is NULL → CASE yields NULL — exactly "stale")
    "asof_join_tolerance" ->
      """WITH sp AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                     FROM events WHERE event_type IN ('signup', 'purchase')),
         marked AS (
           SELECT event_id, user_id, event_type, us,
             last(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id,
             last(CASE WHEN event_type = 'signup' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
           FROM sp)
         SELECT event_id, user_id,
           CASE WHEN us - last_signup_us <= 3600000000 THEN last_signup_id END
             AS signup_id_1h,
           CASE WHEN us - last_signup_us <= 3600000000 THEN us - last_signup_us END
             AS gap_us_1h
         FROM marked WHERE event_type = 'purchase'""",
    // a VALUE frame (RANGE, not ROWS) so a purchase at the signup's
    // exact microsecond is eligible — matching the exec's rt >= lt
    "asof_join_forward" ->
      """WITH sp AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                     FROM events WHERE event_type IN ('signup', 'purchase')),
         marked AS (
           SELECT event_id, user_id, event_type, us,
             min(CASE WHEN event_type = 'purchase' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
           FROM sp)
         SELECT event_id, user_id, next_p - us AS conv_gap_us
         FROM marked WHERE event_type = 'signup'""",
    // both directions in ONE window pass; |gap| ties prefer backward
    // (the <= in both engines); the Long.MaxValue sentinel only ever
    // compares, never escapes (masked by the outer CASE)
    "asof_join_nearest" ->
      """WITH sp AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                     FROM events WHERE event_type IN ('signup', 'purchase')),
         marked AS (
           SELECT event_id, user_id, event_type, us,
             last(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
             min(CASE WHEN event_type = 'purchase' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
           FROM sp),
         g AS (SELECT event_id, user_id, prev_p,
             COALESCE(us - prev_p, 9223372036854775807) AS bg,
             COALESCE(next_p - us, 9223372036854775807) AS fg
           FROM marked WHERE event_type = 'signup')
         SELECT event_id, user_id,
           CASE WHEN least(bg, fg) < 9223372036854775807 THEN
             (CASE WHEN bg <= fg THEN 'b' ELSE 'f' END) END AS side,
           CASE WHEN least(bg, fg) < 9223372036854775807 THEN least(bg, fg) END
             AS nearest_gap_us
         FROM g""")

  /** Shared oracle for both as-of formulations (identical semantics). */
  private lazy val asofOracleSql: String =
    """WITH sp AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                   FROM events WHERE event_type IN ('signup', 'purchase')),
       marked AS (
         SELECT event_id, user_id, event_type, us,
           last(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id,
           last(CASE WHEN event_type = 'signup' THEN us END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
         FROM sp)
       SELECT event_id, user_id, last_signup_id, us - last_signup_us AS gap_us
       FROM marked WHERE event_type = 'purchase'"""
}
