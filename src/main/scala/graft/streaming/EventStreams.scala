package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming twins of the batch event operators
  * (graft.ops.EventOps). The reference has no streaming surface
  * (SURVEY §2.11) — this is the §7 extension over the `events` schema:
  * watermarked tumbling windows, streaming dedup, and custom session
  * state via mapGroupsWithState.
  *
  * All transforms are expressed on an unbounded DataFrame with event-time
  * watermarks, so the same code runs over Kafka/files at cluster scale;
  * tests drive them with MemoryStream.
  */
object EventStreams {

  /** Tumbling 1-hour event-time window with a 2-hour watermark:
    * late data beyond the watermark is dropped, state is bounded. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Hourly totals for the COMPLETE-mode oracle twin: the same hour
    * bucketing + exact-cents sum as the batch `events_tumbling`
    * (minus its COUNT(DISTINCT) — distinct aggregation is unsupported
    * over streams; the batch form keeps it). Complete mode re-emits
    * the full result table per micro-batch, so no watermark is needed
    * — at scale this shape suits BOUNDED group counts (hours), while
    * [[tumblingCounts]] with its watermark is the unbounded-key form. */
  def hourlyTotals(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"),
        sum((round(col("value") * 100, 0)).cast("long")).as("value_c"))

  /** Streaming latest-state-per-key — the CDC compaction kernel
    * ([[graft.ops.EventOps.cdcChangelogCompact]]) run AS the changelog
    * arrives: a stateful max(struct(version, payload)) aggregation
    * whose per-key state is exactly ONE struct (the current winner),
    * merged associatively across micro-batches — the log-compacted
    * materialized view Kafka Streams' KTable is. Complete mode here
    * (the twin's key space is the bounded user set and the memory sink
    * wants the whole table); at scale the same aggregation runs in
    * Update mode emitting only keys whose winner changed — a changelog
    * of the changelog — into an upsert sink. Struct max is
    * arrival-order-free, so stream == batch holds whatever the
    * micro-batch boundaries did, which is what the shared oracle pins. */
  def latestPerKey(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(
          unix_micros(col("ts")).as("us"),
          col("event_id"),
          col("event_type"),
          round(col("value") * 100, 0).cast("long").as("value_c")).as("v"))
      .groupBy("user_id").agg(max(col("v")).as("last"))
      .select(col("user_id"),
        col("last.us").as("last_us"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value_c").as("last_value_c"))

  /** Deterministic skewed item per event — 8 hot items (~6.25% of the
    * stream each) + a ~512-item rare tail, derived from the event_id's
    * md5 exactly like `TextOps.hhItems` derives document items (the
    * fixture has no natural high-cardinality skewed column). Pure
    * column ops, so the same derivation runs on the batch recount side
    * and inside the DuckDB oracle. */
  def eventItems(events: DataFrame): DataFrame =
    events
      .withColumn("u", pmod(expr(
        "cast(conv(substring(md5(cast(event_id as string)), 1, 13), 16, 10) as bigint)"),
        lit(1024L)))
      .withColumn("item",
        when(col("u") < 512, concat(lit("hot_"), expr("cast(u div 64 as string)")))
          .otherwise(concat(lit("rare_"), col("u").cast("string"))))

  /** Streaming frequent-items screen — per-hour Misra–Gries sketch
    * state: the native `mg_sketch` TypedImperativeAggregate runs INSIDE
    * a complete-mode streaming aggregation, so the k counters per hour
    * are exactly what the state store persists between micro-batches.
    * Complete mode because hour groups are bounded (the
    * [[hourlyTotals]] rationale). The caller recounts the emitted
    * candidates in batch: MG's inclusion guarantee is independent of
    * arrival order, micro-batch boundaries, and partition merges, so
    * the recounted, thresholded result is exact whatever path the
    * stream took. */
  def hourlyFrequentItems(events: DataFrame, k: Int): DataFrame =
    eventItems(events)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(expr(s"mg_sketch(item, $k)").as("sk"))

  /** Extension-free degradation of [[hourlyFrequentItems]]: exact
    * streaming per-(hour, item) counts as the candidate set —
    * unbounded-key in principle, bounded here, same downstream
    * recount. */
  def hourlyItemCounts(events: DataFrame): DataFrame =
    eventItems(events)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("item"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup by event_id within the watermark horizon —
    * the streaming form of exact dedup (bounded state; at 100 TB/day the
    * horizon bounds the dedup state size). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  case class SessionInput(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(nEvents: Long, nSessions: Long, lastUs: Long)
  case class SessionUpdate(user_id: Long, n_events: Long, n_sessions: Long)

  /** Custom sessionization state machine via mapGroupsWithState — the
    * streaming twin of EventOps.eventsSessionize (>30 min gap starts a
    * new session). NoTimeout keeps micro-batches data-driven; a
    * production deployment bounding state for dead users would switch to
    * EventTimeTimeout + withWatermark (timeouts make Spark schedule
    * no-data batches, which is wasteful in a test harness). */
  def sessionize(events: Dataset[SessionInput])(implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          // FULL microsecond fidelity: Timestamp.getTime is ms-truncated,
          // so ms*1000 alone silently drops the sub-ms part — a >30 min
          // gap that exceeds the threshold by under 1 ms would then
          // diverge from the batch twin's unix_micros arithmetic
          // (the sf events carry µs components on ~99.9% of rows; the
          // StreamingSpec sub-ms fixture pins this)
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
          val sorted = rows.toSeq.sortBy(e => micros(e.ts))
          val init = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          val updated = sorted.foldLeft(init) { (st, e) =>
            val us = micros(e.ts)
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > 1800000000L
            SessionState(st.nEvents + 1, st.nSessions + (if (newSession) 1 else 0), us)
          }
          state.update(updated)
          SessionUpdate(userId, updated.nEvents, updated.nSessions)
      }
  }

  /** The sessionize state machine on Spark 4's `transformWithState` —
    * the successor API to mapGroupsWithState (arbitrary stateful
    * processing v2): typed state handles (`ValueState` here; List/Map
    * state and per-key timers exist for richer machines) registered in
    * `init` against the StatefulProcessorHandle, per-key TTL support,
    * and a RocksDB-backed state store requirement that is exactly the
    * 100 TB posture — state lives off-heap/on-disk per partition
    * instead of in executor heap. Same session arithmetic as
    * [[sessionize]] (µs fidelity, >30 min gap) so the two APIs are
    * cross-checked against ONE oracle. */
  class SessionizeProcessor extends StatefulProcessor[Long, SessionInput, SessionUpdate] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[SessionInput],
        timerValues: TimerValues): Iterator[SessionUpdate] = {
      def micros(t: java.sql.Timestamp): Long =
        t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
      val sorted = rows.toSeq.sortBy(e => micros(e.ts))
      val init0 = if (state.exists()) state.get() else SessionState(0L, 0L, Long.MinValue)
      val updated = sorted.foldLeft(init0) { (st, e) =>
        val us = micros(e.ts)
        val newSession = st.lastUs == Long.MinValue || us - st.lastUs > 1800000000L
        SessionState(st.nEvents + 1, st.nSessions + (if (newSession) 1 else 0), us)
      }
      state.update(updated)
      Iterator.single(SessionUpdate(userId, updated.nEvents, updated.nSessions))
    }
  }

  /** [[sessionize]] through transformWithState. Requires the RocksDB
    * state store provider on the session (the v2 state API does not
    * run on the default HDFS-backed store). */
  def sessionizeTWS(events: Dataset[SessionInput])(implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class AsOfInput(event_id: Long, user_id: Long, event_type: String, us: Long)
  case class AsOfState(lastSignupId: Long, lastSignupUs: Long)
  case class AsOfMatch(event_id: Long, user_id: Long, last_signup_id: Option[Long], gap_us: Option[Long])

  /** Streaming twin of the backward as-of join (EventOps.asofJoinSignup /
    * the AsOfJoinExec batch operator): per-user state carries the latest
    * signup seen; each purchase emits the signup at-or-before it.
    * flatMapGroupsWithState because one micro-batch can hold many
    * purchases per user (mapGroups emits exactly one row per group per
    * batch — wrong shape here).
    *
    * Ordering contract: rows are sorted by (us, event_id) WITHIN each
    * micro-batch (matching the batch form's window order); across
    * batches the state is monotone, so results match batch as long as a
    * user's events don't arrive out of event-time order across batch
    * boundaries — the same horizon a production job would enforce with a
    * watermark on the source. */
  def asofSignup(events: Dataset[AsOfInput])(implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[AsOfState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
          var st = state.getOption.getOrElse(AsOfState(Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[AsOfMatch]
          sorted.foreach { e =>
            if (e.event_type == "signup") {
              st = AsOfState(e.event_id, e.us)
            } else if (e.event_type == "purchase") {
              out += (if (st.lastSignupUs == Long.MinValue)
                AsOfMatch(e.event_id, e.user_id, None, None)
              else
                AsOfMatch(e.event_id, e.user_id, Some(st.lastSignupId),
                  Some(e.us - st.lastSignupUs)))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** STREAM-STREAM interval join — the attribution topology (the
    * seventh and hardest streaming shape: both sides unbounded, state
    * on both sides): each click joins every view by the SAME user in
    * the preceding 30 minutes. Both sides carry event-time watermarks
    * and the join condition carries the time bound, which is what lets
    * Spark expire buffered rows — without the bound the join state
    * grows forever; with it, a view is dropped from state once the
    * click-side watermark passes v_ts + 30 min. Inner joins emit a
    * match the micro-batch both rows are present, so over a finite
    * source the append-mode result equals the batch interval join —
    * the oracle runs exactly that in DuckDB on epoch_us arithmetic
    * (matching Spark's µs-exact timestamp difference).
    *
    * At 100 TB/day: the join keys on user_id (hash-partitioned state),
    * the 30-minute bound caps per-user buffered views, and the 2-hour
    * watermark caps total state by time — the standard attribution
    * topology over Kafka sources. */
  def attributionJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"), col("user_id"))
      .withWatermark("v_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
      .withWatermark("c_ts", "2 hours")
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") > col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("interval 30 minutes"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("delta_us"))
  }

  /** Watermark-bounded streaming dedup via `dropDuplicatesWithinWatermark`
    * — a DIFFERENT state contract from [[dedupedEvents]]'s plain
    * `dropDuplicates`: the dedup keys need not include the event-time
    * column, and a key's state is evicted as soon as the watermark
    * passes its event time + delay, so two occurrences of the same key
    * are collapsed only when they arrive within the watermark horizon
    * of each other — exactly the guarantee an at-least-once upstream
    * (Kafka producer retries, replayed files) needs, with state bounded
    * by time instead of by distinct-key cardinality. Rows are reduced
    * to hour-truncated (hts, user_id, event_type) BEFORE the dedup so
    * every column of the emitted row is part of the key — making the
    * kept-row choice (first arrival, a race across partitions)
    * observationally deterministic: the output is exactly the distinct
    * triples. */
  def hourlyUserTypeDedup(events: DataFrame): DataFrame =
    events
      .withColumn("hts", date_trunc("hour", col("ts")))
      .select("hts", "user_id", "event_type")
      .withWatermark("hts", "2 hours")
      .dropDuplicatesWithinWatermark("hts", "user_id", "event_type")
      .select(date_format(col("hts"), "yyyy-MM-dd HH").as("hour"),
        col("user_id"), col("event_type"))

  /** Wire a streaming query to an in-memory sink (tests) or console. */
  def startToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}
