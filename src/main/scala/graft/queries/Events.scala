package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}
import graft.streaming.EventStream

/** Event-stream operators over `events` (bigint-nanos timestamps + JSON
  * props): tumbling-window aggregation (batch and Structured Streaming
  * flavors of the same code), JSON extraction, and sessionization via
  * gap-threshold cumulative windows.
  */
object Events {

  private val dec6 = DecimalType(38, 6)

  /** Integer hour bucket from nanos — exact integral division on both
    * engines (double division would round at ~2^60).
    */
  private def hourBucket = expr("ts_ns div 3600000000000").as("hour_bucket")

  /** Sliding-window membership replayed in exact integer microseconds:
    * window starts are the multiples of the 15-min slide in (t − 1h, t].
    */
  private val slidingOracle =
    "WITH e AS (SELECT epoch_ns(ts) // 1000 AS t, event_type, value FROM events), " +
      "w AS (SELECT (900000000 * k) // 1000000 AS start_s, event_type, value " +
      "FROM e, UNNEST(generate_series((t - 3600000000) // 900000000 + 1, " +
      "t // 900000000)) AS u(k)) " +
      "SELECT start_s, event_type, count(*) AS n_events, " +
      "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value " +
      "FROM w GROUP BY 1, 2"

  def defs: Seq[GraftQuery] = Seq(

    // Tumbling 1h window aggregation (batch flavor).
    GraftQuery(
      "ev_hourly_agg",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(hourBucket, col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(dec6)).cast(DoubleType).as("total_value")),
      Some("SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type, " +
        "count(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2"),
      bench = true),

    // The same aggregation through Structured Streaming (readStream →
    // watermark → window → memory sink, driven to completion). Matches
    // the batch oracle exactly — one code path, two execution modes.
    GraftQuery(
      "ev_hourly_stream",
      (s, dir) => EventStream.runToCompletion(s, dir),
      Some("SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type, " +
        "count(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2")),

    // Streaming exact-once restoration: the stream unioned with itself
    // (every event delivered twice — at-least-once replay) through
    // dropDuplicatesWithinWatermark, then summarized per event_type. The
    // oracle aggregates the SINGLE-copy table, so the hash match proves
    // the duplicated feed collapsed back to exactly-once delivery.
    GraftQuery(
      "ev_stream_dedup",
      (s, dir) => EventStream.dedupUnionStream(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          sum(col("value").cast(dec6)).cast(DoubleType).as("total_value")),
      Some("SELECT event_type, count(*) AS n_events, " +
        "CAST(SUM(event_id) AS BIGINT) AS id_sum, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1")),

    // Sliding (hopping) 1h/15min windows: every event lands in four
    // overlapping windows. The oracle materializes the same membership
    // by exact integer arithmetic — k ranges over the window starts in
    // (t − 1h, t], all in microseconds, so boundary events land in
    // exactly the windows Spark's window() assigns.
    GraftQuery(
      "ev_sliding_agg",
      (s, dir) => graft.streaming.EventStream.slidingAgg(
        Tables.table(s, dir, "events")),
      Some(slidingOracle),
      bench = true),

    // The same sliding aggregation through Structured Streaming — four
    // concurrent open windows per key in the state store, driven to
    // completion and compared to the identical oracle.
    GraftQuery(
      "ev_sliding_stream",
      (s, dir) => graft.streaming.EventStream.runSlidingToCompletion(s, dir),
      Some(slidingOracle)),

    // Schema-on-read: parse props into a typed struct (absent fields are
    // typed nulls, not errors) — the from_json flavor of JSON access.
    GraftQuery(
      "ev_json_struct",
      (s, dir) =>
        Tables.table(s, dir, "events")
          .select(
            col("event_id"),
            from_json(col("props"), StructType(Seq(
              StructField("k", LongType), StructField("missing", LongType))))
              .as("p"))
          .select(
            col("event_id"),
            col("p.k").as("k_value"),
            col("p.missing").as("missing_value")),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value, " +
        "CAST(NULL AS BIGINT) AS missing_value FROM events")),

    // JSON payload extraction (schema-on-read over the props column).
    GraftQuery(
      "ev_json_extract",
      (s, dir) =>
        Tables.table(s, dir, "events")
          .select(
            col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k_value")),
      Some("SELECT event_id, event_type, " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value FROM events")),

    // Sessionization: 30-minute-gap sessions per user, assigned with two
    // stacked windows (lag for gaps, running sum of session starts) —
    // shuffle once on user_id, everything else within partitions.
    // Microsecond precision: DuckDB truncates parquet nanos timestamps to
    // micros, so micros is the cross-engine-comparable resolution.
    GraftQuery(
      "ev_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        val gapUs = 30L * 60 * 1000000L
        Tables.events(s, dir)
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
              .otherwise(0L))
          .withColumn("session_seq",
            sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("user_id"), col("event_id"), col("session_seq"),
            (col("ts_us") - coalesce(col("prev_ts"), col("ts_us"))).as("gap_us"))
      },
      Some("WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_ts " +
        "FROM events) " +
        "SELECT user_id, event_id, " +
        // CAST: DuckDB's windowed SUM yields HUGEINT; Spark yields BIGINT —
        // the driver comparator is type-sensitive even when values agree.
        "CAST(SUM(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq, " +
        "ts_us - coalesce(prev_ts, ts_us) AS gap_us FROM g")),

    // Ordered funnel: view -> click -> purchase with strictly increasing
    // timestamps per user (earliest qualifying event at each stage). Three
    // narrow per-stage aggregates chained by key joins — each stage's
    // input is only the users that survived the previous one, so the work
    // SHRINKS down the funnel; no window over the full event history.
    // Micros resolution (ts_us) for cross-engine ordering parity.
    GraftQuery(
      "ev_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
        val clicks = ev.filter(col("event_type") === "click")
          .join(views, Seq("user_id"))
          .filter(col("ts_us") > col("t_view"))
          .groupBy(col("user_id"), col("t_view"))
          .agg(min(col("ts_us")).as("t_click"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .join(clicks, Seq("user_id"))
          .filter(col("ts_us") > col("t_click"))
          .groupBy(col("user_id"), col("t_view"), col("t_click"))
          .agg(min(col("ts_us")).as("t_purchase"))
        views
          .join(clicks.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
          .join(purchases.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left")
      },
      Some("WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events), " +
        "v AS (SELECT user_id, min(ts_us) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, v.t_view, min(e.ts_us) AS t_click FROM e JOIN v USING (user_id) " +
        "WHERE e.event_type = 'click' AND e.ts_us > v.t_view GROUP BY e.user_id, v.t_view), " +
        "p AS (SELECT e.user_id, c.t_view, c.t_click, min(e.ts_us) AS t_purchase " +
        "FROM e JOIN c USING (user_id) " +
        "WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click GROUP BY e.user_id, c.t_view, c.t_click) " +
        "SELECT v.user_id, v.t_view, c.t_click, p.t_purchase FROM v " +
        "LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id")),

    // Retention cohorts: users grouped by first-activity day, counted as
    // retained at each day offset they return on. Two shuffles total —
    // the per-user first-day aggregate, then the (cohort, offset)
    // count-distinct — both map-side combinable; integer day buckets
    // from nanos stay exact in both engines.
    GraftQuery(
      "ev_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("day", expr("ts_ns div 86400000000000"))
        val firstDay = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        ev.select(col("user_id"), col("day"))
          .join(firstDay, Seq("user_id"))
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
      },
      Some("WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events), " +
        "f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id) " +
        "SELECT f.cohort_day, e.day - f.cohort_day AS day_offset, " +
        "count(DISTINCT e.user_id) AS n_users " +
        "FROM e JOIN f USING (user_id) GROUP BY 1, 2")),

    // Streaming session windows in APPEND mode: a session is emitted
    // only once the watermark (max event time − 1h) passes its end — the
    // open tail stays in state, which is the correct unbounded-stream
    // semantics. The oracle replays the gap-island algorithm and applies
    // the same emission horizon, so the hash match checks both the
    // session arithmetic AND the append-mode emission contract.
    // Both sides apply a 2 s safety margin below the exact-microsecond
    // horizon (the same margin ev_session_timer_stream uses): Spark's
    // watermark is the max event time truncated to MILLISECONDS minus
    // 1h, so a session ending in the sub-ms sliver between the floored
    // and exact horizons is kept by an exact-µs oracle but never
    // emitted by the engine — a data-dependent flake on fixture
    // regeneration. Inside the margin both engines provably agree.
    GraftQuery(
      "ev_session_window_stream",
      (s, dir) => {
        val streamed = EventStream.sessionWindowStream(s, dir)
        val horizon = Tables.events(s, dir)
          .agg((max(expr("ts_ns div 1000")) - lit(3600000000L) -
            lit(2000000L)).as("horizon"))
        streamed.crossJoin(broadcast(horizon))
          .filter(col("end_us") < col("horizon"))
          .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      },
      Some("WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us, " +
        "CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) >= 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM events), " +
        "s2 AS (SELECT user_id, ts_us, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g), " +
        "sess AS (SELECT user_id, min(ts_us) AS start_us, max(ts_us) + 1800000000 AS end_us, " +
        "count(*) AS n_events FROM s2 GROUP BY user_id, sid), " +
        "h AS (SELECT max(epoch_us(ts)) - 3600000000 - 2000000 AS horizon FROM events) " +
        "SELECT user_id, start_us, end_us, n_events FROM sess, h WHERE end_us < horizon")),

    // Custom stateful streaming (flatMapGroupsWithState): per-user
    // session counting with explicit state across micro-batches — the
    // arbitrary-state-machine path the declarative window operators
    // can't express. Final per-user summaries equal the batch gap-island
    // algorithm exactly.
    GraftQuery(
      "ev_sessionize_stream",
      (s, dir) => graft.streaming.SessionizeStream.runToCompletion(s, dir),
      Some("WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, " +
        "lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_ts " +
        "FROM events) " +
        "SELECT user_id, " +
        "CAST(SUM(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions, " +
        "count(*) AS n_events FROM g GROUP BY user_id")),

    // transformWithState (Spark 4's arbitrary stateful processing,
    // RocksDB-backed typed state): per-user running totals; the final
    // emission per user equals the batch aggregate. Gate checks the
    // deterministic count column (the double total is order-dependent
    // by construction and is asserted with tolerance in
    // UserStatsStreamSpec).
    GraftQuery(
      "ev_user_stats_stream",
      (s, dir) => graft.streaming.UserStatsStream.runToCompletion(s, dir)
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events")),
      Some("SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id")),

    // Event-time TIMER sessionization (transformWithState): sessions a
    // later event closes emit inline; each user's trailing session is
    // parked with a timer at (end + gap) and emitted by the WATERMARK,
    // not by input. The gate keeps the deterministic region — sessions
    // whose timer provably expired before the terminal watermark (2 s
    // margin for the engine's internal ms rounding); the boundary tail
    // is asserted subset-wise in SessionTimerStreamSpec.
    GraftQuery(
      "ev_session_timer_stream",
      (s, dir) => {
        val streamed = graft.streaming.SessionTimerStream.runToCompletion(s, dir)
        val horizon = Tables.events(s, dir)
          .agg((max(expr("ts_ns div 1000000")) - lit(2000L) -
            lit(graft.streaming.SessionTimerStream.GapMs)).as("horizon"))
        streamed.crossJoin(broadcast(horizon))
          .filter(col("end_ms") < col("horizon"))
          .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
      },
      Some("WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events), " +
        "g AS (SELECT user_id, t, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000 " +
        "THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)), " +
        "s2 AS (SELECT user_id, t, SUM(ns) OVER (PARTITION BY user_id ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g), " +
        "sess AS (SELECT user_id, min(t) AS start_ms, max(t) AS end_ms, count(*) AS n_events " +
        "FROM s2 GROUP BY user_id, sid), " +
        "h AS (SELECT max(t) - 2000 - 1800000 AS horizon FROM e) " +
        "SELECT user_id, start_ms, end_ms, n_events FROM sess, h WHERE end_ms < horizon")),

    // Stream-static enrichment: each micro-batch joins a broadcast
    // static dimension (customer segment) before aggregating — the
    // streaming side never shuffles for the join; only the dimension
    // moves. Decimal-exact value sums make the result
    // partitioning-independent, so it hash-matches the batch oracle.
    GraftQuery(
      "ev_enriched_stream",
      (s, dir) => EventStream.enrichedAgg(s, dir),
      Some("SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment, e.event_type, " +
        "count(*) AS n_events, " +
        "CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value " +
        "FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey " +
        "GROUP BY 1, 2")),

    // Stream-stream interval join, both sides streaming with 1h
    // watermarks: purchases × clicks of the same user within the
    // preceding 30 minutes. On the finite input every pair is emitted
    // exactly once (inner join emits eagerly; state eviction only drops
    // candidates the watermark has already excluded), so the result
    // equals the batch range join the oracle states.
    GraftQuery(
      "ev_stream_join",
      (s, dir) => EventStream.intervalJoinStream(s, dir),
      Some("SELECT p.event_id AS purchase_id, c.event_id AS click_id " +
        "FROM events p JOIN events c ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' AND c.event_type = 'click' " +
        "AND epoch_us(c.ts) <= epoch_us(p.ts) " +
        "AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000")))
}
