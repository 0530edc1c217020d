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
        "ts_us - coalesce(prev_ts, ts_us) AS gap_us FROM g")))
}
