package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Stream-stream interval join: purchases joined to clicks of the same
  * user within the preceding 30 minutes — both sides streaming, state
  * bounded by watermarks. Verified against the equivalent batch range
  * join.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("stream-stream interval join equals the batch range join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def side(kind: String) = {
      val raw = EventStream.readRaw(spark, dir)
      raw.filter(col("event_type") === kind)
        .withColumn("ts_evt",
          timestamp_micros(Tables.eventTsMicros(raw.schema("ts").dataType)))
    }

    val purchases = side("purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_evt").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = side("click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_evt").as("c_ts"))
      .withWatermark("c_ts", "1 hour")

    val name = s"ssj_${System.nanoTime()}"
    val q = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts_us").as("p_us"))
    val bc = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts_us").as("c_us"))
    val batch = bp.join(bc,
        col("p_user") === col("c_user") &&
          col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - lit(30L * 60 * 1000000L))
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join emits null-padded unmatched rows") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def side(kind: String) = {
      val raw = EventStream.readRaw(spark, dir)
      raw.filter(col("event_type") === kind)
        .withColumn("ts_evt",
          timestamp_micros(Tables.eventTsMicros(raw.schema("ts").dataType)))
    }

    val purchases = side("purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_evt").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = side("click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_evt").as("c_ts"))
      .withWatermark("c_ts", "1 hour")

    // outer rows can only be EMITTED once the watermark passes their
    // join window (before that a match could still arrive); a purchase
    // with no click in its 30-minute lookback then surfaces null-padded.
    // The final watermark sits 1h behind max event time, so purchases in
    // the last hour of the fixture are still held in state when the
    // stream drains — the batch reference below excludes exactly those.
    val name = s"ssoj_${System.nanoTime()}"
    val q = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
        "leftOuter")
      .select(col("purchase_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_us"))
    val bc = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_us"))
    val matched = bp.join(bc,
        col("p_user") === col("c_user") &&
          col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - lit(30L * 60 * 1000000L))
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // matched pairs must agree exactly
    assert(streamed.filter(_._2 != -1L) == matched)

    // null-padded rows: purchases without any matching click whose join
    // window provably closed before the terminal watermark. The global
    // watermark is the MIN across both sides' (max event time − 1h), and
    // eviction additionally waits out the join's 30-minute lookback, so
    // subtract both (plus a margin for the engine's internal rounding) —
    // everything older than that horizon MUST have been emitted.
    val maxP = bp.agg(max(col("p_us"))).head().getLong(0)
    val maxC = bc.agg(max(col("c_us"))).head().getLong(0)
    val horizonUs = math.min(maxP, maxC) -
      3600L * 1000000L - 30L * 60 * 1000000L - 60L * 1000000L
    val expectedOuter = bp
      .join(bc.select(col("click_id"), col("c_user"), col("c_us")),
        col("p_user") === col("c_user") &&
          col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - lit(30L * 60 * 1000000L),
        "left_anti")
      .filter(col("p_us") < lit(horizonUs))
      .select(col("purchase_id"))
      .collect().map(_.getLong(0)).toSet
    val streamedOuter = streamed.filter(_._2 == -1L).map(_._1)
    // every closed-window unmatched purchase was emitted; nothing inside
    // the still-open horizon appears
    assert(expectedOuter.subsetOf(streamedOuter))
    val unmatchedAll = bp
      .join(bc.select(col("c_user"), col("c_us")),
        col("p_user") === col("c_user") &&
          col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - lit(30L * 60 * 1000000L),
        "left_anti")
      .select(col("purchase_id")).collect().map(_.getLong(0)).toSet
    assert(streamedOuter.subsetOf(unmatchedAll))
    assert(expectedOuter.nonEmpty)
  }
}
