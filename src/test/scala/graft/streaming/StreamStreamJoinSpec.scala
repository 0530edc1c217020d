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

    def side(kind: String) = spark.readStream
      .schema(EventStream.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .filter(col("event_type") === kind)
      .withColumn("ts_evt", timestamp_micros(expr("ts div 1000")))

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
}
