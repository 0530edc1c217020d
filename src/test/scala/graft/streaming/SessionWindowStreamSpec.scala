package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

class SessionWindowStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming session windows equal the batch sessions closed by the watermark") {
    val streamed = EventStream.sessionWindowStream(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.SparkEntry.queries("ev_session_window")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val maxTsUs = Tables.events(spark, dir)
      .agg(max(expr("ts_ns div 1000"))).head().getLong(0)
    val horizon = maxTsUs - 3600L * 1000000L // watermark: max event time − 1h
    val closed = batch.filter(_._3 < horizon)
    // append mode emits exactly the watermark-closed sessions
    assert(streamed == closed,
      s"streamed ${streamed.size} vs closed ${closed.size} of ${batch.size}")
    assert(streamed.nonEmpty)
    assert(closed.size < batch.size) // the open tail is genuinely withheld
  }
}
