package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly aggregation equals the batch result exactly") {
    val batch = graft.SparkEntry.queries("ev_hourly_agg")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val streamed = EventStream.runToCompletion(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
