package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

class UserStatsStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("transformWithState running totals converge to the batch aggregates") {
    val streamed = UserStatsStream.runToCompletion(spark, dir)
    // running totals are monotone: the final emission per user is the max
    val finalRows = streamed
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("total_value")).as("total_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = Tables.table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.nonEmpty)
    assert(finalRows.size == batch.length)
    batch.foreach { case (u, n, t) =>
      val (sn, st) = finalRows(u)
      assert(sn == n, s"user $u count $sn != $n")
      // double accumulation order differs between stream and shuffle
      assert(math.abs(st - t) <= math.abs(t) * 1e-9 + 1e-9, s"user $u total $st != $t")
    }
  }
}
