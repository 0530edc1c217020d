package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Timer-driven sessionization ≡ batch gap-island sessions. The stream
  * emits mid-batch-closed sessions from input handling and each user's
  * trailing session from an EVENT-TIME TIMER at (end + gap); the batch
  * reference computes the same 30-minute gap islands with the lag/sum
  * idiom. Sessions whose timer provably expired before the terminal
  * watermark must ALL be present; nothing else may be.
  */
class SessionTimerStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("timer-emitted sessions equal the batch gap sessions") {
    val streamed = SessionTimerStream.runToCompletion(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch reference: 30-minute gap islands per user in milliseconds
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000000").as("ts_ms"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    val sessions = ev
      .withColumn("new_s",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) >
          SessionTimerStream.GapMs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n"))
    val batch = sessions
      .select(col("user_id"), col("start_ms"), col("end_ms"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // nothing may be emitted that is not a true batch session
    assert(streamed.subsetOf(batch))

    // every session whose inactivity timer provably expired before the
    // terminal watermark (min over... single input ⇒ max ts − 1s delay,
    // with a 1s margin) must have been emitted — including trailing
    // sessions, which ONLY a timer can emit
    val maxMs = ev.agg(max(col("ts_ms"))).head().getLong(0)
    val horizon = maxMs - 1000L - SessionTimerStream.GapMs - 1000L
    val mustEmit = batch.filter(_._3 < horizon)
    assert(mustEmit.subsetOf(streamed))
    assert(mustEmit.nonEmpty)

    // the timer path genuinely fired: some emitted session is its user's
    // LAST (no later batch session for that user), which input-row
    // handling alone can never emit
    val lastPerUser = batch.groupBy(_._1).map { case (u, ss) => u -> ss.maxBy(_._3) }
    val timerEmittedATrailingSession =
      streamed.exists(x => lastPerUser(x._1) == x)
    assert(timerEmittedATrailingSession)
  }
}
