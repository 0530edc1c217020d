package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession, Tables}

/** The binned range join must (a) match the naive theta-join row for
  * row, including across bin boundaries and negative values, and
  * (b) actually plan as an equi-join — no nested-loop, no cartesian.
  */
class BinnedRangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("binned join equals the naive BETWEEN join on real tables") {
    val day = 86400000000L
    val ivs = Tables.table(spark, dir, "lineitem")
      .filter(col("l_suppkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("s_us"),
        (unix_micros(col("l_shipdate").cast("timestamp")) +
          (col("l_quantity").cast("long") % 30) * day).as("e_us"))
    val pts = Tables.table(spark, dir, "orders")
      .filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("p_us"))
    val binned = BinnedRangeJoin
      .pointInInterval(pts, col("p_us"), ivs, col("s_us"), col("e_us"), 16 * day)
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val naive = ivs.join(pts,
        col("p_us") >= col("s_us") && col("p_us") <= col("e_us"))
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // multiset equality: catches both missed matches AND any duplicate
    // pairs that bin replication could manufacture (the testdata itself
    // contains a duplicated (l_orderkey, l_linenumber) row, so genuine
    // duplicates exist in BOTH results — a plain set-compare would hide
    // a replication bug)
    assert(binned.sorted == naive.sorted)
    assert(binned.nonEmpty)
  }

  test("negative values bin correctly (floor, not truncate-toward-zero)") {
    val s = spark
    import s.implicits._
    val pts = Seq(-25L, -10L, -1L, 0L, 1L, 9L, 10L).toDF("p")
    val ivs = Seq((-30L, -20L), (-12L, 3L), (0L, 10L)).toDF("lo", "hi")
    val got = BinnedRangeJoin
      .pointInInterval(pts, col("p"), ivs, col("lo"), col("hi"), 10L)
      .select("lo", "hi", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      p <- Seq(-25L, -10L, -1L, 0L, 1L, 9L, 10L)
      (lo, hi) <- Seq((-30L, -20L), (-12L, 3L), (0L, 10L))
      if p >= lo && p <= hi
    } yield (lo, hi, p)).toSet
    assert(got == want)
  }

  test("plans as an equi-join, never nested-loop or cartesian") {
    val p = SparkEntry.queries("q_range_join_binned")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("interval overlap equals the naive quadratic join on real tables") {
    val day = 86400000000L
    val a = Tables.table(spark, dir, "lineitem")
      .filter(col("l_suppkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("as_us"),
        (unix_micros(col("l_shipdate").cast("timestamp")) +
          (col("l_quantity").cast("long") % 30) * day).as("ae_us"))
    val b = Tables.table(spark, dir, "orders")
      .filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("bs_us"),
        (unix_micros(col("o_orderdate").cast("timestamp")) +
          (col("o_orderkey") % 15) * day).as("be_us"))
    val binned = BinnedRangeJoin
      .intervalOverlap(a, col("as_us"), col("ae_us"),
        b, col("bs_us"), col("be_us"), 16 * day)
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val naive = a.join(b,
        col("as_us") <= col("be_us") && col("bs_us") <= col("ae_us"))
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // multiset equality: a pair overlapping many shared bins must still
    // appear exactly once (designated-bin pinning, not dedup)
    assert(binned.sorted == naive.sorted)
    assert(binned.nonEmpty)
  }

  test("overlap pairs spanning many bins appear exactly once; empty and touching intervals behave") {
    val s = spark
    import s.implicits._
    // long intervals sharing dozens of bins with binWidth=10; touching
    // endpoints (inclusive) must match; inverted interval must not
    val a = Seq((1L, 0L, 500L), (2L, 100L, 100L), (3L, 50L, 40L))
      .toDF("aid", "as", "ae")
    val b = Seq((10L, 490L, 900L), (11L, 100L, 100L), (12L, -50L, -1L))
      .toDF("bid", "bs", "be")
    val got = BinnedRangeJoin
      .intervalOverlap(a, col("as"), col("ae"), b, col("bs"), col("be"), 10L)
      .select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // (1,10): overlap [490,500]; (1,11): point 100 inside; (2,11): point=point
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 11L)))
  }
}
