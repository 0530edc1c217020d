package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join as an EQUI-join over fixed-width bins.
  *
  * Spark plans a raw `p BETWEEN s AND e` join as a broadcast nested-loop
  * (fine when one side broadcasts) or, when both sides are large, a
  * cartesian product — the O(n·m) scale cliff. Binning restores a
  * shuffle equi-join: a point lands in exactly one `binWidth`-wide bin,
  * an interval is replicated to every bin it overlaps, and the exact
  * predicate re-checked after the bin equi-join. Each matching
  * (interval, point) pair meets in precisely one bin — the point's —
  * so the result needs no dedup and is row-identical to the naive join.
  *
  * Cost model: replication factor is ~(interval length / binWidth) + 1,
  * while bin selectivity improves as binWidth shrinks — pick binWidth
  * near the TYPICAL interval length so replication stays O(1) per
  * interval and each bin pairs a point only with locally-overlapping
  * intervals. Both sides shuffle-partition on the bin key, so the join
  * parallelizes across the full cluster; a heavily-hit bin (temporal
  * hotspot) is further split by AQE's skew-join handling.
  *
  * Columns must be integral (epoch days/seconds/micros — convert
  * timestamps with `unix_micros` first; converting inside the operator
  * would silently truncate sub-second precision).
  */
object BinnedRangeJoin {

  /** Floor division of the named long column in exact long arithmetic
    * (SQL `div` truncates toward zero; adjust when the remainder is
    * negative so bins stay contiguous across 0).
    */
  private def floorDiv(name: String, w: Long): Column = {
    val q = expr(s"$name div ${w}L")
    when(col(name) % w < 0, q - 1).otherwise(q)
  }

  /** All (interval, point) pairs with `point` in `[start, end]`
    * (inclusive). Output carries the interval columns then the point
    * columns. Intervals with `end < start` match nothing.
    */
  def pointInInterval(
      points: DataFrame,
      point: Column,
      intervals: DataFrame,
      start: Column,
      end: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points
      .withColumn("__pv", point.cast(LongType))
      .withColumn("__pbin", floorDiv("__pv", binWidth))
    val i = intervals
      .withColumn("__s", start.cast(LongType))
      .withColumn("__e", end.cast(LongType))
      .filter(col("__e") >= col("__s"))
      .withColumn("__ibin",
        explode(sequence(floorDiv("__s", binWidth), floorDiv("__e", binWidth))))
    i.join(p,
        col("__ibin") === col("__pbin") &&
          col("__pv") >= col("__s") && col("__pv") <= col("__e"))
      .drop("__pv", "__pbin", "__s", "__e", "__ibin")
  }

  /** All (left, right) pairs whose inclusive intervals overlap
    * (`lStart <= rEnd && rStart <= lEnd`) — the temporal-join shape
    * (sessions × outages, ad exposures × visits). Same equi-join
    * rewrite, with both sides replicated to their covering bins; a pair
    * that overlaps shares EVERY bin of the overlap region, so the join
    * additionally pins each pair to one designated bin — the bin of the
    * later start, `max(lStart, rStart)`, which lies inside both
    * intervals by definition of overlap. floorDiv is monotone, so that
    * bin is simply the max of the two precomputed start bins: no dedup,
    * row-identical to the naive quadratic join. Degenerate (end < start)
    * intervals match nothing.
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: Column,
      lEnd: Column,
      right: DataFrame,
      rStart: Column,
      rEnd: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left
      .withColumn("__ls", lStart.cast(LongType))
      .withColumn("__le", lEnd.cast(LongType))
      .filter(col("__le") >= col("__ls"))
      .withColumn("__lsbin", floorDiv("__ls", binWidth))
      .withColumn("__lbin",
        explode(sequence(col("__lsbin"), floorDiv("__le", binWidth))))
    val r = right
      .withColumn("__rs", rStart.cast(LongType))
      .withColumn("__re", rEnd.cast(LongType))
      .filter(col("__re") >= col("__rs"))
      .withColumn("__rsbin", floorDiv("__rs", binWidth))
      .withColumn("__rbin",
        explode(sequence(col("__rsbin"), floorDiv("__re", binWidth))))
    l.join(r,
        col("__lbin") === col("__rbin") &&
          col("__lbin") === greatest(col("__lsbin"), col("__rsbin")) &&
          col("__ls") <= col("__re") && col("__rs") <= col("__le"))
      .drop("__ls", "__le", "__lsbin", "__lbin",
        "__rs", "__re", "__rsbin", "__rbin")
  }
}
