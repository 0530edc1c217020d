package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data layout.
  *
  * A table range-partitioned and sorted on ONE column prunes scans on
  * that column only; a 100 TB table queried by two independent
  * dimensions (e.g. part AND supplier) scans everything for the second
  * one. Interleaving the bits of both dimensions into a single z-value
  * and laying data out in z-order keeps rows close in EVERY dimension
  * at once: a 2-D box predicate touches a small, contiguous-ish set of
  * files, and min/max column statistics (parquet row groups, file
  * footers) prune the rest — the standard lakehouse OPTIMIZE ZORDER BY
  * layout, built from public Morton-code bit tricks.
  *
  * The z-value is pure codegen'd bit arithmetic (shift/and/or on
  * longs) — no UDF; `layout` is one range repartition on the z-value
  * plus a within-partition sort, both fully distributed.
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative value so a second
    * dimension can interleave into the odd positions (classic magic-
    * number Morton spread, e.g. Hacker's Delight §7-2 / public graphics
    * literature).
    */
  private def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value interleaving the low 16 bits of two non-negative
    * long columns (x gets the even bit positions, y the odd ones).
    */
  def zValue16(x: Column, y: Column): Column =
    spread16(x.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.cast("long").bitwiseAND(lit(0xFFFFL))), 1))

  /** Rewrite `df` into `numPartitions` z-ordered slices: range-partition
    * on the interleaved value, sort within each slice. Writing the
    * result yields files whose per-column min/max ranges are tight in
    * BOTH dimensions — the property scan pruning needs.
    */
  def layout(df: DataFrame, x: Column, y: Column, numPartitions: Int): DataFrame = {
    val z = zValue16(x, y).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
