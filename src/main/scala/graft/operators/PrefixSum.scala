package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running total.
  *
  * A global `sum(x) OVER (ORDER BY ...)` window funnels the whole dataset
  * into ONE partition — the classic scale cliff (fine at 60k rows, dead at
  * 100 TB). This operator computes the identical result with the textbook
  * two-pass prefix-sum:
  *
  *   1. range-partition by the order keys (so partition p holds a
  *      contiguous key range, all ranges in order);
  *   2. one tiny job collects the per-partition partial sums — O(numPartitions)
  *      rows to the driver, the same cost class as the range partitioner's
  *      own boundary sampling;
  *   3. broadcast the exclusive per-partition offsets back and add a
  *      within-partition running sum.
  *
  * Every stage is fully parallel; no partition ever sees more than its
  * range slice. Requires `order` to be a total order (include a unique
  * tiebreaker) so ties cannot straddle a partition boundary ambiguously.
  * `value` must be integral (the running total is computed in exact LONG
  * arithmetic; ANSI mode makes overflow loud).
  */
object PrefixSum {

  def runningTotal(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      resultName: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
    // scanned twice (offset job + final projection): materialize the cache
    ranged.cache().count()
    val partials = ranged
      .groupBy(col("__pid"))
      .agg(sum(value.cast("long")).as("__psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // exclusive prefix: offset(p) = sum of partials of all partitions < p
    var acc = 0L
    val offsets = partials.map { case (pid, s) =>
      val o = (pid, acc); acc += s; o
    }.toSeq
    val w = Window
      .partitionBy(col("__pid"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets.toDF("__pid", "__off")), Seq("__pid"))
      .withColumn(resultName, col("__off") + sum(value.cast("long")).over(w))
      .drop("__pid", "__off")
  }
}
