package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-resistant two-phase aggregation: explode each hot key across
  * `saltBuckets` synthetic sub-keys, partially aggregate, then combine.
  * The first shuffle spreads a skewed key over `saltBuckets` reducers;
  * the second shuffle only moves `saltBuckets` pre-aggregated rows per
  * key. Results are identical to the direct aggregation because every
  * supported aggregate is decomposable (sum/count/min/max — and the
  * decimal sum keeps doubles order-independent).
  *
  * AQE's `skewedJoin`/`rebalance` handles many of these cases at runtime;
  * explicit salting is the deterministic tool when the skew is known
  * (e.g. a null-heavy key or a power-law user id at 100 TB).
  */
object SaltedAgg {

  private val dec6 = DecimalType(38, 6)

  final case class Spec(
      sums: Seq[(Column, String)] = Nil,
      counts: Seq[String] = Nil,
      maxs: Seq[(Column, String)] = Nil,
      mins: Seq[(Column, String)] = Nil)

  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(spec: Spec): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))

    val partialAggs =
      spec.sums.map { case (c, n) => sum(c.cast(dec6)).as(s"__sum_$n") } ++
        spec.counts.map(n => count(lit(1)).as(s"__cnt_$n")) ++
        spec.maxs.map { case (c, n) => max(c).as(s"__max_$n") } ++
        spec.mins.map { case (c, n) => min(c).as(s"__min_$n") }

    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)

    val finalAggs =
      spec.sums.map { case (_, n) => sum(col(s"__sum_$n")).cast(DoubleType).as(n) } ++
        spec.counts.map(n => sum(col(s"__cnt_$n")).as(n)) ++
        spec.maxs.map { case (_, n) => max(col(s"__max_$n")).as(n) } ++
        spec.mins.map { case (_, n) => min(col(s"__min_$n")).as(n) }

    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
