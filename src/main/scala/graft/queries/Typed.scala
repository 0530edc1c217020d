package graft.queries

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Typed Dataset API coverage: case-class Encoders + a custom typed
  * [[Aggregator]] — the Dataset-side UDAF path (`groupByKey(...).agg(
  * agg.toColumn)`), distinct from both builtin aggregates and custom
  * Catalyst expressions.
  *
  * The aggregator's buffer is a pair of BigDecimals + a count: per-row
  * doubles quantize to 6 dp (HALF_UP — the same semantics as
  * `CAST(x AS DECIMAL(38,6))` in both engines) and accumulate in exact
  * decimal, so `merge` is associative and commutative and the result is
  * independent of partitioning — the property that makes a typed
  * aggregator safe under map-side partial aggregation and AQE re-plans
  * at any scale. Spark plans this as a regular ObjectHashAggregate with
  * partial merge; nothing about the typed API forces a single reducer.
  */
object Typed {

  case class Li(
      l_returnflag: String,
      l_quantity: Double,
      l_extendedprice: Double,
      l_discount: Double)

  case class RevBuf(rev: BigDecimal, qty: BigDecimal, n: Long)

  case class RevOut(revenue: Double, qty_sum: Double, n: Long, rev_per_unit: Double)

  /** Revenue-per-unit aggregator: decimal-exact sums of revenue and
    * quantity, one double division at present().
    */
  val revPerUnit: Aggregator[Li, RevBuf, RevOut] =
    new Aggregator[Li, RevBuf, RevOut] {
      private def d6(x: Double): BigDecimal =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      override def zero: RevBuf = RevBuf(BigDecimal(0), BigDecimal(0), 0L)
      override def reduce(b: RevBuf, a: Li): RevBuf = RevBuf(
        b.rev + d6(a.l_extendedprice * (1.0d - a.l_discount)),
        b.qty + d6(a.l_quantity),
        b.n + 1L)
      override def merge(x: RevBuf, y: RevBuf): RevBuf =
        RevBuf(x.rev + y.rev, x.qty + y.qty, x.n + y.n)
      override def finish(b: RevBuf): RevOut = RevOut(
        b.rev.toDouble, b.qty.toDouble, b.n, b.rev.toDouble / b.qty.toDouble)
      override def bufferEncoder = org.apache.spark.sql.Encoders.product[RevBuf]
      override def outputEncoder = org.apache.spark.sql.Encoders.product[RevOut]
    }

  def defs: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_typed_aggregator",
      (s, dir) => {
        import s.implicits._
        Tables.table(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .as[Li]
          .groupByKey(_.l_returnflag)
          .agg(revPerUnit.toColumn.name("agg"))
          .select(col("key").as("l_returnflag"),
            col("agg.revenue").as("revenue"),
            col("agg.qty_sum").as("qty_sum"),
            col("agg.n").as("n"),
            col("agg.rev_per_unit").as("rev_per_unit"))
      },
      Some("SELECT l_returnflag, " +
        "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) / " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS rev_per_unit " +
        "FROM lineitem GROUP BY l_returnflag")))
}
