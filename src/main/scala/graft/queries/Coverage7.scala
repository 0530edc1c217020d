package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Coverage wave: time-series resampling (date-spine gap fill, EWMA as an
  * exact cross-engine float fold) and order statistics (discrete
  * percentiles, deterministic mode) — the regularization pass that turns
  * an irregular event log into a model-ready daily series.
  */
object Coverage7 {

  private val dec6 = DecimalType(38, 6)

  def defs: Seq[GraftQuery] = Seq(

    // Date-spine gap fill: resample irregular orders to a dense daily
    // grid per priority — missing days materialize with zero counts, and
    // the running total forward-fills across the gaps. The spine is
    // sequence()+explode (a generator, no driver loop); the fill is the
    // IGNORE-NULLS running window. At scale the spine side is tiny
    // (keys × days) and broadcast-joins against the aggregated facts.
    GraftQuery(
      "q_gap_fill",
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        val inWin = o.filter(
          col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1995-04-01").cast(TimestampType))
        val daily = inWin
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderdate").cast(DateType).as("day"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec6)).cast(DoubleType).as("total"))
        val spine = o.select(col("o_orderpriority").as("prio")).distinct()
          .select(col("prio"), explode(sequence(
            lit("1995-01-01").cast(DateType),
            lit("1995-03-31").cast(DateType),
            expr("interval 1 day"))).as("day"))
        val running = Window.partitionBy(col("prio")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("prio", "day"), "left")
          .select(col("prio"), col("day"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("total"), lit(0.0d)).as("total"),
            last(col("total"), ignoreNulls = true).over(running).as("total_ffill"))
      },
      Some("""WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
        |         count(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1, 2),
        |spine AS (
        |  SELECT p.prio, CAST(gs.day AS DATE) AS day
        |  FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) p
        |  CROSS JOIN generate_series(DATE '1995-01-01', DATE '1995-03-31',
        |    INTERVAL 1 DAY) AS gs(day))
        |SELECT s.prio, s.day,
        |  COALESCE(d.n_orders, 0) AS n_orders,
        |  COALESCE(d.total, 0.0) AS total,
        |  last_value(d.total IGNORE NULLS) OVER (PARTITION BY s.prio
        |    ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS total_ffill
        |FROM spine s LEFT JOIN daily d ON s.prio = d.prio AND s.day = d.day
        |""".stripMargin)),

    // EWMA as an explicit left fold: s_i = 0.9·s_{i-1} + 0.1·x_i over the
    // day-ordered daily counts. Both engines execute the IDENTICAL
    // sequence of IEEE-754 operations (acc*0.9 + x*0.1, left to right),
    // so the result is bit-exact across engines — which a parallel
    // float sum can never promise. The fold runs per group over a small
    // collected array; the heavy part (the daily aggregation) stays
    // distributed.
    GraftQuery(
      "q_resample_ewma",
      (s, dir) => {
        val daily = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1995-04-01").cast(TimestampType))
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderdate").cast(DateType).as("day"))
          .agg(count(lit(1)).cast(DoubleType).as("n"))
        daily.groupBy(col("prio"))
          .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("series"))
          .select(col("prio"),
            aggregate(col("series"), lit(0.0d),
              (acc, e) => acc * lit(0.9d) + e.getField("n") * lit(0.1d))
              .as("ewma"))
      },
      Some("""WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
        |         count(*) AS n
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1, 2)
        |SELECT prio,
        |  list_reduce(list_prepend(0.0, list(CAST(n AS DOUBLE) ORDER BY day)),
        |              (acc, x) -> acc * 0.9 + x * 0.1) AS ewma
        |FROM daily GROUP BY prio
        |""".stripMargin)),

    // Discrete percentiles: percentile_disc returns an actual data value
    // (selection, not interpolation) — exact and comparison-safe where
    // interpolated percentiles carry float-formula skew between engines.
    GraftQuery(
      "q_percentile_disc",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p50_price"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p90_price"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)")
            .as("p25_qty")),
      Some("SELECT l_returnflag, " +
        "quantile_disc(l_extendedprice, 0.5) AS p50_price, " +
        "quantile_disc(l_extendedprice, 0.9) AS p90_price, " +
        "quantile_disc(l_quantity, 0.25) AS p25_qty " +
        "FROM lineitem GROUP BY l_returnflag")),

    // Deterministic mode: the modal value with ties broken toward the
    // LARGEST value — spelled as two exact aggregations (count per value,
    // then arg-max on (count, value)) because both engines' native mode()
    // leaves tie order unspecified. The first aggregation combines
    // map-side, so the shuffle carries (group, value) pairs, not rows.
    GraftQuery(
      "q_mode_deterministic",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("cnt"), col("l_quantity"))).as("m"))
        .select(col("l_returnflag"),
          col("m.cnt").as("mode_count"),
          col("m.l_quantity").as("mode_qty")),
      Some("""WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  max(cnt) AS mode_count,
        |  max(l_quantity) FILTER (WHERE cnt = mx) AS mode_qty
        |FROM (SELECT *, max(cnt) OVER (PARTITION BY l_returnflag) AS mx FROM c)
        |GROUP BY l_returnflag
        |""".stripMargin)),

    // Moving median: an exact order statistic over a sliding 7-row frame
    // — the robust-smoothing counterpart to the EWMA above. l_quantity
    // is integer-valued, so the interpolated median is k or k+0.5 —
    // exact in both engines regardless of interpolation arithmetic.
    GraftQuery(
      "q_window_median",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic data;
        // l_quantity as the last key makes tie order irrelevant — swapping
        // equal-quantity ties never changes any frame's quantity multiset
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .rowsBetween(-6, Window.currentRow)
        Tables.table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 2000)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            percentile(col("l_quantity"), lit(0.5)).over(w).as("moving_median"))
      },
      Some("SELECT l_orderkey, l_linenumber, l_returnflag, " +
        "quantile_cont(l_quantity, 0.5) OVER (PARTITION BY l_returnflag " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_median " +
        "FROM lineitem WHERE l_orderkey < 2000")),

    // Collated comparison (Spark 4 COLLATE): case-insensitive equality
    // through the UTF8_LCASE collation over a deterministically
    // mixed-case column — the oracle spells the same predicate with
    // lower(), which agrees for ASCII data.
    GraftQuery(
      "q_collation",
      (s, dir) => Tables.table(s, dir, "customer")
        .withColumn("seg_mixed",
          when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
            .otherwise(lower(col("c_mktsegment"))))
        .filter(expr("seg_mixed COLLATE UTF8_LCASE = 'building'"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum")),
      Some("SELECT c_nationkey, count(*) AS n, " +
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum FROM (" +
        "SELECT c_nationkey, c_custkey, " +
        "CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment) " +
        "ELSE lower(c_mktsegment) END AS seg_mixed FROM customer) " +
        "WHERE lower(seg_mixed) = 'building' GROUP BY c_nationkey")),

    // Fuzzy (edit-distance) self-join — entity resolution over names.
    // Deletion-neighborhood blocking + exact levenshtein rescore equals
    // the quadratic all-pairs join (the oracle) with linear data motion;
    // the brute-force plan is a cartesian product that cannot run at
    // scale. Keys are restricted to keep the oracle's n² tractable.
    GraftQuery(
      "q_fuzzy_join",
      (s, dir) => graft.operators.FuzzyJoin.selfPairs(
        Tables.table(s, dir, "customer").filter(col("c_custkey") < 500),
        "c_custkey", "c_name")
        .select(col("id_a"), col("id_b"), col("dist")),
      Some("SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
        "levenshtein(a.c_name, b.c_name) AS dist " +
        "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey " +
        "WHERE a.c_custkey < 500 AND b.c_custkey < 500 " +
        "AND levenshtein(a.c_name, b.c_name) <= 1")))
}
