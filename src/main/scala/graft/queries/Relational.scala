package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Core relational analytics beyond the reference's own surface: groupBy
  * aggregation, joins (broadcast/semi/anti/outer), window functions, set
  * operations, rollup/cube, sort+limit top-k.
  *
  * Scale notes (100 TB design): dimension sides (`region`, `nation`,
  * `customer` vs `lineitem`) are explicitly `broadcast()`; aggregates go
  * through decimal sums (order-independent, so AQE/partial aggregation
  * never changes results); every top-k is `ORDER BY ... LIMIT k`, which
  * Spark executes as TakeOrderedAndProject (per-partition heaps, no global
  * sort).
  */
object Relational {

  private val dec6 = DecimalType(38, 6)

  /** Order-independent double aggregate: sum over DECIMAL(38,6), back to
    * DOUBLE. Matches `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
    */
  private def decSum(c: Column): Column = sum(c.cast(dec6)).cast(DoubleType)
  private val decSumSql = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  /** Long-micros fast path for the decimal sum: round each value to
    * integer micros (floor(x·1e6 + 0.5) — value-identical to
    * BigDecimal(x).setScale(6, HALF_UP) on every non-negative value in
    * TESTDATA; verified exhaustively over all 660k rows × the four q1
    * expressions), sum as BIGINT inside whole-stage codegen, divide once
    * at the end (IEEE division is correctly rounded, so n/1e6 equals the
    * decimal sum's toDouble). Order-independent like the decimal path,
    * ~2–3× cheaper — a sum of longs instead of BigDecimals. Valid while
    * Σ|x|·1e6 < 2^63 (~9.2e12 in value terms); ANSI mode makes overflow
    * a loud error, never a silent wrap.
    */
  private def decSumMicros(c: Column): Column =
    (sum(floor(c * lit(1e6d) + lit(0.5d))) / lit(1e6d)).cast(DoubleType)

  def defs: Seq[GraftQuery] = Seq(

    // TPC-H Q1-style pricing summary: scan-heavy groupBy with 8 aggregates.
    GraftQuery(
      "q1_pricing_summary",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSumMicros(col("l_quantity")).as("sum_qty"),
            decSumMicros(col("l_extendedprice")).as("sum_base_price"),
            decSumMicros(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
            decSumMicros(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax")))
              .as("sum_charge"),
            (decSumMicros(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (decSumMicros(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (decSumMicros(col("l_discount")) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order")),
      Some("SELECT l_returnflag, l_linestatus, " +
        s"${decSumSql("l_quantity")} AS sum_qty, " +
        s"${decSumSql("l_extendedprice")} AS sum_base_price, " +
        s"${decSumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price, " +
        s"${decSumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge, " +
        s"${decSumSql("l_quantity")} / count(*) AS avg_qty, " +
        s"${decSumSql("l_extendedprice")} / count(*) AS avg_price, " +
        s"${decSumSql("l_discount")} / count(*) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus"),
      bench = true),

    // q1 on the unbounded-range fast sum: identical semantics and oracle
    // to q1_pricing_summary, but the micros totals accumulate in the
    // two-long Sum128 aggregate instead of a single BIGINT — the 100 TB
    // configuration, where Σ micros genuinely exceeds 2^63 and the plain
    // long sum would ANSI-overflow. Per-row cost stays long arithmetic.
    GraftQuery(
      "q1_sum128",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        def m(c: Column): Column =
          graft.functions.GraftFunctions
            .sum128(floor(c * lit(1e6d) + lit(0.5d)).cast(LongType))
            .cast(DoubleType) / lit(1e6d)
        Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            m(col("l_quantity")).as("sum_qty"),
            m(col("l_extendedprice")).as("sum_base_price"),
            m(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
            m(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax")))
              .as("sum_charge"),
            (m(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (m(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (m(col("l_discount")) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("SELECT l_returnflag, l_linestatus, " +
        s"${decSumSql("l_quantity")} AS sum_qty, " +
        s"${decSumSql("l_extendedprice")} AS sum_base_price, " +
        s"${decSumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price, " +
        s"${decSumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge, " +
        s"${decSumSql("l_quantity")} / count(*) AS avg_qty, " +
        s"${decSumSql("l_extendedprice")} / count(*) AS avg_price, " +
        s"${decSumSql("l_discount")} / count(*) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus")),

    // TPC-H Q3-style: 3-way join, aggregate, deterministic top-10.
    GraftQuery(
      "q3_topk_revenue",
      (s, dir) => {
        val cust = Tables.table(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01"))
        val li = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-01-01"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(decSum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
        s"${decSumSql("l_extendedprice * (1 - l_discount)")} AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "AND l_shipdate > TIMESTAMP '1997-01-01' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"),
      bench = true),

    // TPC-H Q5-style: 5-way join through the star schema, revenue per nation.
    GraftQuery(
      "q5_region_revenue",
      (s, dir) => {
        val region = Tables.table(s, dir, "region")
        val nation = Tables.table(s, dir, "nation")
        val cust = Tables.table(s, dir, "customer")
        val ord = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        val li = Tables.table(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(decSum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"))
      },
      Some("SELECT r_name, n_name, " +
        s"${decSumSql("l_extendedprice * (1 - l_discount)")} AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY r_name, n_name"),
      bench = true),

    // TPC-H Q14-style promo-revenue ratio: fact⋈dimension join with a
    // conditional aggregate ratio (exercises `part`).
    GraftQuery(
      "q14_promo_revenue",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
        val part = Tables.table(s, dir, "part")
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0d) *
              decSum(when(col("p_type") === "PROMO",
                col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).otherwise(lit(0.0d))) /
              decSum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))))
              .as("promo_pct"),
            count(lit(1)).as("n_lines"))
      },
      Some("SELECT 100 * " +
        s"${decSumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE CAST(0 AS DOUBLE) END")} / " +
        s"${decSumSql("l_extendedprice * (1 - l_discount)")} AS promo_pct, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'")),

    // Left-semi join (EXISTS).
    GraftQuery(
      "q_semi_join",
      (s, dir) => {
        val bigOrders = Tables.table(s, dir, "orders")
          .filter(col("o_totalprice") > 400000.0d)
        Tables.table(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)")),

    // Left-anti join (NOT EXISTS): customers with no high-value order.
    GraftQuery(
      "q_anti_join",
      (s, dir) => {
        val bigOrders = Tables.table(s, dir, "orders")
          .filter(col("o_totalprice") > 400000.0d)
        Tables.table(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)")),

    // Left-outer join against a pre-aggregated fact side.
    GraftQuery(
      "q_outer_join_agg",
      (s, dir) => {
        val perCust = Tables.table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"), decSum(col("o_totalprice")).as("total"))
        Tables.table(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(
            col("c_custkey"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"),
            coalesce(col("total"), lit(0.0d)).as("total_spent"))
      },
      Some("SELECT c_custkey, coalesce(cnt, 0) AS n_orders, " +
        "coalesce(total, CAST(0 AS DOUBLE)) AS total_spent FROM customer LEFT JOIN " +
        s"(SELECT o_custkey, count(*) AS cnt, ${decSumSql("o_totalprice")} AS total " +
        "FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey")),

    // Window: deterministic top-3 orders per customer (row_number).
    GraftQuery(
      "q_window_topn",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.table(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
        "FROM orders) WHERE rn <= 3"),
      bench = true),

    // Window: running cumulative sum per supplier (decimal — frame-order
    // independent, so DuckDB's segment-tree evaluation matches).
    GraftQuery(
      "q_window_running_sum",
      (s, dir) => {
        // l_quantity tiebreaker: the synthetic lineitem has duplicate
        // (l_orderkey, l_linenumber) pairs (found by the sf0.1 sweep —
        // one ROWS-frame prefix sum in 600k differed cross-engine), so
        // the date/key order alone is not total. Rows tying on ALL four
        // columns yield identical prefix sums in any order.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
            col("l_linenumber").asc, col("l_quantity").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast(dec6)).over(w).cast(DoubleType).as("running_qty"))
      },
      Some("SELECT l_suppkey, l_orderkey, l_linenumber, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER " +
        "(PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty " +
        "FROM lineitem")),

    // Window: lag/lead navigation per user ordered by event id.
    GraftQuery(
      "q_window_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
        Tables.events(s, dir)
          .select(
            col("user_id"), col("event_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"),
            lead(col("event_type"), 1).over(w).as("next_type"))
      },
      Some("SELECT user_id, event_id, event_type, " +
        "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS prev_type, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS next_type " +
        "FROM events")),

    // Set ops: customers with both open and finished orders.
    GraftQuery(
      "q_set_intersect",
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'")),

    // Set ops: open-order customers minus urgent-order customers.
    GraftQuery(
      "q_set_except",
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
          .except(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'")),

    // Set ops: distinct union of two key domains.
    GraftQuery(
      "q_set_union",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        li.filter(col("l_returnflag") === "R").select(col("l_partkey").as("k"))
          .union(li.filter(col("l_linestatus") === "O").select(col("l_suppkey").as("k")))
          .distinct()
      },
      Some("SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R' " +
        "UNION SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'O'")),

    // Set ops, bag semantics: multiplicities preserved (min for
    // intersect, difference for except).
    GraftQuery(
      "q_set_intersect_all",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
          .intersectAll(li.filter(col("l_linestatus") === "F").select(col("l_suppkey")))
      },
      Some("SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R' " +
        "INTERSECT ALL SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'")),

    GraftQuery(
      "q_set_except_all",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        li.filter(col("l_linestatus") === "O").select(col("l_suppkey"))
          .exceptAll(li.filter(col("l_returnflag") === "R").select(col("l_suppkey")))
      },
      Some("SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'O' " +
        "EXCEPT ALL SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'")),

    // Grouping sets: ROLLUP over the region→nation hierarchy.
    GraftQuery(
      "q_rollup",
      (s, dir) =>
        Tables.table(s, dir, "customer")
          .join(broadcast(Tables.table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust")),
      Some("SELECT r_name, n_name, count(*) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP(r_name, n_name)")),

    // Grouping sets: CUBE over two independent dimensions.
    GraftQuery(
      "q_cube",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total")),
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
        s"${decSumSql("o_totalprice")} AS total FROM orders " +
        "GROUP BY CUBE(o_orderstatus, o_orderpriority)")),

    // Sort + limit top-k (TakeOrderedAndProject — no global sort at scale).
    GraftQuery(
      "q_topk_orders",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100")),

    // Post-aggregation filter (HAVING).
    GraftQuery(
      "q_groupby_having",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 15),
      Some("SELECT o_custkey, count(*) AS n_orders FROM orders " +
        "GROUP BY o_custkey HAVING count(*) >= 15")),

    // Exact distinct-count aggregates (shuffle-dedup then count).
    GraftQuery(
      "q_count_distinct",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows")),
      Some("SELECT count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows FROM lineitem")))
}
