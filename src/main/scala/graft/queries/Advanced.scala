package graft.queries

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Advanced relational surface: exact percentiles, pivot, generators
  * (explode), as-of join, typed Dataset aggregation, scalar subqueries,
  * filtered aggregates, string functions.
  */
object Advanced {

  private val dec6 = DecimalType(38, 6)
  private def decSum(c: Column): Column = sum(c.cast(dec6)).cast(DoubleType)
  private val decSumSql = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  /** Typed aggregation state/result for the Aggregator demo. Every field
    * is order-independent (count/min/max), so merge order can't change
    * the answer.
    */
  final case class LineStats(n: Long, maxPrice: Double, minQty: Double)

  private object LineStatsAgg
      extends Aggregator[(String, Double, Double), LineStats, LineStats] {
    def zero: LineStats = LineStats(0L, Double.MinValue, Double.MaxValue)
    def reduce(b: LineStats, r: (String, Double, Double)): LineStats =
      LineStats(b.n + 1, math.max(b.maxPrice, r._2), math.min(b.minQty, r._3))
    def merge(a: LineStats, b: LineStats): LineStats =
      LineStats(a.n + b.n, math.max(a.maxPrice, b.maxPrice), math.min(a.minQty, b.minQty))
    def finish(b: LineStats): LineStats = b
    def bufferEncoder = Encoders.product[LineStats]
    def outputEncoder = Encoders.product[LineStats]
  }

  def defs: Seq[GraftQuery] = Seq(

    // Exact interpolated percentiles per group (Spark `percentile` ==
    // SQL percentile_cont == DuckDB quantile_cont; rounded to absorb the
    // interpolation's last-ulp formula difference).
    GraftQuery(
      "q_percentiles",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50_qty"),
            round(percentile(col("l_quantity"), lit(0.25)), 6).as("p25_qty"),
            round(percentile(col("l_extendedprice"), lit(0.9)), 6).as("p90_price")),
      Some("SELECT l_returnflag, " +
        "round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty, " +
        "round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty, " +
        "round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price " +
        "FROM lineitem GROUP BY l_returnflag")),

    // Pivot: order status -> columns, decimal-safe sums per priority.
    GraftQuery(
      "q_pivot",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(decSum(col("o_totalprice"))),
      Some {
        def cell(status: String) =
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) " +
            s"FILTER (WHERE o_orderstatus = '$status') AS DOUBLE) AS \"$status\""
        "SELECT o_orderpriority, " +
          s"${cell("O")}, ${cell("F")}, ${cell("P")} " +
          "FROM orders GROUP BY o_orderpriority"
      }),

    // Generator: explode tokens -> global top-20 words (count desc, word
    // asc). The one place a per-token row explosion is the right tool.
    GraftQuery(
      "q_explode_topwords",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word").asc)
          .limit(20),
      Some("SELECT word, count(*) AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
        "GROUP BY word ORDER BY n DESC, word ASC LIMIT 20")),

    // As-of join: each purchase event picks up the user's most recent
    // click at-or-before it. Spark-first formulation: union the two
    // event kinds, one shuffle+sort per user, carry the last click
    // forward with a running max window — no range join, no per-row
    // probes; this is the 100 TB-safe as-of. (Micros precision — DuckDB
    // truncates nanos.)
    GraftQuery(
      "q_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), col("event_id"),
            lit(null).cast("long").as("click_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"), lit(null).cast("long").as("event_id"),
            col("ts_us").as("click_ts"))
        val w = Window.partitionBy(col("user_id"))
          // clicks sort before purchases at equal ts (asof >= includes
          // equality): order by (ts, is_purchase)
          .orderBy(col("ts_us").asc, col("event_id").isNotNull.cast("int").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        purchases.unionByName(clicks)
          .withColumn("last_click", max(col("click_ts")).over(w))
          .filter(col("event_id").isNotNull && col("last_click").isNotNull)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts_us").as("purchase_ts"), col("last_click").as("click_ts"))
      },
      Some("SELECT p.event_id AS purchase_id, p.user_id, " +
        "epoch_us(p.ts) AS purchase_ts, epoch_us(c.ts) AS click_ts " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND p.ts >= c.ts")),

    // Typed Dataset aggregation: custom Aggregator over a keyed Dataset.
    GraftQuery(
      "q_typed_agg",
      (s, dir) => {
        import s.implicits._
        Tables.table(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
          .as[(String, Double, Double)]
          .groupByKey(_._1)
          .agg(LineStatsAgg.toColumn.name("stats"))
          .select(col("key").as("l_returnflag"),
            col("stats.n").as("n"),
            col("stats.maxPrice").as("max_price"),
            col("stats.minQty").as("min_qty"))
      },
      Some("SELECT l_returnflag, count(*) AS n, max(l_extendedprice) AS max_price, " +
        "min(l_quantity) AS min_qty FROM lineitem GROUP BY l_returnflag")),

    // Scalar subquery: orders above the global (decimal-exact) mean.
    GraftQuery(
      "q_scalar_subquery",
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        val mean = o.agg(
          (decSum(col("o_totalprice")) / count(lit(1))).as("mean_price"))
        o.join(broadcast(mean))
          .filter(col("o_totalprice") > col("mean_price"))
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > " +
        s"(SELECT ${decSumSql("o_totalprice")} / count(*) FROM orders)")),

    // Filtered / conditional aggregates.
    GraftQuery(
      "q_conditional_agg",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .agg(
            count_if(col("l_discount") > 0.05d).as("n_discounted"),
            decSum(when(col("l_returnflag") === "R", col("l_extendedprice"))
              .otherwise(lit(0.0d))).as("returned_value"),
            max(when(col("l_quantity") >= 25, col("l_shipdate"))).as("last_big_ship")),
      Some("SELECT l_linestatus, " +
        "count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted, " +
        s"${decSumSql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE CAST(0 AS DOUBLE) END")} AS returned_value, " +
        "max(CASE WHEN l_quantity >= 25 THEN l_shipdate END) AS last_big_ship " +
        "FROM lineitem GROUP BY l_linestatus")),

    // String-function surface: regexp extraction, padding, concat,
    // replace, case transforms.
    GraftQuery(
      "q_string_funcs",
      (s, dir) =>
        Tables.table(s, dir, "events")
          .select(
            col("event_id"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"),
            concat(upper(col("event_type")), lit(":"),
              lpad(col("user_id").cast("string"), 6, "0")).as("tag"),
            translate(col("event_type"), "aeiou", "AEIOU").as("shouty"),
            substring(col("event_type"), 2, 3).as("mid")),
      Some("SELECT event_id, " +
        "regexp_extract(props, '\"k\": (\\d+)', 1) AS k_str, " +
        "upper(event_type) || ':' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS tag, " +
        "translate(event_type, 'aeiou', 'AEIOU') AS shouty, " +
        "substr(event_type, 2, 3) AS mid FROM events")))
}
