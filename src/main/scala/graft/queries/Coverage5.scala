package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Coverage wave 6: the aggregate/function surface still missing from
  * the inventory — higher central moments (skewness/kurtosis), bitwise
  * and boolean aggregates, and the map construction/transformation
  * family with null-preserving explode.
  *
  * Moments follow the q_stats_moments recipe: order-independent decimal
  * power sums per group (one shuffle, map-side combinable), double math
  * only on the handful of per-group totals, DECIMAL(38,6) cast for a
  * canonical value. sqrt(v)*v replaces pow(v, 1.5) because sqrt is
  * IEEE-correctly-rounded in both engines while pow need not be.
  */
object Coverage5 {

  private val dec6 = DecimalType(38, 6)
  private def decSum(c: Column): Column =
    sum(c.cast(dec6)).cast(DoubleType)

  def defs: Seq[GraftQuery] = Seq(

    // Population skewness and excess kurtosis from raw power sums.
    // The formula tree is replicated token-for-token in the oracle so
    // every IEEE double op sees identical operands.
    GraftQuery(
      "q_moments34",
      (s, dir) => {
        val x = col("l_quantity")
        val n = count(lit(1)).cast(DoubleType)
        val s1 = decSum(x); val s2 = decSum(x * x)
        val s3 = decSum(x * x * x); val s4 = decSum(x * x * x * x)
        val m = s1 / n
        val v = s2 / n - m * m
        val skew = (s3 / n - lit(3.0d) * m * (s2 / n) + lit(2.0d) * m * m * m) /
          (sqrt(v) * v)
        val kurt = (s4 / n - lit(4.0d) * m * (s3 / n) +
          lit(6.0d) * m * m * (s2 / n) - lit(3.0d) * m * m * m * m) / (v * v) -
          lit(3.0d)
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            skew.cast(dec6).cast(DoubleType).as("skew_qty"),
            kurt.cast(dec6).cast(DoubleType).as("kurt_qty"))
      },
      Some("WITH g AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1, " +
        "CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2, " +
        "CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3, " +
        "CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s4 " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, " +
        "CAST(CAST((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n)) / " +
        "(sqrt(s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) AS DECIMAL(38,6)) AS DOUBLE) AS skew_qty, " +
        "CAST(CAST((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n) - " +
        "3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n)) / " +
        "((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0 AS DECIMAL(38,6)) AS DOUBLE) AS kurt_qty " +
        "FROM g")),

    // Bitwise and boolean aggregates — flag-mask rollups (bit_or of a
    // permission/feature mask) and every/any predicates per group.
    GraftQuery(
      "q_agg_bits_bools",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            bit_or(col("l_linenumber")).cast("long").as("mask_or"),
            bit_and(col("l_linenumber")).cast("long").as("mask_and"),
            bit_xor(col("l_linenumber")).cast("long").as("mask_xor"),
            bool_and(col("l_quantity") > 0.0d).as("all_positive"),
            bool_or(col("l_discount") > 0.09d).as("any_deep_discount")),
      Some("SELECT l_returnflag, " +
        "CAST(bit_or(l_linenumber) AS BIGINT) AS mask_or, " +
        "CAST(bit_and(l_linenumber) AS BIGINT) AS mask_and, " +
        "CAST(bit_xor(l_linenumber) AS BIGINT) AS mask_xor, " +
        "bool_and(l_quantity > 0.0) AS all_positive, " +
        "bool_or(l_discount > 0.09) AS any_deep_discount " +
        "FROM lineitem GROUP BY l_returnflag")),

    // Map construction from delimited text (str_to_map), key/value
    // rewriting (transform_keys/transform_values), map_concat, and
    // null-preserving explode_outer: rows whose map is null still
    // surface once with null key/value — the LEFT JOIN semantics of
    // unnesting, which plain explode silently drops.
    GraftQuery(
      "q_map_explode_outer",
      (s, dir) => {
        val m = str_to_map(
          concat(lit("prio:"), col("o_orderpriority"),
            lit(",stat:"), col("o_orderstatus")),
          lit(","), lit(":"))
        val rewritten = map_concat(
          transform_values(
            transform_keys(m, (k, _) => upper(k)),
            (_, v) => lower(v)),
          map(lit("SRC"), lit("orders")))
        Tables.table(s, dir, "orders")
          .filter(col("o_orderkey") <= 1000)
          .select(col("o_orderkey"),
            explode_outer(when(col("o_orderkey") % 10 =!= 0, rewritten))
              .as(Seq("k", "v")))
      },
      Some("WITH base AS (SELECT o_orderkey, o_orderpriority, o_orderstatus " +
        "FROM orders WHERE o_orderkey <= 1000) " +
        "SELECT o_orderkey, NULL AS k, NULL AS v FROM base WHERE o_orderkey % 10 = 0 " +
        "UNION ALL " +
        "SELECT o_orderkey, 'PRIO' AS k, lower(o_orderpriority) AS v FROM base WHERE o_orderkey % 10 <> 0 " +
        "UNION ALL " +
        "SELECT o_orderkey, 'STAT' AS k, lower(o_orderstatus) AS v FROM base WHERE o_orderkey % 10 <> 0 " +
        "UNION ALL " +
        "SELECT o_orderkey, 'SRC' AS k, 'orders' AS v FROM base WHERE o_orderkey % 10 <> 0")),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys
    // MATCH each other instead of vanishing — the join you need when a
    // nullable dimension key is a real category ("unknown") rather than
    // an absence. Plans as a normal hash join on the null-safe key.
    GraftQuery(
      "q_nullsafe_join",
      (s, dir) => {
        val k = expr("nullif(o_orderstatus, 'O')")
        val counts = Tables.table(s, dir, "orders")
          .groupBy(k.as("k")).agg(count(lit(1)).as("n_orders"))
        val totals = Tables.table(s, dir, "orders")
          .groupBy(k.as("k2"))
          .agg(sum(col("o_totalprice").cast(dec6)).cast(DoubleType).as("total"))
        counts.join(totals, col("k") <=> col("k2"))
          .select(col("k").as("status_key"), col("n_orders"), col("total"))
      },
      Some("WITH c AS (SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_orders " +
        "FROM orders GROUP BY 1), " +
        "t AS (SELECT nullif(o_orderstatus, 'O') AS k2, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total " +
        "FROM orders GROUP BY 1) " +
        "SELECT c.k AS status_key, c.n_orders, t.total " +
        "FROM c JOIN t ON c.k IS NOT DISTINCT FROM t.k2")))
}
