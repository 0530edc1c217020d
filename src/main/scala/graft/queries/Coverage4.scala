package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Coverage wave 5: the join shapes and aggregate outputs not yet in the
  * inventory — full outer join (null-extended on BOTH sides), explicit
  * cross join, and array-typed collect_set aggregates.
  *
  * Scale notes: the full outer join shuffles both sides on the key like
  * any shuffle join (full outer can never broadcast — every unmatched
  * row of either side must surface exactly once, so both sides need
  * complete key partitions); the cross join is only legal here because
  * one side is a 5-row broadcast dimension — an unconstrained cross
  * join at 100 TB is a plan bug, not an operator choice.
  */
object Coverage4 {

  private val dec6 = DecimalType(38, 6)

  def defs: Seq[GraftQuery] = Seq(

    // FULL OUTER JOIN with genuinely unmatched keys on both sides:
    // big spenders (aggregated orders) vs overdrawn customers. Output
    // keeps the nullable columns null — that's the semantics under test.
    GraftQuery(
      "q_full_outer_join",
      (s, dir) => {
        val spenders = Tables.table(s, dir, "orders")
          .filter(col("o_totalprice") > 150000.0d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_big_orders"),
            sum(col("o_totalprice").cast(dec6)).cast(DoubleType).as("big_total"))
        val overdrawn = Tables.table(s, dir, "customer")
          .filter(col("c_acctbal") < 0.0d)
          .select(col("c_custkey"), col("c_acctbal"))
        spenders.join(overdrawn, col("o_custkey") === col("c_custkey"), "full")
          .select(
            coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
            col("n_big_orders"),
            col("big_total"),
            col("c_acctbal").as("acctbal"))
      },
      Some("SELECT coalesce(o_custkey, c_custkey) AS custkey, " +
        "n_big_orders, big_total, c_acctbal AS acctbal FROM " +
        "(SELECT o_custkey, count(*) AS n_big_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS big_total " +
        "FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey) big " +
        "FULL JOIN (SELECT c_custkey, c_acctbal FROM customer " +
        "WHERE c_acctbal < 0) neg ON o_custkey = c_custkey")),

    // Explicit cross join: 5-region × 25-nation grid with a derived
    // label — the broadcast-dimension cartesian (calendar × category
    // scaffolds at scale). Spark requires crossJoin to be explicit.
    GraftQuery(
      "q_cross_join",
      (s, dir) => {
        val region = Tables.table(s, dir, "region").select(col("r_name"))
        val nation = Tables.table(s, dir, "nation")
          .select(col("n_name"), col("n_regionkey"))
        region.crossJoin(broadcast(nation))
          .select(col("r_name"), col("n_name"),
            concat(col("r_name"), lit("/"), col("n_name")).as("grid_cell"))
      },
      Some("SELECT r_name, n_name, r_name || '/' || n_name AS grid_cell " +
        "FROM region CROSS JOIN nation")),

    // Distinct-set aggregate output: collect_set is unordered by
    // contract, so sort_array canonicalizes and array_join flattens to
    // a scalar string — the comparison harness can't sort/hash array
    // cells (pandas lexsort rejects ndarray values), and the joined
    // form is the deterministic way to consume the set anyway.
    GraftQuery(
      "q_collect_set",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
              .as("statuses"),
            count_distinct(col("o_orderstatus")).as("n_statuses")),
      Some("SELECT o_orderpriority, " +
        "array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses, " +
        "count(DISTINCT o_orderstatus) AS n_statuses " +
        "FROM orders GROUP BY o_orderpriority")))
}
