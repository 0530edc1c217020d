package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Coverage wave: windowed distinct counting (the collect_set workaround
  * for Spark's missing DISTINCT window aggregates) and per-row z-scores
  * built from decimal power sums — exact cross-engine because every
  * float step (divide, subtract, sqrt) is an IEEE operation on
  * identical inputs.
  */
object Coverage8 {

  private val dec6 = DecimalType(38, 6)

  /** NOT IN's three-valued trap, asserted on both engines: a NULL in the
    * subquery's result poisons the whole predicate (x <> NULL is
    * UNKNOWN, so NOT IN can never be TRUE) — the poisoned count MUST be
    * zero while the null-free variant genuinely filters. Spark plans
    * this as a null-aware anti join, the physical shape that exists for
    * exactly this semantic.
    */
  private val notInNullsSql =
    "SELECT " +
      "(SELECT count(*) FROM orders WHERE o_custkey NOT IN " +
      "(SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)) AS n_clean, " +
      "(SELECT count(*) FROM orders WHERE o_custkey NOT IN " +
      "(SELECT CASE WHEN c_custkey % 7 = 0 THEN c_custkey END FROM customer)) " +
      "AS n_poisoned"

  def defs: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_not_in_nulls",
      (s, dir) => {
        Seq("orders", "customer").foreach(t =>
          Tables.table(s, dir, t).createOrReplaceTempView(t))
        s.sql(notInNullsSql)
      },
      Some(notInNullsSql)),

    // Distinct count over a running window: Spark has no DISTINCT window
    // aggregate, so the idiom is size(collect_set() OVER w); DuckDB has
    // the native form — both must agree row by row.
    GraftQuery(
      "q_window_count_distinct",
      (s, dir) => {
        // raw table: ordering on `ts` is vintage-independent (epoch
        // nanos and timestamp[us] sort identically)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.table(s, dir, "events")
          .filter(col("user_id") < 100)
          .select(col("event_id"), col("user_id"),
            size(collect_set(col("event_type")).over(w)).as("distinct_types_so_far"))
      },
      Some("SELECT event_id, user_id, " +
        "CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id " +
        "ORDER BY epoch_ns(ts), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) " +
        "AS distinct_types_so_far " +
        "FROM events WHERE user_id < 100")),

    // Per-row z-score against the row's group: mean and variance come
    // from DECIMAL power sums (order-independent), and the remaining
    // steps — two divides, a subtract, a sqrt — are IEEE-exact on both
    // engines, so the z-scores match bit for bit with no rounding.
    GraftQuery(
      "q_window_zscore",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
        val n = count(lit(1)).over(byUser).cast(DoubleType)
        val sx = sum(col("value").cast(dec6)).over(byUser).cast(DoubleType)
        val sxx = sum((col("value") * col("value")).cast(dec6))
          .over(byUser).cast(DoubleType)
        val mean = sx / n
        val variance = (sxx - sx * sx / n) / (n - lit(1.0d))
        Tables.table(s, dir, "events")
          .filter(col("user_id") < 200)
          .select(col("event_id"), col("user_id"), col("value"),
            ((col("value") - mean) / sqrt(variance)).as("zscore"))
      },
      Some("SELECT event_id, user_id, value, " +
        "(value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1.0)) AS zscore " +
        "FROM (SELECT event_id, user_id, value, " +
        "CAST(count(*) OVER w AS DOUBLE) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxx " +
        "FROM events WHERE user_id < 200 " +
        "WINDOW w AS (PARTITION BY user_id))")),

    // 2-D histogram: joint (hour-of-day × value-decile) counts — the
    // binning pass behind heatmaps and drift monitors. Both axes are
    // exact integer arithmetic (integral division on nanos, width_bucket
    // on a fixed [0,100) domain), so the cells match exactly.
    GraftQuery(
      "q_histogram_2d",
      (s, dir) => Tables.events(s, dir)
        .groupBy(
          expr("(ts_ns div 3600000000000) % 24").as("hour_of_day"),
          expr("width_bucket(value, 0, 100, 10)").as("value_decile"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec6)).cast(DoubleType).as("v_sum")),
      // DuckDB lacks width_bucket: spell the same [0,100)/10 binning as
      // a guarded floor (bucket 0 below range, 11 at/above the top)
      Some("SELECT (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day, " +
        "CASE WHEN value < 0 THEN 0 WHEN value >= 100 THEN 11 " +
        "ELSE CAST(floor(value / 10) AS BIGINT) + 1 END AS value_decile, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v_sum " +
        "FROM events GROUP BY 1, 2")),

    // Outlier clipping by percentile band: per-type p05/p95 bounds
    // (percentile_disc — actual data values, exact) broadcast back onto
    // the rows, keeping only in-band values. The standard robust-
    // cleaning pass before training-statistics aggregation.
    GraftQuery(
      "q_outlier_clip",
      (s, dir) => {
        val bounds = Tables.table(s, dir, "events")
          .groupBy(col("event_type").as("bt"))
          .agg(
            expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").as("lo"),
            expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("hi"))
        Tables.table(s, dir, "events")
          .join(broadcast(bounds), col("event_type") === col("bt"))
          .filter(col("value") >= col("lo") && col("value") <= col("hi"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("value").cast(dec6)).cast(DoubleType).as("kept_sum"))
      },
      Some("WITH b AS (SELECT event_type AS bt, " +
        "quantile_disc(value, 0.05) AS lo, quantile_disc(value, 0.95) AS hi " +
        "FROM events GROUP BY event_type) " +
        "SELECT event_type, count(*) AS n_kept, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS kept_sum " +
        "FROM events JOIN b ON event_type = bt " +
        "WHERE value >= lo AND value <= hi GROUP BY event_type")),

    // Triangle counting on the same deterministic synthetic link graph
    // the PageRank query uses: canonicalize to undirected a<b edges,
    // then the standard two-hop equi-join chain counts each triangle
    // exactly once under a<b<c. At real scale the join order would sort
    // vertices by DEGREE (not id) to bound the hub vertex's fan-out —
    // same plan shape, different canonical order.
    GraftQuery(
      "graph_triangles",
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val n = docs.agg(count(lit(1)).as("n"))
        val raw = docs.crossJoin(broadcast(n))
          .select(col("doc_id").as("src"),
            explode(array(Seq(1, 2, 3).map(j =>
              (col("doc_id") * 31 + j * 7) % col("n")): _*)).as("dst"))
        val und = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        und.as("e1")
          .join(und.as("e2"), col("e1.b") === col("e2.a"))
          .join(und.as("e3"),
            col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
          .agg(count(lit(1)).as("n_triangles"))
      },
      Some("WITH nn AS (SELECT count(*) AS n FROM documents), " +
        "raw AS (SELECT doc_id AS src, (doc_id * 31 + j * 7) % nn.n AS dst " +
        "FROM documents, nn, UNNEST([1, 2, 3]) AS u(j)), " +
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b " +
        "FROM raw WHERE src <> dst) " +
        "SELECT count(*) AS n_triangles " +
        "FROM und e1 JOIN und e2 ON e1.b = e2.a " +
        "JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b"))
  )
}
