package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Third coverage wave: map-typed columns and their function surface,
  * skew-resistant salted joins, deterministic content-hash sampling,
  * a scalable global running total (token-budget corpus selection), and
  * per-label embedding centroids in exact integer-micros arithmetic.
  */
object Coverage3 {

  private val dec6 = DecimalType(38, 6)

  def defs: Seq[GraftQuery] = Seq(

    // Map-typed column surface: construction from arrays, keys/values,
    // per-entry transforms and filters, concat, membership. Outputs are
    // scalars/sorted strings so the comparator sees deterministic values;
    // the DuckDB oracle computes the same semantics from the token list
    // (no MAP type needed on the oracle side).
    GraftQuery(
      "q_map_funcs",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val ks = array_distinct(slice(toks, 1, 6))
        val m = map_from_arrays(ks, transform(ks, x => length(x)))
        Tables.table(s, dir, "documents").select(
          col("doc_id"),
          size(m).cast(LongType).as("n_keys"),
          array_join(array_sort(map_keys(m)), ",").as("keys_sorted"),
          aggregate(map_values(m), lit(0), (a, x) => a + x)
            .cast(LongType).as("total_len"),
          size(map_filter(m, (_, v) => v > 4)).cast(LongType).as("n_long"),
          aggregate(map_values(transform_values(m, (_, v) => v * 2)), lit(0),
            (a, x) => a + x).cast(LongType).as("doubled_len"),
          map_contains_key(m, "the").as("has_the"),
          size(map_concat(m, map(lit("§sentinel§"), lit(0))))
            .cast(LongType).as("n_keys_plus"))
      },
      Some("WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')[1:6]) AS ks " +
        "FROM documents) " +
        "SELECT doc_id, CAST(len(ks) AS BIGINT) AS n_keys, " +
        "array_to_string(list_sort(ks), ',') AS keys_sorted, " +
        "CAST(list_sum(list_transform(ks, x -> length(x))) AS BIGINT) AS total_len, " +
        "CAST(len(list_filter(ks, x -> length(x) > 4)) AS BIGINT) AS n_long, " +
        "CAST(2 * list_sum(list_transform(ks, x -> length(x))) AS BIGINT) AS doubled_len, " +
        "list_contains(ks, 'the') AS has_the, " +
        "CAST(len(ks) + 1 AS BIGINT) AS n_keys_plus FROM t")),

    // Salted skew join under the oracle gate: the salted formulation must
    // be row-identical to the plain join, so the oracle is simply the
    // plain join + aggregation.
    GraftQuery(
      "q_skew_join_salted",
      (s, dir) => {
        val lineitem = Tables.table(s, dir, "lineitem")
        val part = Tables.table(s, dir, "part")
          .withColumnRenamed("p_partkey", "l_partkey")
        graft.operators.SaltedJoin
          .join(lineitem, part, Seq("l_partkey"), buckets = 8)
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast(dec6)).cast(DoubleType).as("revenue"))
      },
      Some("SELECT p_brand, count(*) AS n_items, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand")),

    // Deterministic content-hash sampling: an md5 prefix threshold keeps a
    // uniform ~10% slice that is stable across engines, runs, partitions,
    // and cluster sizes — the reproducible-sample primitive a training
    // pipeline wants (seeded RNG sampling is engine-specific; q_sample
    // keeps that variant).
    GraftQuery(
      "q_sample_hash",
      (s, dir) => {
        val key = concat_ws("-",
          col("l_orderkey").cast(StringType),
          col("l_linenumber").cast(StringType))
        Tables.table(s, dir, "lineitem")
          .withColumn("bucket", substring(md5(key), 1, 2))
          .filter(col("bucket") < "1a")
          .select(col("l_orderkey"), col("l_linenumber"), col("bucket"))
      },
      Some("SELECT l_orderkey, l_linenumber, " +
        "substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) AS bucket " +
        "FROM lineitem " +
        "WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'")),

    // Deterministic stratified sampling: per-class md5 thresholds (5% /
    // 20% / 10%) — the reproducible rebalancing step, exact-checkable
    // unlike the seeded-RNG q_sample_stratified it complements.
    GraftQuery(
      "q_sample_stratified_hash",
      (s, dir) => {
        val key = concat_ws("-",
          col("l_orderkey").cast(StringType),
          col("l_linenumber").cast(StringType))
        val threshold = when(col("l_returnflag") === "A", lit("0d"))
          .when(col("l_returnflag") === "N", lit("33"))
          .otherwise(lit("1a"))
        Tables.table(s, dir, "lineitem")
          .withColumn("bucket", substring(md5(key), 1, 2))
          .filter(col("bucket") < threshold)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      },
      Some("WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag, " +
        "substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) AS bucket, " +
        "CASE WHEN l_returnflag = 'A' THEN '0d' WHEN l_returnflag = 'N' THEN '33' " +
        "ELSE '1a' END AS threshold FROM lineitem) " +
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM t WHERE bucket < threshold")),

    // Token-budget corpus selection: take documents in quality order until
    // the token budget is spent. The running total uses the distributed
    // prefix-sum operator (range partition + offset broadcast), not a
    // single-partition global window — same result, no scale cliff.
    // Budgets count REAL merge-table BPE tokens under the frozen vocab
    // (BpeVocab.Default — whitespace/regex counts differ 1.3–2× on
    // non-English/code text, so a budget in estimator tokens over- or
    // under-buys the corpus); the oracle replays the merge sequence in
    // SQL (BpeEncode.oracleCountSql).
    GraftQuery(
      "pipe_token_budget",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            size(graft.functions.GraftFunctions.bpe_encode(
              col("text"), graft.functions.BpeVocab.Default))
              .cast(LongType).as("n_tok"))
        graft.operators.PrefixSum
          .runningTotal(docs,
            Seq(col("n_chars").desc, col("doc_id").asc),
            col("n_tok"), "cum_tok")
          .filter(col("cum_tok") <= 15000)
          .select(col("doc_id"), col("n_tok"), col("cum_tok"))
      },
      Some("WITH t AS (SELECT doc_id, n_chars, " +
        graft.functions.BpeEncode.oracleCountSql(
          graft.functions.BpeVocab.Default, "text") +
        " AS n_tok FROM documents), " +
        "c AS (SELECT doc_id, n_tok, CAST(SUM(n_tok) OVER (" +
        "ORDER BY n_chars DESC, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok FROM t) " +
        "SELECT doc_id, n_tok, cum_tok FROM c WHERE cum_tok <= 15000")),

    // Per-label embedding centroid, long form (label, dimension) — the
    // cluster-summary step of embedding-space analysis. Elements are
    // quantized to integer micros (floor(x·1e6 + 0.5), identical IEEE ops
    // in both engines) so the sums are exact integers: order-independent
    // and bit-identical at any parallelism.
    GraftQuery(
      "sim_label_centroid",
      (s, dir) =>
        Tables.table(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
          .select(col("label"),
            (col("pos0") + 1).cast(LongType).as("pos"),
            floor(col("v").cast(DoubleType) * lit(1e6) + lit(0.5))
              .cast(LongType).as("vq"))
          .groupBy(col("label"), col("pos"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("vq")).as("sum_q6")),
      Some("WITH e AS (SELECT label, " +
        "generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v " +
        "FROM embeddings) " +
        "SELECT label, CAST(pos AS BIGINT) AS pos, count(*) AS n_vecs, " +
        "CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_q6 " +
        "FROM e GROUP BY label, pos")),

    // Higher-order array functions: predicates (exists/forall), filter,
    // zip via flatten, sequence generation folded with aggregate.
    GraftQuery(
      "q_array_hof",
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.table(s, dir, "documents").select(
          col("doc_id"),
          forall(toks, x => length(x) > 2).as("all_long"),
          exists(toks, x => x === "the").as("any_the"),
          size(filter(toks, x => length(x) === 3)).cast(LongType).as("n_len3"),
          array_join(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2))), ",")
            .as("head4_flat"),
          aggregate(sequence(lit(1L), size(toks).cast(LongType)), lit(0L),
            (a, x) => a + x).as("seq_sum"))
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) " +
        "SELECT doc_id, " +
        "NOT list_bool_or(list_transform(toks, x -> length(x) <= 2)) AS all_long, " +
        "list_contains(toks, 'the') AS any_the, " +
        "CAST(len(list_filter(toks, x -> length(x) = 3)) AS BIGINT) AS n_len3, " +
        "array_to_string(flatten([toks[1:2], toks[3:4]]), ',') AS head4_flat, " +
        "CAST(len(toks) AS BIGINT) * (len(toks) + 1) // 2 AS seq_sum FROM t")),

    // Event-time RANGE window frame: a sliding one-hour sum keyed on the
    // microsecond timestamp value (not row counts) — peers at equal
    // timestamps aggregate identically on both engines.
    GraftQuery(
      "q_window_range_frame",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts")))
          .select(
            col("event_id"), col("user_id"), col("ts_us"),
            sum(col("value").cast(dec6)).over(w).cast(DoubleType).as("hour_sum"),
            count(lit(1)).over(w).as("hour_n"))
      },
      Some("SELECT event_id, user_id, epoch_us(ts) AS ts_us, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS hour_sum, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS hour_n FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)")),

    // Calendar truncation family over timestamps: month/week/quarter
    // starts (ISO Monday weeks in both engines), month ends, month
    // arithmetic, day distances.
    GraftQuery(
      "q_date_trunc",
      (s, dir) =>
        Tables.table(s, dir, "orders").select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
          date_trunc("week", col("o_orderdate")).cast(DateType).as("week_start"),
          date_trunc("quarter", col("o_orderdate")).cast(DateType).as("quarter_start"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(col("o_orderdate").cast(DateType), 3).as("plus_3mo"),
          datediff(lit("2026-01-01").cast(DateType), col("o_orderdate").cast(DateType))
            .cast(LongType).as("days_to_2026")),
      Some("SELECT o_orderkey, " +
        "date_trunc('month', o_orderdate) AS month_start, " +
        "date_trunc('week', o_orderdate) AS week_start, " +
        "date_trunc('quarter', o_orderdate) AS quarter_start, " +
        "last_day(o_orderdate) AS month_end, " +
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo, " +
        "date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS days_to_2026 " +
        "FROM orders")),

    // Exact median (interpolating, the even-count average is one IEEE op
    // on identical inputs in both engines) per group.
    GraftQuery(
      "q_median",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            median(col("l_quantity")).as("med_qty"),
            median(col("l_extendedprice")).as("med_price"),
            count(lit(1)).as("n")),
      Some("SELECT l_returnflag, median(l_quantity) AS med_qty, " +
        "median(l_extendedprice) AS med_price, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag")),

    // Least-squares regression per group from decimal power sums: the
    // sums are order-independent (exact decimal), the closing double
    // arithmetic has identical expression shape on both engines, and the
    // result is truncated through DECIMAL(38,6) to absorb the last ulp
    // (same recipe as q_stats_moments).
    GraftQuery(
      "q_regression",
      (s, dir) => {
        val x = col("l_quantity")
        val y = col("l_extendedprice")
        val n = count(lit(1)).cast(DoubleType)
        def decSum(c: org.apache.spark.sql.Column) =
          sum(c.cast(dec6)).cast(DoubleType)
        val sx = decSum(x); val sy = decSum(y)
        val sxx = decSum(x * x); val syy = decSum(y * y); val sxy = decSum(x * y)
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        val intercept = (sy - slope * sx) / n
        val r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          ((n * sxx - sx * sx) * (n * syy - sy * sy))
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .agg(
            slope.cast(dec6).cast(DoubleType).as("slope"),
            intercept.cast(dec6).cast(DoubleType).as("intercept"),
            r2.cast(dec6).cast(DoubleType).as("r2"),
            count(lit(1)).as("n"))
      },
      Some {
        def ds(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"
        val n = "CAST(count(*) AS DOUBLE)"
        val sx = ds("l_quantity"); val sy = ds("l_extendedprice")
        val sxx = ds("l_quantity * l_quantity")
        val syy = ds("l_extendedprice * l_extendedprice")
        val sxy = ds("l_quantity * l_extendedprice")
        val slope = s"(($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx))"
        val intercept = s"(($sy - $slope * $sx) / $n)"
        val r2 = s"((($n * $sxy - $sx * $sy) * ($n * $sxy - $sx * $sy)) / " +
          s"(($n * $sxx - $sx * $sx) * ($n * $syy - $sy * $sy)))"
        "SELECT l_linestatus, " +
          s"CAST(CAST($slope AS DECIMAL(38,6)) AS DOUBLE) AS slope, " +
          s"CAST(CAST($intercept AS DECIMAL(38,6)) AS DOUBLE) AS intercept, " +
          s"CAST(CAST($r2 AS DECIMAL(38,6)) AS DOUBLE) AS r2, " +
          "count(*) AS n FROM lineitem GROUP BY l_linestatus"
      }),

    // HLL sketch build + merge — the 100 TB distinct-count pattern:
    // per-group sketches in one pass, a sketch UNION (not a re-scan)
    // rolls them up globally. Estimates are sketch-implementation-
    // specific, so the result carries the EXACT distinct count plus a
    // verdict cell bounding the merged estimate's relative error at 10%
    // (measured ≤ 2.2% across SFs).
    GraftQuery(
      "q_hll_merge",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val merged = li
          .groupBy(col("l_returnflag"))
          .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
          .agg(
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
            count(lit(1)).as("n_sketches"))
        li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
          .crossJoin(merged)
          .select(
            col("exact_orders"), col("n_sketches"),
            when(abs(col("est") - col("exact_orders")) <=
              col("exact_orders") * lit(0.10), lit(1L)).otherwise(lit(0L)).as("est_ok"))
      },
      Some("SELECT count(DISTINCT l_orderkey) AS exact_orders, " +
        "count(DISTINCT l_returnflag) AS n_sketches, " +
        "CAST(1 AS BIGINT) AS est_ok FROM lineitem")))
}
