package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Second coverage wave: correlated subqueries (EXISTS / IN / LATERAL,
  * via the SQL entry point), ranking window functions, framed
  * first/last/nth, try_-prefixed safe arithmetic, bitwise ops, timestamp
  * part extraction, unpivot/melt, a range (band) join against an inline
  * dimension, width_bucket histogramming, regex functions, array
  * functions, and batch session windows.
  */
object Coverage2 {

  private val dec6 = DecimalType(38, 6)
  private def decSum(c: Column): Column = sum(c.cast(dec6)).cast(DoubleType)

  /** SQL-text entry point: register the named tables as temp views and run
    * the statement through the engine's SQL surface.
    */
  private def sqlQuery(s: SparkSession, dir: String, tables: Seq[String], q: String): DataFrame = {
    tables.foreach(t => Tables.table(s, dir, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  def defs: Seq[GraftQuery] = Seq(

    // Correlated EXISTS + NOT EXISTS — planned as semi/anti joins; the
    // same text runs on both engines.
    GraftQuery(
      "q_exists_subquery",
      (s, dir) => sqlQuery(s, dir, Seq("customer", "orders"),
        """SELECT c_custkey, c_name FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             AND NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')"""),
      Some("SELECT c_custkey, c_name FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') " +
        "AND NOT EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')")),

    // IN / NOT IN subqueries (null-free keys, so NOT IN is well-defined).
    GraftQuery(
      "q_in_subquery",
      (s, dir) => sqlQuery(s, dir, Seq("customer", "orders", "lineitem"),
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
             AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09)"""),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') " +
        "AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09)")),

    // LATERAL correlated subquery with per-row ORDER BY + LIMIT (the
    // top-1-per-group idiom as a join operator).
    GraftQuery(
      "q_lateral_topk",
      (s, dir) => sqlQuery(s, dir, Seq("customer", "orders"),
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           FROM customer c, LATERAL (
             SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t"""),
      Some("SELECT c.c_custkey, t.o_orderkey, t.o_totalprice " +
        "FROM customer c, LATERAL (" +
        "SELECT o_orderkey, o_totalprice FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t")),

    // Ranking window-function family. rank counts ties; ntile needs a
    // total order for determinism.
    GraftQuery(
      "q_window_rank_funcs",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            rank().over(w).cast(LongType).as("rnk"),
            dense_rank().over(w).cast(LongType).as("drnk"),
            ntile(4).over(w).cast(LongType).as("quartile"),
            percent_rank().over(w).as("prank"),
            cume_dist().over(w).as("cdist"))
      },
      Some("SELECT o_orderkey, " +
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "percent_rank() OVER w AS prank, cume_dist() OVER w AS cdist " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC)")),

    // first/last/nth over an explicit full frame (default frames for
    // last_value stop at CURRENT ROW — the classic gotcha, made explicit).
    GraftQuery(
      "q_window_first_last",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            first(col("o_totalprice")).over(w).as("best_price"),
            last(col("o_totalprice")).over(w).as("worst_price"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      },
      Some("SELECT o_orderkey, " +
        "first_value(o_totalprice) OVER w AS best_price, " +
        "last_value(o_totalprice) OVER w AS worst_price, " +
        "nth_value(o_totalprice, 2) OVER w AS second_price " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)")),

    // try_-prefixed safe arithmetic: NULL instead of error/Inf under ANSI.
    GraftQuery(
      "q_try_arith",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            try_divide(lit(10), col("l_linenumber") - lit(1)).as("safe_div"),
            try_add(col("l_orderkey"), lit(1L)).as("next_key")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_linenumber - 1 = 0 THEN NULL " +
        "ELSE 10 / (l_linenumber - 1) END AS safe_div, " +
        "l_orderkey + 1 AS next_key FROM lineitem")),

    // Bitwise operator surface over bigint keys.
    GraftQuery(
      "q_bitwise",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_orderkey").bitwiseAND(lit(255L)).as("k_and"),
            col("l_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
            col("l_orderkey").bitwiseXOR(lit(255L)).as("k_xor"),
            shiftleft(col("l_linenumber"), 3).cast(LongType).as("ln_shl"),
            shiftright(col("l_orderkey"), 2).as("k_shr"),
            bit_count(col("l_orderkey")).cast(LongType).as("k_bits")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "l_orderkey & 255 AS k_and, l_orderkey | 4096 AS k_or, " +
        "xor(l_orderkey, 255) AS k_xor, " +
        "CAST(l_linenumber << 3 AS BIGINT) AS ln_shl, " +
        "l_orderkey >> 2 AS k_shr, " +
        "CAST(bit_count(l_orderkey) AS BIGINT) AS k_bits FROM lineitem")),

    // Timestamp part extraction at micros resolution (UTC both sides).
    GraftQuery(
      "q_ts_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("t", timestamp_micros(expr("ts_ns div 1000")))
          .select(
            col("event_id"),
            year(col("t")).cast(LongType).as("y"),
            month(col("t")).cast(LongType).as("mo"),
            dayofmonth(col("t")).cast(LongType).as("d"),
            hour(col("t")).cast(LongType).as("h"),
            minute(col("t")).cast(LongType).as("mi"),
            second(col("t")).cast(LongType).as("sec"),
            unix_micros(col("t")).as("us")),
      Some("SELECT event_id, year(ts) AS y, month(ts) AS mo, day(ts) AS d, " +
        "hour(ts) AS h, minute(ts) AS mi, CAST(second(ts) AS BIGINT) AS sec, " +
        "epoch_us(ts) AS us FROM events")),

    // Unpivot / melt: wide metrics to (metric, value) long form.
    GraftQuery(
      "q_unpivot",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "value"),
      Some("SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem")),

    // Range (band) join against a broadcast inline dimension — the
    // classic bucketed-fact-by-bands shape; planned as a broadcast
    // nested-loop join, never a shuffle.
    GraftQuery(
      "q_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          (0.0d, 100000.0d, "small"),
          (100000.0d, 250000.0d, "medium"),
          (250000.0d, 1000000.0d, "large")).toDF("lo", "hi", "label")
        Tables.table(s, dir, "orders")
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total"))
      },
      Some("SELECT label, count(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total " +
        "FROM orders JOIN (VALUES " +
        "(CAST(0 AS DOUBLE), CAST(100000 AS DOUBLE), 'small'), " +
        "(CAST(100000 AS DOUBLE), CAST(250000 AS DOUBLE), 'medium'), " +
        "(CAST(250000 AS DOUBLE), CAST(1000000 AS DOUBLE), 'large')) " +
        "AS b(lo, hi, label) ON o_totalprice >= lo AND o_totalprice < hi " +
        "GROUP BY label")),

    // width_bucket histogramming. Power-of-two bounds keep the internal
    // (x-min)/step division exact in double, so the manual DuckDB
    // formulation lands every boundary identically.
    GraftQuery(
      "q_width_bucket",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(width_bucket(col("o_totalprice"), lit(0.0d), lit(524288.0d), lit(8))
            .as("bucket"))
          .agg(count(lit(1)).as("n")),
      Some("SELECT CASE WHEN o_totalprice < 0 THEN 0 " +
        "WHEN o_totalprice >= 524288 THEN 9 " +
        "ELSE CAST(floor(o_totalprice / 65536) AS BIGINT) + 1 END AS bucket, " +
        "count(*) AS n FROM orders GROUP BY 1")),

    // Regex surface: extract (both engines return '' on no match),
    // replace-all (DuckDB needs the 'g' flag), boolean match.
    GraftQuery(
      "q_regexp",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
            length(regexp_replace(col("text"), "[^0-9]", "")).cast(LongType).as("n_digits"),
            col("text").rlike("[0-9]").as("has_number")),
      Some("SELECT doc_id, regexp_extract(text, '([A-Za-z]+)', 1) AS first_word, " +
        "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits, " +
        "regexp_matches(text, '[0-9]') AS has_number FROM documents")),

    // Array-function surface over tokenized text (serialized to strings
    // for the comparator).
    GraftQuery(
      "q_array_funcs",
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            size(toks).cast(LongType).as("n_tokens"),
            array_contains(toks, "the").as("has_the"),
            concat_ws(" ", slice(toks, 1, 5)).as("head5"),
            concat_ws(" ", reverse(slice(toks, 1, 5))).as("head5_rev"),
            concat_ws(" ", array_sort(array_distinct(slice(toks, 1, 8)))).as("head8_sorted"))
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "list_contains(toks, 'the') AS has_the, " +
        "array_to_string(toks[1:5], ' ') AS head5, " +
        "array_to_string(list_reverse(toks[1:5]), ' ') AS head5_rev, " +
        "array_to_string(list_sort(list_distinct(toks[1:8])), ' ') AS head8_sorted " +
        "FROM t")),

    // Second string-function wave: edit distance, padding, char/codepoint
    // conversion, translate, anchored substrings, search, field split.
    GraftQuery(
      "q_string_funcs2",
      (s, dir) =>
        Tables.table(s, dir, "customer")
          .select(
            col("c_custkey"),
            levenshtein(col("c_name"), col("c_mktsegment")).cast(LongType).as("lev"),
            repeat(col("c_mktsegment"), 2).as("seg2"),
            lpad(col("c_custkey").cast(StringType), 10, "0").as("key_padded"),
            rpad(col("c_mktsegment"), 12, ".").as("seg_padded"),
            ascii(col("c_name")).cast(LongType).as("first_cp"),
            expr("char(c_custkey % 26 + 65)").as("key_letter"),
            translate(col("c_name"), "#0", "@X").as("name_translated"),
            expr("left(c_name, 8)").as("name_head"),
            expr("right(c_name, 6)").as("name_tail"),
            instr(col("c_name"), "#").cast(LongType).as("hash_pos"),
            expr("split_part(c_name, '#', 2)").as("name_num")),
      Some("SELECT c_custkey, " +
        "CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev, " +
        "repeat(c_mktsegment, 2) AS seg2, " +
        "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded, " +
        "rpad(c_mktsegment, 12, '.') AS seg_padded, " +
        "CAST(ascii(c_name) AS BIGINT) AS first_cp, " +
        "chr(CAST(c_custkey % 26 + 65 AS INT)) AS key_letter, " +
        "translate(c_name, '#0', '@X') AS name_translated, " +
        "left(c_name, 8) AS name_head, right(c_name, 6) AS name_tail, " +
        "CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos, " +
        "split_part(c_name, '#', 2) AS name_num FROM customer")),

    // Salted two-phase aggregation under the oracle gate: the
    // skew-resistant formulation must produce bit-identical results to
    // the direct groupBy (decomposable aggregates + order-independent
    // decimal sums), so the oracle is simply the plain aggregation.
    GraftQuery(
      "q_salted_agg",
      (s, dir) =>
        graft.operators.SaltedAgg.saltedAgg(
          Tables.table(s, dir, "lineitem"),
          keys = Seq("l_returnflag"), saltBuckets = 16)(
          graft.operators.SaltedAgg.Spec(
            sums = Seq(col("l_extendedprice") -> "total_price"),
            counts = Seq("n_rows"),
            maxs = Seq(col("l_quantity") -> "max_qty"),
            mins = Seq(col("l_quantity") -> "min_qty"))),
      Some("SELECT l_returnflag, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price, " +
        "count(*) AS n_rows, max(l_quantity) AS max_qty, min(l_quantity) AS min_qty " +
        "FROM lineitem GROUP BY l_returnflag")),

    // Text normalization: the canonicalization pass ahead of exact
    // dedup — trim, lowercase, collapse whitespace runs.
    GraftQuery(
      "txt_normalize",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm_text"),
            md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("norm_fp")),
      Some("SELECT doc_id, " +
        "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text, " +
        "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS norm_fp " +
        "FROM documents")),

    // Stratified sampling: per-class fractions (the rebalancing step a
    // training-data pipeline runs over language/source labels). The RNG
    // stream is engine-specific, so each stratum row carries a
    // deterministic VERDICT cell: the stratum sample size is binomial
    // around f_k·N_k, bounded at 5σ (measured dev ≤ 2.2σ across SFs).
    // A missing stratum drops its row (inner join) → loud row-count
    // mismatch at the gate.
    GraftQuery(
      "q_sample_stratified",
      (s, dir) => {
        val fractions = Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.1)
        val li = Tables.table(s, dir, "lineitem")
        val f = element_at(typedlit(fractions), col("l_returnflag"))
        val sampled = li.stat.sampleBy("l_returnflag", fractions, 42L)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_sampled"))
        li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_stratum"))
          .join(sampled, Seq("l_returnflag"))
          .select(
            col("l_returnflag"), col("n_stratum"),
            when(abs(col("n_sampled") - col("n_stratum") * f) <=
                lit(5.0) * sqrt(col("n_stratum") * f * (lit(1.0) - f)), lit(1L))
              .otherwise(lit(0L)).as("size_ok"))
      },
      Some("SELECT l_returnflag, count(*) AS n_stratum, " +
        "CAST(1 AS BIGINT) AS size_ok FROM lineitem GROUP BY l_returnflag")),

    // Struct → JSON serialization (row-level formatting must agree:
    // integer rendering, key order, string escapes).
    GraftQuery(
      "q_to_json",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            to_json(struct(
              col("o_orderkey").as("k"),
              col("o_orderstatus").as("st"),
              col("o_orderpriority").as("pri"))).as("payload")),
      Some("SELECT o_orderkey, CAST(to_json(struct_pack(" +
        "k := o_orderkey, st := o_orderstatus, pri := o_orderpriority)) AS VARCHAR) " +
        "AS payload FROM orders")),

    // Batch session windows: gap-merged per-user sessions via the native
    // session_window function (streaming-compatible formulation). The
    // oracle reproduces the gap-island algorithm; Spark's window end is
    // exclusive (last event + gap), and a gap of exactly 30min starts a
    // new session on both sides.
    GraftQuery(
      "ev_session_window",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
          .groupBy(col("user_id"), session_window(col("event_ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            unix_micros(col("w.start")).as("start_us"),
            unix_micros(col("w.end")).as("end_us"),
            col("n_events")),
      Some("WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us, " +
        "CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) >= 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM events), " +
        "s2 AS (SELECT user_id, ts_us, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g) " +
        "SELECT user_id, min(ts_us) AS start_us, max(ts_us) + 1800000000 AS end_us, " +
        "count(*) AS n_events FROM s2 GROUP BY user_id, sid")))
}
