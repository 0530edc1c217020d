package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Coverage wave 7: IGNORE NULLS window navigation (the forward-fill /
  * gap-filling idiom), struct-valued arrays with field-ordered sorting,
  * and URL canonicalization — the web-corpus normalization pass that
  * precedes any URL-keyed dedup.
  */
object Coverage6 {

  def defs: Seq[GraftQuery] = Seq(

    // Forward fill: carry the last non-null observation forward within
    // each user's event timeline. `last(col, ignoreNulls)` over a
    // running frame is the canonical Spark spelling; lead/lag with
    // IGNORE NULLS navigate to the nearest non-null neighbor instead of
    // the positional one. Sparse sensor readings, price ticks, and
    // session attributes all fill this way.
    GraftQuery(
      "q_window_ignore_nulls",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // every 5th event "loses" its reading — deterministic gaps
        val v = when(col("event_id") % 5 =!= 0, col("value"))
        Tables.table(s, dir, "events")
          .filter(col("user_id") <= 200)
          .select(col("event_id"), col("user_id"), col("ts"), v.as("v"))
          .select(
            col("event_id"), col("user_id"), col("v"),
            last(col("v"), ignoreNulls = true).over(running).as("v_filled"),
            lag(col("v"), 1, null, ignoreNulls = true).over(byUser).as("prev_obs"),
            lead(col("v"), 1, null, ignoreNulls = true).over(byUser).as("next_obs"))
      },
      Some("SELECT event_id, user_id, " +
        "CASE WHEN event_id % 5 <> 0 THEN value END AS v, " +
        "last_value(CASE WHEN event_id % 5 <> 0 THEN value END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled, " +
        "lag(CASE WHEN event_id % 5 <> 0 THEN value END, 1 IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_obs, " +
        "lead(CASE WHEN event_id % 5 <> 0 THEN value END, 1 IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_obs " +
        "FROM events WHERE user_id <= 200")),

    // Struct-valued array processing: collect each order's lines as
    // structs, sort by the struct's field order (quantity, then line
    // number — struct comparison IS lexicographic field comparison in
    // both engines), and read fields out of the extreme elements. The
    // output is flattened to scalars because struct cells don't hash in
    // the comparison harness.
    GraftQuery(
      "q_struct_sort",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 2000)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(
            struct(col("l_quantity"), col("l_linenumber")))).as("lines"))
          .select(
            col("l_orderkey"),
            size(col("lines")).as("n_lines"),
            element_at(col("lines"), 1).getField("l_linenumber").as("min_qty_line"),
            element_at(col("lines"), -1).getField("l_linenumber").as("max_qty_line"),
            element_at(col("lines"), 1).getField("l_quantity").as("min_qty"),
            element_at(col("lines"), -1).getField("l_quantity").as("max_qty")),
      Some("WITH f AS (SELECT l_orderkey, l_quantity, l_linenumber, " +
        "row_number() OVER (PARTITION BY l_orderkey " +
        "ORDER BY l_quantity, l_linenumber) AS rn_asc, " +
        "row_number() OVER (PARTITION BY l_orderkey " +
        "ORDER BY l_quantity DESC, l_linenumber DESC) AS rn_desc " +
        "FROM lineitem WHERE l_orderkey <= 2000) " +
        "SELECT l_orderkey, count(*) AS n_lines, " +
        "max(CASE WHEN rn_asc = 1 THEN l_linenumber END) AS min_qty_line, " +
        "max(CASE WHEN rn_desc = 1 THEN l_linenumber END) AS max_qty_line, " +
        "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty " +
        "FROM f GROUP BY l_orderkey")),

    // URL canonicalization: scheme/host case-folding, default-port
    // stripping, fragment removal, tracking-parameter (utm_*) removal,
    // query-parameter sorting, and trailing-slash normalization — the
    // pass that makes URL-keyed dedup see one key per resource. URLs are
    // synthesized deterministically from doc_id so both engines
    // normalize the identical messy inputs.
    GraftQuery(
      "txt_url_normalize",
      (s, dir) => {
        val d = col("doc_id")
        val scheme = when(d % 2 === 0, "HTTP").otherwise("https")
        val port = when(d % 3 === 0, ":80")
          .when(d % 3 === 1, ":443").otherwise(":8080")
        val q = when(d % 4 === 0, "?utm_source=feed&b=2&a=1")
          .when(d % 4 === 1, "?b=2&utm_campaign=x&a=1&utm_medium=y")
          .when(d % 4 === 2, "?a=1&b=2").otherwise("")
        val trail = when(d % 5 === 0, "/").otherwise("")
        val frag = when(d % 6 === 0, "#Section-2").otherwise("")
        val raw = concat(scheme, lit("://WWW."), upper(col("source")),
          lit(".Example.org"), port, lit("/Docs/"), d, trail, q, frag)

        val noFrag = regexp_replace(raw, "#.*$", "")
        val schemeN = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
        val hostPort = regexp_extract(noFrag, "^[A-Za-z]+://([^/?]+)", 1)
        val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
        val portN = regexp_extract(hostPort, ":([0-9]+)$", 1)
        val keepPort = when(
          portN === "" ||
            (schemeN === "http" && portN === "80") ||
            (schemeN === "https" && portN === "443"), lit(""))
          .otherwise(concat(lit(":"), portN))
        val path0 = regexp_extract(noFrag, "^[A-Za-z]+://[^/?]+([^?]*)", 1)
        val path = when(path0 === "", lit("/"))
          .otherwise(regexp_replace(path0, "/+$", ""))
        val pathN = when(path === "", lit("/")).otherwise(path)
        val query0 = regexp_extract(noFrag, "\\?(.*)$", 1)
        val params = filter(split(query0, "&"),
          p => p =!= "" && !p.startsWith("utm_"))
        val queryN = when(size(params) > 0,
          concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))

        Tables.table(s, dir, "documents")
          .select(col("doc_id"), raw.as("raw_url"),
            concat(schemeN, lit("://"), host, keepPort, pathN, queryN)
              .as("canonical_url"))
      },
      Some("WITH u AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://WWW.' || " +
        "upper(source) || '.Example.org' || " +
        "(CASE WHEN doc_id % 3 = 0 THEN ':80' WHEN doc_id % 3 = 1 THEN ':443' ELSE ':8080' END) || " +
        "'/Docs/' || doc_id || " +
        "(CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) || " +
        "(CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1' " +
        " WHEN doc_id % 4 = 1 THEN '?b=2&utm_campaign=x&a=1&utm_medium=y' " +
        " WHEN doc_id % 4 = 2 THEN '?a=1&b=2' ELSE '' END) || " +
        "(CASE WHEN doc_id % 6 = 0 THEN '#Section-2' ELSE '' END) AS raw_url " +
        "FROM documents), " +
        "parts AS (SELECT doc_id, raw_url, " +
        "regexp_replace(raw_url, '#.*$', '') AS nofrag FROM u), " +
        "p2 AS (SELECT doc_id, raw_url, nofrag, " +
        "lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme, " +
        "regexp_extract(nofrag, '^[A-Za-z]+://([^/?]+)', 1) AS hostport, " +
        "regexp_extract(nofrag, '^[A-Za-z]+://[^/?]+([^?]*)', 1) AS path0, " +
        "regexp_extract(nofrag, '\\?(.*)$', 1) AS query0 FROM parts), " +
        "p3 AS (SELECT doc_id, raw_url, scheme, " +
        "lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host, " +
        "regexp_extract(hostport, ':([0-9]+)$', 1) AS port, " +
        "CASE WHEN path0 = '' THEN '/' ELSE regexp_replace(path0, '/+$', '') END AS path1, " +
        "list_sort(list_filter(string_split(query0, '&'), " +
        "p -> p <> '' AND NOT starts_with(p, 'utm_'))) AS params FROM p2) " +
        "SELECT doc_id, raw_url, " +
        "scheme || '://' || host || " +
        "(CASE WHEN port = '' OR (scheme = 'http' AND port = '80') " +
        "OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) || " +
        "(CASE WHEN path1 = '' THEN '/' ELSE path1 END) || " +
        "(CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) " +
        "AS canonical_url FROM p3")),

    // PageRank over a deterministic synthetic link graph (3 out-links
    // per document), 5 iterations of graft.operators.PageRank — exact
    // integer-micros arithmetic makes an ITERATIVE fixpoint
    // hash-comparable across engines, something floating-point PageRank
    // can never be (its per-node sum order is partition-dependent). The
    // oracle unrolls the same 5 iterations as chained CTEs.
    GraftQuery(
      "graph_pagerank",
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val n = docs.agg(count(lit(1)).as("n"))
        val edges = docs.crossJoin(broadcast(n))
          .select(col("doc_id").as("src"),
            explode(array(Seq(1, 2, 3).map(j =>
              (col("doc_id") * 31 + j * 7) % col("n")): _*)).as("dst"))
        graft.operators.PageRank.run(edges, iterations = 5)
      },
      Some {
        val iter = (k: Int) =>
          s"r${k + 1} AS (SELECT nd.node, CAST(150000 AS BIGINT) + " +
            s"(850 * COALESCE(c.s, 0)) // 1000 AS rank FROM nodes nd " +
            s"LEFT JOIN (SELECT e.dst, SUM(r$k.rank // e.outdeg) AS s " +
            s"FROM e JOIN r$k ON e.src = r$k.node GROUP BY e.dst) c " +
            s"ON nd.node = c.dst)"
        "WITH nn AS (SELECT count(*) AS n FROM documents), " +
          "edges AS (SELECT doc_id AS src, (doc_id*31 + j*7) % nn.n AS dst " +
          "FROM documents, nn, unnest([1, 2, 3]) AS u(j)), " +
          "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src), " +
          "e AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src)), " +
          "nodes AS (SELECT DISTINCT node FROM " +
          "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)), " +
          "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes), " +
          (0 until 5).map(iter).mkString(", ") +
          " SELECT node, CAST(rank AS BIGINT) AS rank FROM r5"
      }),

    // arg-extremes: the value of one column AT the extreme of another
    // (max_by / min_by ≡ arg_max / arg_min) — deterministic because the
    // ordering key o_orderkey is unique, which is the condition any
    // cross-engine arg_* comparison needs (tie-breaks are
    // engine-internal).
    GraftQuery(
      "q_arg_minmax",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            max_by(col("o_totalprice"), col("o_orderkey")).as("price_of_last"),
            min_by(col("o_totalprice"), col("o_orderkey")).as("price_of_first"),
            max_by(col("o_orderstatus"), col("o_orderkey")).as("status_of_last"),
            max(col("o_orderkey")).as("last_key")),
      Some("SELECT o_orderpriority, " +
        "arg_max(o_totalprice, o_orderkey) AS price_of_last, " +
        "arg_min(o_totalprice, o_orderkey) AS price_of_first, " +
        "arg_max(o_orderstatus, o_orderkey) AS status_of_last, " +
        "max(o_orderkey) AS last_key " +
        "FROM orders GROUP BY o_orderpriority")),

    // Bounded-depth BFS from seed documents over the same synthetic link
    // graph: exact integer levels via frontier expansion + min-merge
    // (graft.operators.BfsLevels); the oracle unrolls 4 Bellman-Ford
    // relaxation rounds — after round k it holds exactly the nodes
    // within k hops at their true distance, which is what the frontier
    // algorithm maintains incrementally.
    GraftQuery(
      "graph_bfs_levels",
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val n = docs.agg(count(lit(1)).as("n"))
        val edges = docs.crossJoin(broadcast(n))
          .select(col("doc_id").as("src"),
            explode(array(Seq(1, 2, 3).map(j =>
              (col("doc_id") * 31 + j * 7) % col("n")): _*)).as("dst"))
        val sources = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("node"))
        graft.operators.BfsLevels.run(edges, sources, maxDepth = 4)
      },
      Some {
        val relax = (k: Int) =>
          s"d${k + 1} AS (SELECT node, min(level) AS level FROM (" +
            s"SELECT node, level FROM d$k " +
            s"UNION ALL SELECT e.dst AS node, d$k.level + 1 AS level " +
            s"FROM edges e JOIN d$k ON e.src = d$k.node) GROUP BY node)"
        "WITH nn AS (SELECT count(*) AS n FROM documents), " +
          "edges AS (SELECT doc_id AS src, (doc_id*31 + j*7) % nn.n AS dst " +
          "FROM documents, nn, unnest([1, 2, 3]) AS u(j)), " +
          "d0 AS (SELECT doc_id AS node, 0 AS level FROM documents WHERE doc_id % 100 = 0), " +
          (0 until 4).map(relax).mkString(", ") +
          " SELECT node, level FROM d4"
      }),

    // The TPC-H Q21 shape: one aggregate over BOTH a correlated EXISTS
    // and a correlated NOT EXISTS against the same fact table —
    // suppliers who were the ONLY late shipper on a multi-supplier
    // order. Decorrelation turns these into one semi and one anti join
    // on the order key with a supplier-inequality residual; "late" is
    // shipping more than 60 days after the order date.
    GraftQuery(
      "q_multi_exists",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val late = Tables.table(s, dir, "lineitem")
          .join(Tables.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        late.as("l1")
          .join(li.as("l2"),
            col("l2.l_orderkey") === col("l1.l_orderkey") &&
              col("l2.l_suppkey") =!= col("l1.l_suppkey"),
            "left_semi")
          .join(late.as("l3"),
            col("l3.l_orderkey") === col("l1.l_orderkey") &&
              col("l3.l_suppkey") =!= col("l1.l_suppkey"),
            "left_anti")
          .groupBy(col("l1.l_suppkey").as("s_suppkey"))
          .agg(count(lit(1)).as("numwait"))
      },
      Some("WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY), " +
        "lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) " +
        "SELECT l1.l_suppkey AS s_suppkey, count(*) AS numwait FROM late l1 " +
        "WHERE EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey) " +
        "GROUP BY l1.l_suppkey")))
}
