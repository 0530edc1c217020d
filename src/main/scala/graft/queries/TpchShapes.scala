package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** TPC-H-shape analytics beyond q1/q3/q5/q14: the classic multi-join
  * decision-support patterns re-expressed over the TESTDATA schema
  * (which lacks partsupp and some lineitem date/mode columns — filters
  * adapt to the columns that exist; the JOIN TOPOLOGY is the point).
  * Dimensions broadcast; facts join hash-to-hash; aggregates carry
  * decimal sums for order-independent exactness against the oracle.
  */
object TpchShapes {

  private val dec6 = DecimalType(38, 6)

  /** sum(l_extendedprice · (1 − l_discount)) as an exact decimal. */
  private val volumeDec =
    (col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).cast(dec6)

  def defs: Seq[GraftQuery] = Seq(

    // Q7 volume shipping: bilateral trade between two nations by year —
    // a 5-way join where both nation dims broadcast and the pair
    // predicate keeps the (supp, cust) combinations asymmetric.
    GraftQuery(
      "q7_volume_shipping",
      (s, dir) => {
        val l = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
        val n1 = broadcast(Tables.table(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val n2 = broadcast(Tables.table(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
        Tables.table(s, dir, "supplier")
          .join(l, col("s_suppkey") === col("l_suppkey"))
          .join(Tables.table(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.table(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(n1, col("s_nationkey") === col("s_nk"))
          .join(n2, col("c_nationkey") === col("c_nk"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("yr"))
          .agg(sum(volumeDec).cast(DoubleType).as("revenue"))
      },
      Some("SELECT supp_nation, cust_nation, yr, " +
        "CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue FROM (" +
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "year(l_shipdate) AS yr, l_extendedprice * (1 - l_discount) AS volume " +
        "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN customer c ON c.c_custkey = o.o_custkey " +
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey " +
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) " +
        "AND l_shipdate >= TIMESTAMP '1995-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01'" +
        ") GROUP BY 1, 2, 3")),

    // Q8 market share: one nation's share of regional volume by year —
    // an 8-way join; the share divides two doubles that are themselves
    // exact decimal sums, so the quotient is bit-identical cross-engine.
    GraftQuery(
      "q8_market_share",
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
        val n1 = broadcast(Tables.table(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk")))
        val n2 = broadcast(Tables.table(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val r = broadcast(Tables.table(s, dir, "region")
          .filter(col("r_name") === "ASIA").select(col("r_regionkey")))
        val p = broadcast(Tables.table(s, dir, "part")
          .filter(col("p_type") === "ECONOMY").select(col("p_partkey")))
        Tables.table(s, dir, "lineitem")
          .join(p, col("p_partkey") === col("l_partkey"))
          .join(Tables.table(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
          .join(o, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.table(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(n1, col("c_nationkey") === col("c_nk"))
          .join(r, col("c_rk") === col("r_regionkey"))
          .join(n2, col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("yr"))
          .agg((sum(when(col("supp_nation") === "NATION_3", volumeDec)
              .otherwise(lit(0).cast(dec6))).cast(DoubleType) /
            sum(volumeDec).cast(DoubleType)).as("mkt_share"))
      },
      Some("SELECT yr, " +
        "CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol " +
        "ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) " +
        "/ CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share FROM (" +
        "SELECT year(o.o_orderdate) AS yr, " +
        "CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS vol, " +
        "n2.n_name AS supp_nation " +
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN customer c ON c.c_custkey = o.o_custkey " +
        "JOIN nation n1 ON c.c_nationkey = n1.n_nationkey " +
        "JOIN region r ON n1.n_regionkey = r.r_regionkey " +
        "JOIN nation n2 ON s.s_nationkey = n2.n_nationkey " +
        "WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY' " +
        "AND o.o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o.o_orderdate < TIMESTAMP '1997-01-01'" +
        ") GROUP BY yr"),
      bench = true),

    // Q10 returned items: top-20 customers by returned revenue in one
    // quarter — group-aggregate then TakeOrdered (no global sort); the
    // ordering key is the double revenue both engines derive from the
    // same decimal sum, with the key as tiebreak.
    GraftQuery(
      "q10_returned_items",
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-10-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1996-01-01").cast(TimestampType))
        val l = Tables.table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val n = broadcast(Tables.table(s, dir, "nation"))
        Tables.table(s, dir, "customer")
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(volumeDec).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("SELECT c.c_custkey, c.c_name, n.n_name, " +
        "CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "WHERE o.o_orderdate >= TIMESTAMP '1995-10-01' " +
        "AND o.o_orderdate < TIMESTAMP '1996-01-01' AND l.l_returnflag = 'R' " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20")),

    // Q13 customer distribution: orders-per-customer histogram through a
    // conditional LEFT join (the join predicate carries the filter, so
    // order-less customers survive with count 0).
    GraftQuery(
      "q13_custdist",
      (s, dir) => Tables.table(s, dir, "customer")
        .join(Tables.table(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist")),
      Some("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c.c_custkey, count(o.o_orderkey) AS c_count " +
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey " +
        "AND o.o_orderpriority <> '1-URGENT' GROUP BY c.c_custkey" +
        ") GROUP BY c_count")),

    // Q18 large orders: customers whose orders exceed a quantity
    // threshold — the HAVING subquery becomes a semi join against the
    // per-order quantity aggregate.
    GraftQuery(
      "q18_large_orders",
      (s, dir) => {
        val big = Tables.table(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast(dec6)).as("qty"))
          .filter(col("qty") > 180)
          .select(col("l_orderkey").as("big_okey"))
        val l = Tables.table(s, dir, "lineitem")
        Tables.table(s, dir, "customer")
          .join(Tables.table(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .join(big, col("o_orderkey") === col("big_okey"), "left_semi")
          .groupBy(col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast(DateType).as("odate"), col("o_totalprice"))
          .agg(sum(col("l_quantity").cast(dec6)).cast(DoubleType).as("total_qty"))
      },
      Some("SELECT c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS odate, " +
        "o.o_totalprice, " +
        "CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem " +
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 180) " +
        "GROUP BY 1, 2, 3, 4")),

    // Q19 discounted revenue: an OR-of-ANDs band predicate across the
    // part join — the disjunction cannot push to one side, but each
    // disjunct's part attributes prune after the broadcast join.
    GraftQuery(
      "q19_disjunct_revenue",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .join(broadcast(Tables.table(s, dir, "part")),
          col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 21)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 40)))
        .agg(sum(volumeDec).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n")),
      Some("SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
        "count(*) AS n " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 " +
        "AND l.l_quantity BETWEEN 1 AND 21) " +
        "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 " +
        "AND l.l_quantity BETWEEN 10 AND 30) " +
        "OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 " +
        "AND l.l_quantity BETWEEN 20 AND 40)")))
}
