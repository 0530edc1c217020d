package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

class CoverageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("seeded sample is reproducible, near the target fraction, verdict green") {
    val li = Tables.table(spark, dir, "lineitem")
    val a = li.sample(false, 0.1, 42L).select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = li.sample(false, 0.1, 42L).select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b) // same seed, same layout => same sample
    val total = li.count().toDouble
    val frac = a.size / total
    assert(frac > 0.07 && frac < 0.13, s"sample fraction $frac")
    // the gate query's verdict row agrees
    val row = graft.SparkEntry.queries("q_sample")(spark, dir).head()
    assert(row.getAs[Long]("n_total") == total.toLong)
    assert(row.getAs[Long]("size_ok") == 1L)
  }

  test("approx percentile tracks the exact percentile") {
    val rows = graft.SparkEntry.queries("q_approx_percentile")(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_ok") == 1L, r.getString(0))
      assert(r.getAs[Long]("p90_ok") == 1L, r.getString(0))
    }
    // the emitted exact percentiles match an independent computation
    val exact = Tables.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(percentile(col("l_extendedprice"), lit(0.5)), 6).as("p50"),
        round(percentile(col("l_quantity"), lit(0.9)), 6).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(r.getAs[Double]("exact_p50_price") == p50)
      assert(r.getAs[Double]("exact_p90_qty") == p90)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.table(spark, "/root/testdata/sf0.01", "lineitem")
      val ord = Tables.table(spark, "/root/testdata/sf0.01", "orders")
        .filter(col("o_totalprice") > 450000.0d) // selective build side
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
        plan.contains("might_contain"), s"expected runtime bloom filter in:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("approx distinct is within HLL error of the exact counts") {
    val row = graft.SparkEntry.queries("q_approx_distinct")(spark, dir).head()
    val exactParts = Tables.table(spark, dir, "lineitem")
      .select(countDistinct(col("l_partkey"))).head().getLong(0)
    val exactOrders = Tables.table(spark, dir, "lineitem")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(row.getAs[Long]("exact_parts") == exactParts)
    assert(row.getAs[Long]("exact_orders") == exactOrders)
    // verdict cells: approx within 15% (default rsd 5%, 3x headroom)
    assert(row.getAs[Long]("parts_ok") == 1L)
    assert(row.getAs[Long]("orders_ok") == 1L)
  }
}
