package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

class CoverageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("seeded sample is reproducible and near the target fraction") {
    val q = graft.SparkEntry.queries("q_sample")
    val a = q(spark, dir).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = q(spark, dir).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b) // same seed, same layout => same sample
    val total = Tables.table(spark, dir, "lineitem").count().toDouble
    val frac = a.size / total
    assert(frac > 0.07 && frac < 0.13, s"sample fraction $frac")
  }

  test("approx percentile tracks the exact percentile") {
    val approx = graft.SparkEntry.queries("q_approx_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 < 0.05, s"$k p50")
      assert(math.abs(approx(k)._2 - p90) / p90 < 0.1, s"$k p90")
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
    // default rsd = 5%; allow 3x that
    assert(math.abs(row.getLong(0) - exactParts).toDouble / exactParts < 0.15)
    assert(math.abs(row.getLong(1) - exactOrders).toDouble / exactOrders < 0.15)
  }
}
