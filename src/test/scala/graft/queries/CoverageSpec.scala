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
