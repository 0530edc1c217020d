package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftQuery, SparkTestSession, Tables}

/** Wave-3 assertions that the oracle gate cannot express: sketch error
  * bounds and the determinism of the hash-threshold sample.
  */
class Coverage3Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    GraftQuery.all.find(_.name == name).get.fn(spark, dir)

  test("hll sketch-merge estimate lands within bound of the exact distinct count") {
    val exact = Tables.table(spark, dir, "lineitem")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val row = q("q_hll_merge").head()
    assert(row.getAs[Long]("exact_orders") == exact)
    assert(row.getAs[Long]("n_sketches") == 3L)
    assert(row.getAs[Long]("est_ok") == 1L)
  }

  test("hash-threshold sample is identical across partitionings and runs") {
    val base = q("q_sample_hash").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val repartitioned = GraftQuery.all.find(_.name == "q_sample_hash").get
      .fn(spark, dir).repartition(17).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(base == repartitioned)
    assert(base.nonEmpty)
    // ~10% rate (26/256), loose bound
    val total = Tables.table(spark, dir, "lineitem").count().toDouble
    val rate = base.size / total
    assert(rate > 0.05 && rate < 0.17, s"rate=$rate")
  }
}
