package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftPlans
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

class TopKRewriteRuleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def windowTopN(keep: Boolean) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = Tables.table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    if (keep) df.select("o_custkey", "o_orderkey", "rn")
    else df.select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("rank-discarding window top-n rewrites to the native operator") {
    GraftPlans.installOptimizations(spark)
    try {
      val df = windowTopN(keep = false)
      assert(df.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
        df.queryExecution.optimizedPlan.toString)
      // and the rewrite preserves the result exactly
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
      val expected = windowTopN(keep = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
    }
  }

  test("keeping the rank column suppresses the rewrite") {
    GraftPlans.installOptimizations(spark)
    try {
      val df = windowTopN(keep = true)
      assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
      assert(df.queryExecution.optimizedPlan.toString.contains("Window"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
    }
  }
}
