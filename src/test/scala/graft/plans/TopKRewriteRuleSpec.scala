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

  test("global top-k (empty PARTITION BY) keeps the stock window plan and runs") {
    GraftPlans.installOptimizations(spark)
    try {
      // row_number() OVER (ORDER BY ...) with no partitioning: TopKPerKey
      // would have no clustering keys — the rule must not fire.
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val df = Tables.table(spark, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
      assert(df.count() == 5) // planning used to crash here (ClusteredDistribution Nil)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
    }
  }

  test("topKPerKey rejects empty keys explicitly") {
    val e = intercept[IllegalArgumentException] {
      GraftPlans.topKPerKey(
        Tables.table(spark, dir, "orders"), Nil, Seq(col("o_totalprice").desc), 3)
    }
    assert(e.getMessage.contains("at least one key"))
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
