package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** PrefixSum must equal the single-partition global window on every input
  * and partitioning — it is the same result computed without the scale
  * cliff.
  */
class PrefixSumSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("distributed running total equals the global window result") {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))

    val w = Window.orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    for (parts <- Seq(1, 3, 32)) {
      val got = PrefixSum.runningTotal(docs,
          Seq(col("n_chars").desc, col("doc_id").asc),
          col("n_tok"), "cum", partitions = parts)
        .select(col("doc_id"), col("cum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"mismatch at partitions=$parts")
      spark.catalog.clearCache()
    }
  }

  test("prefix-sum plan avoids the single-partition exchange the window needs") {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))

    val naive = docs.withColumn("cum", sum(col("n_tok")).over(
      Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    naive.collect()
    assert(naive.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "positive control: the global window must funnel to one partition")

    val scaled = PrefixSum.runningTotal(docs, Seq(col("doc_id").asc),
      col("n_tok"), "cum", partitions = 8)
    scaled.collect()
    assert(!scaled.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "prefix sum must never gather to a single partition")
    spark.catalog.clearCache()
  }

  test("running total over a skewed synthetic sequence") {
    import spark.implicits._
    // values 1..n in shuffled insert order with a constant order column
    // tiebroken by id: cum at id k must be k*(k+1)/2
    val n = 1000
    val df = scala.util.Random.shuffle((1 to n).toList)
      .toDF("id").withColumn("v", col("id").cast("long"))
    val got = PrefixSum.runningTotal(df, Seq(col("id").asc), col("v"), "cum",
        partitions = 7)
      .select(col("id"), col("cum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    (1 to n).foreach { k =>
      assert(got(k) == k.toLong * (k + 1) / 2, s"wrong prefix at $k")
    }
    spark.catalog.clearCache()
  }
}
