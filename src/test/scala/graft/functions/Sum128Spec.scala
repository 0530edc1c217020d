package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Sum128 must (a) agree exactly with the decimal sum, (b) survive
  * totals beyond 2^63 where the plain long sum overflows, and (c) fold
  * correctly across partial/final merges and negative inputs.
  */
class Sum128Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def sum128Of(df: org.apache.spark.sql.DataFrame, c: String): BigDecimal = {
    GraftFunctions.register(spark)
    df.agg(GraftFunctions.sum128(col(c))).head().getDecimal(0)
  }

  test("matches the decimal sum on real lineitem micros") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(floor(col("l_extendedprice") * 1e6d + 0.5d).as("micros"))
    val dec = li.agg(sum(col("micros").cast(DecimalType(38, 0)))).head().getDecimal(0)
    assert(sum128Of(li, "micros") == BigDecimal(dec))
  }

  test("exact past 2^63: 1000 rows of 2^61 (plain long sum would overflow)") {
    val s = spark
    import s.implicits._
    val big = (1 to 1000).map(_ => 1L << 61).toDF("v").repartition(7)
    assert(sum128Of(big, "v") == BigDecimal(2).pow(61) * 1000)
  }

  test("negatives, zeros, nulls, and merge across many partitions") {
    val s = spark
    import s.implicits._
    val vals: Seq[java.lang.Long] =
      Seq[java.lang.Long](5L, -7L, 0L, null, Long.MaxValue / 4, -(Long.MaxValue / 8)) ++
        (1 to 500).map(i => java.lang.Long.valueOf(i.toLong * 1000003L - 250000000L))
    val df = vals.toDF("v").repartition(13)
    val expected = vals.filter(_ != null).map(v => BigDecimal(v.longValue())).sum
    assert(sum128Of(df, "v") == expected)
  }

  test("out-of-range input fails loudly even with ANSI off; boundary value passes") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(spark)
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // largest legal magnitude sums fine
      val edge = Seq((1L << 62) - 1, -((1L << 62) - 1), 5L).toDF("v")
      assert(sum128Of(edge, "v") == BigDecimal(5))
      // 2^62 itself must raise, not wrap
      val bad = Seq(1L, 1L << 62).toDF("v")
      val e = intercept[Throwable] { sum128Of(bad, "v") }
      val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
      assert(messages.contains("sum128 input out of range"), messages)
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("group-by path: per-group totals match decimal sums") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 1e6d + 0.5d).as("micros"))
    GraftFunctions.register(spark)
    val got = li.groupBy("l_returnflag")
      .agg(GraftFunctions.sum128(col("micros")).as("s"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    val want = li.groupBy("l_returnflag")
      .agg(sum(col("micros").cast(DecimalType(38, 0))).as("s"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(got == want)
  }
}
