package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** SaltedJoin must be row-identical to the plain join for inner and left
  * joins, including on deliberately skewed keys (the case it exists for).
  */
class SaltedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).collect().map(_.mkString("|")).toSet
  }

  test("salted inner join equals plain inner join on lineitem x part") {
    val li = Tables.table(spark, dir, "lineitem")
    val part = Tables.table(spark, dir, "part")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val salted = SaltedJoin.join(li, part, Seq("l_partkey"), buckets = 8)
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    assert(canon(salted) == canon(plain))
  }

  test("salted left join keeps unmatched rows exactly once under heavy skew") {
    import spark.implicits._
    // 10k facts, 90% on one hot key; dim covers half the keys
    val fact = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "payload")
    val dim = (0L to 25L).map(k => (k, s"dim_$k")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k"), "left")
    val salted = SaltedJoin.join(fact, dim, Seq("k"), buckets = 16, joinType = "left")
    assert(canon(salted) == canon(plain))
    assert(salted.count() == plain.count())
  }

  test("rejects unsupported join types") {
    val df = spark.range(1).toDF("k")
    intercept[IllegalArgumentException] {
      SaltedJoin.join(df, df, Seq("k"), buckets = 4, joinType = "right")
    }
  }
}
