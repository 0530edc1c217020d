package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Sketch aggregates whose outputs are engine-specific binaries or
  * tie-ordered lists — asserted against exact ground truth here instead
  * of the SQL oracle gate (like the HLL and ANN paths).
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val words = Tables.table(spark, dir, "documents")
    .select(explode(split(col("text"), " ")).as("word"))

  test("approx_top_k recovers the exact heavy hitters on a small vocabulary") {
    val exact = words.groupBy("word").count()
      .orderBy(col("count").desc, col("word").asc)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val approx = words
      .agg(expr("approx_top_k(word, 5, 64)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("word"), col("e.count").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocabulary (~40 terms) fits the 64-slot sketch: counts are exact
    val exactMap = exact.toMap
    assert(approx.size == 5)
    approx.foreach { case (w, c) =>
      assert(exactMap(w) == c, s"$w: approx $c vs exact ${exactMap(w)}")
    }
    // the 5 reported items all have counts >= the true 6th-highest count
    val sixth = exact.map(_._2).distinct.sorted(Ordering[Long].reverse).lift(5).getOrElse(0L)
    approx.values.foreach(c => assert(c >= sixth))
  }

  test("count_min_sketch estimates overcount-only, within epsilon") {
    val sketchBytes = words
      .agg(expr("count_min_sketch(word, 0.001d, 0.99d, 42)")).head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val exact = words.groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = exact.map(_._2).sum
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"$w underestimated: $est < $c")
      assert(est <= c + (0.001 * total).toLong + 1, s"$w overestimated: $est vs $c")
    }
  }
}
