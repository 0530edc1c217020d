package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration matches the hand-computed fixpoint step") {
    // 1→{2,3}, 2→3, 3→1: contributions 2←500000, 3←500000+1000000, 1←1000000
    val r = ranksOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)), iters = 1)
    assert(r == Map(
      1L -> 1000000L, // 150000 + 850*1000000/1000
      2L -> 575000L,  // 150000 + 850*500000/1000
      3L -> 1425000L)) // 150000 + 850*1500000/1000
  }

  test("dangling node absorbs mass; zero-indegree node keeps the base rank") {
    val r1 = ranksOf(Seq((1L, 2L)), iters = 1)
    assert(r1 == Map(1L -> 150000L, 2L -> 1000000L))
    val r2 = ranksOf(Seq((1L, 2L)), iters = 2)
    // node 1 has no in-links: base only; node 2 receives 850·150000/1000
    assert(r2 == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("parallel edges each carry a contribution (multigraph semantics)") {
    val r = ranksOf(Seq((1L, 2L), (1L, 2L)), iters = 1)
    // outdeg 2, two edges: incoming = 2 * (1000000 div 2) = 1000000
    assert(r(2L) == 1000000L)
  }

  test("result is identical under any input partitioning") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 31 + 7) % 200), (i, (i * 31 + 14) % 200)))
    val df = edges.toDF("src", "dst")
    val a = PageRank.run(df.repartition(1), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.run(df.repartition(13, col("dst")), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.size == 200)
  }

  test("zero iterations returns the uniform start vector") {
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 0)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }
}
