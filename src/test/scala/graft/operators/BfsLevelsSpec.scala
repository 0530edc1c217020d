package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BfsLevelsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def levels(
      edges: Seq[(Long, Long)], sources: Seq[Long], depth: Int): Map[Long, Int] =
    BfsLevels.run(edges.toDF("src", "dst"), sources.toDF("node"), depth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("levels are shortest-path distances; unreachable nodes are absent") {
    // 0→1→2→3→4 chain plus a shortcut 0→3; node 9 disconnected
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (9L, 9L))
    assert(levels(e, Seq(0L), depth = 4) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2))
  }

  test("depth bounds the expansion") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(levels(e, Seq(0L), depth = 1) == Map(0L -> 0, 1L -> 1))
    assert(levels(e, Seq(0L), depth = 0) == Map(0L -> 0))
  }

  test("multiple sources merge to the nearest one; cycles terminate early") {
    // ring 0→1→2→0 with sources at 0 and 2: frontier drains before
    // maxDepth because everything is already at its minimum
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    assert(levels(e, Seq(0L, 2L), depth = 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("result is identical under any input partitioning") {
    val e = (0L until 300L).map(i => (i, (i * 17 + 3) % 300))
    val src = Seq(0L, 7L)
    val a = BfsLevels.run(e.toDF("src", "dst").repartition(1),
      src.toDF("node"), 5).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = BfsLevels.run(e.toDF("src", "dst").repartition(11, col("dst")),
      src.toDF("node"), 5).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }
}
