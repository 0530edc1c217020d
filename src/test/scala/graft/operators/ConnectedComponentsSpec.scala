package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  test("matches union-find ground truth on a random graph") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 120 nodes, sparse random edges: mix of chains, smalls, isolated pairs
    val edges = Seq.fill(90)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(120, edges)
    val got = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("long chain converges within diameter rounds (maxIter honored)") {
    import spark.implicits._
    val chain = (0L until 15L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(chain.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 16)
  }

  test("partitioning-independent") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val edges = Seq.fill(60)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val a = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents.run(edges.toDF("src", "dst").repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
