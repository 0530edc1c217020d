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

  test("incremental update equals full recompute on random split graphs") {
    import spark.implicits._
    // 30 random trials: split each random graph's edges into a standing
    // set and a batch set, cluster the standing set, fold the batch in
    // incrementally, and demand exact equality with one full run over
    // the union — covering component merges (a batch edge bridging two
    // standing components), standing-only vertices, batch-only vertices,
    // and old singletons gaining their first edge
    val rng = new scala.util.Random(23)
    (1 to 30).foreach { trial =>
      val n = 20 + rng.nextInt(80)
      val edges = Seq.fill(n)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val (standingE, batchE) = edges.partition(_ => rng.nextBoolean())
        val full = ConnectedComponents.run(edges.toDF("src", "dst"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val standing =
          if (standingE.isEmpty)
            Seq.empty[(Long, Long)].toDF("id", "component")
          else ConnectedComponents.run(standingE.toDF("src", "dst"))
        val inc = ConnectedComponents.incremental(
            standing, batchE.toDF("src", "dst"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // incremental also returns standing vertices whose edges are all
        // in the standing half — full covers the same vertex set because
        // the union holds every edge
        assert(inc == full, s"trial $trial: inc=$inc full=$full")
      }
    }
  }

  test("incremental merges two standing components through a bridging batch vertex") {
    import spark.implicits._
    // standing: {1,2,3} labeled 1 and {10,11} labeled 10; batch doc 99
    // near-dups both 3 and 10 → one merged component labeled 1
    val standing = ConnectedComponents.run(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst"))
    val got = ConnectedComponents.incremental(
        standing, Seq((99L, 3L), (99L, 10L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 1L, 11L -> 1L, 99L -> 1L))
  }

  test("incremental with no batch edges returns standing unchanged") {
    import spark.implicits._
    val standing = ConnectedComponents.run(
      Seq((1L, 2L), (5L, 6L)).toDF("src", "dst"))
    val before = standing.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = ConnectedComponents.incremental(
        standing, Seq.empty[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
  }

  test("relabel shuffle fallback (conf'd broadcast ceiling) is answer-identical") {
    import spark.implicits._
    // force the relabel map past the conf'd ceiling so the standing
    // relabel join takes the shuffle path — the answer must not move
    val standing = ConnectedComponents.run(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst"))
    val batch = Seq((99L, 3L), (99L, 10L)).toDF("src", "dst")
    def result(): Map[Long, Long] =
      ConnectedComponents.incremental(standing, batch)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val broadcastAnswer = result()
    spark.conf.set("spark.graft.cc.relabelBroadcastMaxRows", "0")
    try assert(result() == broadcastAnswer,
      "shuffle-relabel fallback diverged from the broadcast path")
    finally spark.conf.unset("spark.graft.cc.relabelBroadcastMaxRows")
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
