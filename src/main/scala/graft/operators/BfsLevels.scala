package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS shortest-path levels from a set of source nodes —
  * the reachability/contamination-propagation primitive (a blocked seed
  * URL poisons everything within k link hops; lineage taint spreads the
  * same way). Works on distances as plain integers, so results are exact
  * and engine-comparable, like [[PageRank]] and [[ConnectedComponents]].
  *
  * Frontier-style dataflow: each round joins the CURRENT frontier (only
  * nodes first reached last round, not the whole visited set) against
  * the edge list, then a min-aggregate merges newly reached nodes into
  * the visited set. Shuffle volume per round is O(frontier out-edges),
  * which is the optimal pregel shape; `maxDepth` bounds the rounds, and
  * an early-exit fires when a frontier drains empty (the isEmpty probe
  * runs one tiny job per round — the same lineage-control tradeoff
  * ConnectedComponents makes).
  */
object BfsLevels {

  /** `edges`: (src, dst) long columns, directed. `sources`: one long
    * column `node`. Returns (node, level) for every node within
    * `maxDepth` hops of any source (sources at level 0; unreachable
    * nodes absent).
    */
  def run(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val spark = edges.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"))
      .repartition(parts, col("src")).cache()

    var visited = sources.select(col("node"), lit(0).as("level"))
      .distinct().cache()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val reached = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"), lit(depth).as("level"))
      // min-merge: a node reached at several depths keeps the smallest;
      // localCheckpoint cuts the per-round lineage growth
      val nextVisited = visited.union(reached)
        .groupBy(col("node")).agg(min(col("level")).as("level"))
        .localCheckpoint()
      frontier = nextVisited.filter(col("level") === depth).cache()
      visited.unpersist(blocking = false)
      visited = nextVisited
    }
    e.unpersist(blocking = false)
    visited
  }
}
