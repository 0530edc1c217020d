package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in exact integer arithmetic — the iterative graph workload
  * (domain authority for corpus curation, link-spam scoring) built so the
  * fixpoint is REPRODUCIBLE: ranks live in micro-units (1.0 ≡ 1,000,000),
  * per-edge contributions are integer floor divisions, and per-node
  * accumulation is a long sum — order-independent, so the result is
  * bit-identical across engines, runs, and partitionings, which
  * floating-point PageRank cannot promise (its per-node sum order is
  * partition-dependent). The damping step is `150000 + (850·in) div 1000`,
  * i.e. 0.15 + 0.85·in in micros.
  *
  * Scale shape: the edge table is joined to ranks on `src` and the
  * contributions aggregate on `dst`. Ranks leave each iteration hash
  * partitioned by node (the groupBy's own partitioning), which satisfies
  * BOTH downstream requirements — the src-join against the cached
  * pre-partitioned edge list and the node-join against the cached node
  * set — so steady-state cost is ONE shuffle per iteration (the dst
  * aggregate), not three.
  *
  * Dangling nodes (no out-edges) absorb mass — the "simplified" PageRank
  * every pregel-style implementation starts from; redistribute-dangling
  * variants add one scalar aggregate per iteration on top.
  */
object PageRank {

  /** `edges`: two long columns (src, dst), self-loops and parallel edges
    * permitted (each parallel edge carries one contribution, matching
    * the multigraph reading). Returns (node, rank) with rank in micros.
    */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val spark = edges.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .repartition(parts, col("node"))
      .cache()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val linked = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(parts, col("src"))
      .cache()

    var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 0 until iterations) {
      val contribs = linked
        .join(ranks, linked("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("incoming"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(850 * coalesce(incoming, 0L)) div 1000"))
            .as("rank"))
    }
    ranks
  }
}
