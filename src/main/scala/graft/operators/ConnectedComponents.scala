package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step that turns pairwise near-duplicate edges into
  * dedup groups (every member maps to the component's minimum id, the
  * canonical document).
  *
  * Each round every vertex takes the min of its own label and its
  * neighbors' labels; convergence in O(component diameter) rounds. Near-
  * dup graphs are unions of small dense clusters (diameter 2–3), so this
  * converges in a handful of rounds even at corpus scale; each round is
  * one shuffle on vertex ids. Each round's labels are materialized with
  * localCheckpoint to CUT LINEAGE — without it the logical plan nests one
  * level per round and analysis/codegen blow up exponentially (the
  * classic iterative-DataFrame trap). The loop stops when a round
  * changes nothing (one count, never a collect).
  */
object ConnectedComponents {

  /** edges: (src, dst) long pairs, interpreted undirected. Returns
    * (id, component) for every vertex appearing in any edge, where
    * component = min vertex id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val propagated = labels
        .join(sym, labels("id") === sym("src"))
        .select(col("dst").as("id"), col("component"))
        .union(labels)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      changed = propagated.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") =!= col("old"))
        .count()
      labels = propagated
      iter += 1
    }
    labels
  }
}
