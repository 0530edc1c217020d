package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** IVF-PQ serve path: recall@5 against the exact brute-force neighbors.
  * PQ is doubly lossy here (coarse cell pruning + 16-entry codebooks),
  * so the bound is looser than plain IVF's — but it must hold, and the
  * result-set shape must be exact (5 per query, no self-matches).
  */
class IvfPqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ivf-pq serves top-5 from the compressed index with bounded recall") {
    val ann = Similarity.ivfPqAnn(spark, dir).cache()
    val queries = ann.select(col("query_id")).distinct().count()
    assert(queries == 10L)
    assert(ann.count() == 50L, "exactly 5 results per query")
    assert(ann.filter(col("neighbor_id") === col("query_id")).count() == 0L)

    val exact = graft.SparkEntry.queries("sim_brute_topk")(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(ann.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    info(f"ivf-pq recall@5 = $recall%.2f")
    assert(recall >= 0.3, f"recall $recall%.2f below bound")
    // the compressed serve path must beat random: 5 of 499 by chance
    assert(recall > 0.05)
  }
}
