package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Contracts for the persisted exact-similarity index lifecycle
  * (PrefixFilterJoin.writeIndex / appendIndex / pairsAgainstIndex) —
  * the in-line `pairs` operator itself is gate- and fingerprint-covered.
  */
class PrefixFilterJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Tables.table(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("new_id"), col("old_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Ground truth: mixed (new x old) pairs from the lossless in-line
    * join over the whole corpus.
    */
  private def bruteMixed(num: Int, den: Int): Set[(Long, Long)] =
    PrefixFilterJoin.pairs(docs, num, den).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (a % 10 == 7, b % 10 == 7) match {
          case (true, false) => Some((a, b))
          case (false, true) => Some((b, a))
          case _ => None
        }
      }.toSet

  test("indexed serve equals the brute-force mixed pair set") {
    val truth = bruteMixed(4, 5)
    assert(truth.nonEmpty, "fixture should contain mixed near-dups")
    val idx = java.nio.file.Files.createTempDirectory("graft_pp_idx").toString
    PrefixFilterJoin.writeIndex(docs.filter(col("doc_id") % 10 =!= 7), idx, 4, 5)
    val served = pairSet(PrefixFilterJoin.pairsAgainstIndex(
      spark, docs.filter(col("doc_id") % 10 === 7), idx, 4, 5))
    assert(served == truth,
      s"exact serve diverged: missing=${truth -- served}, extra=${served -- truth}")
  }

  test("append under the frozen order stays lossless; thresholds guard") {
    val oldDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val idx = java.nio.file.Files.createTempDirectory("graft_pp_append").toString
    // build on HALF the corpus, append the other half: appended docs'
    // prefixes rank under build-time frequencies (some shingles unseen,
    // f=0) — the served answer must still be the exact ground truth
    PrefixFilterJoin.writeIndex(oldDocs.filter(col("doc_id") % 2 === 0), idx, 4, 5)
    PrefixFilterJoin.appendIndex(oldDocs.filter(col("doc_id") % 2 =!= 0), idx)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
    val served = pairSet(PrefixFilterJoin.pairsAgainstIndex(spark, newDocs, idx, 4, 5))
    assert(served == bruteMixed(4, 5),
      "append must extend the index losslessly under the frozen order")
    // serving ABOVE the build threshold is lossless (shorter prefixes
    // needed than stored): exact vs the brute 9/10 answer
    val high = pairSet(PrefixFilterJoin.pairsAgainstIndex(spark, newDocs, idx, 9, 10))
    assert(high == bruteMixed(9, 10))
    assert(high.subsetOf(served))
    // serving BELOW the build threshold must be refused, not silently lossy
    val e = intercept[IllegalArgumentException] {
      PrefixFilterJoin.pairsAgainstIndex(spark, newDocs, idx, 1, 2)
    }
    assert(e.getMessage.contains("build threshold"))
  }

  test("oversized batches degrade to shuffle_hash with the identical answer") {
    val idx = java.nio.file.Files.createTempDirectory("graft_pp_big").toString
    PrefixFilterJoin.writeIndex(docs.filter(col("doc_id") % 10 =!= 7), idx, 4, 5)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
    val broadcastAnswer = pairSet(
      PrefixFilterJoin.pairsAgainstIndex(spark, newDocs, idx, 4, 5))
    spark.conf.set("spark.graft.ppjoin.serveBroadcastMaxRows", "1")
    try {
      val fallback = pairSet(
        PrefixFilterJoin.pairsAgainstIndex(spark, newDocs, idx, 4, 5))
      assert(fallback == broadcastAnswer)
    } finally spark.conf.unset("spark.graft.ppjoin.serveBroadcastMaxRows")
  }
}
