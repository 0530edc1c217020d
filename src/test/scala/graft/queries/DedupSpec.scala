package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Brute-force shingle-Jaccard ground truth (no blocking, no LSH). */
  private def bruteForcePairs(threshold: Double): Set[(Long, Long)] = {
    val toks = split(col("text"), " ")
    val sh = array_distinct(transform(
      sequence(lit(1), size(toks) - lit(2)),
      i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + lit(1)), element_at(toks, i + lit(2)))))
    val docs = graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), sh.as("sh"))
    val a = docs.select(col("doc_id").as("da"), col("sh").as("sa"))
    val b = docs.select(col("doc_id").as("db"), col("sh").as("sb"))
    a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("j"))
      .filter(col("j") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH achieves full recall of true near-dup pairs (j >= 0.5)") {
    val truth = bruteForcePairs(0.5)
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val lsh = graft.SparkEntry.queries("dd_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == truth,
      s"LSH found ${lsh.size}, truth ${truth.size}; missing=${truth -- lsh}, extra=${lsh -- truth}")
  }

  test("blocked ngram jaccard equals unblocked truth at threshold 0.8") {
    val truth = bruteForcePairs(0.8)
    val blocked = graft.SparkEntry.queries("dd_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == truth,
      s"blocking dropped pairs: missing=${truth -- blocked}, extra=${blocked -- truth}")
  }

  test("ppjoin prefix filtering equals unblocked truth at threshold 0.8") {
    val truth = bruteForcePairs(0.8)
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val ppjoin = graft.SparkEntry.queries("dd_jaccard_ppjoin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ppjoin == truth,
      s"prefix filter dropped pairs: missing=${truth -- ppjoin}, extra=${ppjoin -- truth}")
  }

  test("simhash pairs are a subset of hamming-verified near-dups and overlap truth") {
    val truth = bruteForcePairs(0.5)
    val rows = graft.SparkEntry.queries("dd_simhash_pairs")(spark, dir).collect()
    assert(rows.forall(_.getAs[Int]("hamming") <= 8))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // banding is approximate: it must still recover a solid majority
    val recall = (pairs & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("exact dedup groups: every group keeps its minimum doc_id") {
    val out = graft.SparkEntry.queries("dd_exact_keep_first")(spark, dir)
    assert(out.agg(sum(col("group_size"))).head().getLong(0) == 500L)
    assert(out.filter(col("keep_id").isNull).count() == 0)
  }

  test("ppjoin charWindow drops high-jaccard pairs outside the char window only") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val longer = base + " " + ("x" * 40) // 1 extra shingle, +41 chars
    val docs = Seq((1L, base), (2L, longer), (3L, base))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    def run(window: Int) = graft.operators.PrefixFilterJoin
      .pairs(docs, num = 4, den = 5, charWindow = window)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // unwindowed: all three pairs clear jaccard 0.8 (58/59 and 1.0)
    val all = graft.operators.PrefixFilterJoin
      .pairs(docs, num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // window 16: the +41-char doc pairs are pruned, the equal-length kept
    assert(run(16) == Set((1L, 3L)))
    // window large enough readmits everything — lossless residual
    assert(run(100) == all)
  }
}
