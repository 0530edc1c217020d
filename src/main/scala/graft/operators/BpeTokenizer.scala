package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BpeEncode, GraftFunctions}

/** Distributed BPE merge-table training (Sennrich et al., ACL'16 — the
  * public algorithm; Spark-native dataflow). Each iteration is one
  * codegen'd pass over the corpus — encode every pre-token under the
  * merges learned so far, emit its adjacent symbol pairs — feeding a
  * map-side-combinable pair count whose argmax (one collected row) is
  * the next merge. Nothing is cached and no state lives outside the
  * merge list itself: N merges = N scans, which is why a real pipeline
  * trains on a bounded REPRESENTATIVE sample of the corpus (the same
  * rule as the IVF quantizer) and freezes the table as an artifact;
  * budgets, packing, and dataset cards then tokenize 100 TB under the
  * frozen table without ever re-training.
  *
  * Determinism: ties in the pair count break lexicographically on
  * (left, right); candidates whose concat collides with an existing
  * symbol string are SKIPPED (rare: e.g. "ab"+"c" after "a"+"bc"
  * already created "abc") — the replayability invariant [[BpeEncode]]
  * validates, which makes greedy-by-rank encoding equal to rank-order
  * replay and therefore lets a plain-SQL oracle replay the encode.
  */
object BpeTokenizer {

  /** Train up to `nMerges` merges on `docs(textCol)`. Stops early when
    * the best remaining pair occurs fewer than `minCount` times (merges
    * memorizing one rare string are noise). The candidate argmax
    * collects the top 64 pairs (bounded) so collision skips never need
    * a second pass; if every candidate collides the training stops —
    * by then the table is degenerate anyway.
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    var merges = Vector.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val pairs = docs
        .select(GraftFunctions.bpe_pairs(col(textCol), merges).as("ps"))
        .select(explode(col("ps")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p").asc)
        .limit(64)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val taken = new scala.collection.mutable.HashSet[String]
      merges.foreach { case (l, r) => taken += (l + r) }
      val next = pairs.iterator
        .filter(_._2 >= minCount)
        .map { case (p, n) =>
          val i = p.indexOf(BpeEncode.US)
          ((p.substring(0, i), p.substring(i + 1)), n)
        }
        .find { case ((l, r), _) =>
          val concat = l + r
          // mirror validateReplayable's marker check: corpus text can
          // contain the RS/US wrap markers (the class-3 pre-tokenizer
          // keeps them), and a merge whose symbols embed one would be
          // rejected at encode time — and a left symbol equal to US
          // would even mis-split this candidate's own pair-key parse
          !concat.exists(c => c == BpeEncode.RS || c == BpeEncode.US) &&
            !taken.contains(concat) &&
            !merges.exists { case (pl, pr) => pl == concat || pr == concat }
        }
      next match {
        case Some((pair, _)) => merges = merges :+ pair
        case None => continue = false
      }
    }
    merges
  }

  /** Persist a merge table as the frozen vocab artifact: (rank, left,
    * right), one overwrite — tiny, read whole.
    */
  def writeVocab(spark: SparkSession, merges: Seq[(String, String)],
      path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def readVocab(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank"), col("left"), col("right"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
}
