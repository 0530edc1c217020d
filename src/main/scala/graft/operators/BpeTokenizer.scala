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

  /** What [[trainMergesScalable]] learned, plus the bound-and-coverage
    * evidence a 100 TB training run must publish: how many distinct
    * pre-tokens the corpus held, how many the `maxPreTokens` bound kept,
    * and what share of token OCCURRENCES the kept table covers — "train
    * on a bounded representative sample" is enforced by the bound and
    * measured by the coverage, never asserted.
    */
  final case class BpeTrainResult(
      merges: Seq[(String, String)],
      distinctPreTokens: Long,
      keptPreTokens: Int,
      occurrenceCoverage: Double,
      corpusScans: Int)

  /** Corpus-scale BPE training: the corpus is scanned a CONSTANT number
    * of times (twice — once for the pre-token frequency table, once for
    * the coverage totals), independent of the merge count; everything
    * else is driver-side work over the bounded frequency table. This is
    * the classic Sennrich formulation — BPE statistics depend only on
    * (pre-token, count), so the 100 TB corpus collapses to a frequency
    * table ONE map-side-combinable aggregation wide, capped at the
    * `maxPreTokens` most frequent pre-tokens (heavy-tail: the kept top
    * covers almost all occurrence mass, and the result reports exactly
    * how much). Per merge the driver updates pair counts incrementally —
    * only words containing the merged pair are touched — so a 32k-merge
    * table costs minutes of driver arithmetic, not 32k corpus scans
    * (which is why [[trainMerges]], one scan PER merge, stays the
    * small-fixture reference implementation, not the scale path).
    *
    * Equivalence: selection order (count desc, then `left·US·right`
    * lexicographic), the minCount stop, the collision skip, and the
    * marker skip all mirror [[trainMerges]]; incremental application of
    * each selected merge equals re-encoding under the table-so-far by
    * the replayability invariant (greedy-by-rank ≡ rank-order replay —
    * [[BpeEncode]]'s proof sketch), so the two trainers emit the SAME
    * table on the same corpus (spec-pinned). The one deliberate
    * difference: trainMerges stops if its top-64 candidate window is all
    * collisions; this trainer sees every candidate, so it can only learn
    * a superset in that degenerate case.
    *
    * `trainFraction` sub-samples documents deterministically by text
    * hash (the IVF trainFraction rule) — the bounded-cost knob when even
    * two scans are too dear.
    */
  def trainMergesScalable(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxPreTokens: Int = 1 << 20,
      trainFraction: Double = 1.0): BpeTrainResult = {
    require(trainFraction > 0 && trainFraction <= 1,
      s"trainFraction must be in (0,1]: $trainFraction")
    require(maxPreTokens > 0, s"maxPreTokens must be positive: $maxPreTokens")
    val sampled =
      if (trainFraction >= 1.0) docs
      else docs.filter(
        pmod(xxhash64(col(textCol)), lit(1000000L)) <
          lit((trainFraction * 1000000L).toLong))
    val freq = sampled
      .select(explode(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val top = freq.orderBy(col("n").desc, col("w").asc)
      .limit(maxPreTokens)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totals = freq.agg(sum(col("n")), count(lit(1))).collect().head
    val totalOcc = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val distinct = totals.getLong(1)
    val keptOcc = top.iterator.map(_._2).sum
    val merges = trainOnFrequencies(top, nMerges, minCount)
    BpeTrainResult(merges, distinct, top.length,
      if (totalOcc == 0L) 1.0 else keptOcc.toDouble / totalOcc,
      corpusScans = 2)
  }

  /** Driver-side incremental trainer over a (pre-token, count) table —
    * the arithmetic core of [[trainMergesScalable]], separated so specs
    * can drive it on hand-built tables.
    */
  def trainOnFrequencies(table: Array[(String, Long)], nMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    // current symbolization of each distinct pre-token (starts as chars)
    val words: Array[Array[String]] =
      table.map { case (w, _) => w.toCharArray.map(String.valueOf) }
    val freq: Array[Long] = table.map(_._2)
    def pairsOf(syms: Array[String]): Iterator[(String, String)] =
      (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // Lazy max-heap selection: every count change pushes a fresh
    // (count, key, pair) entry; pops discard entries whose count no
    // longer matches the live map. O(log P) per update/selection
    // instead of a full pairCount scan per merge — the full scan made
    // training O(nMerges × distinct_pairs) driver work, which at the
    // advertised scale (32k merges over the 2^20 pre-token bound) is
    // hours, not minutes. Ordering mirrors trainMerges'
    // orderBy(n desc, p asc) with the tie key compared in UTF-8 BYTES
    // — Spark's string ordering — NOT UTF-16 code units: the two
    // disagree on supplementary characters vs U+FFFF.., and the
    // trainers must pick the same merge on ties.
    final case class Cand(n: Long, key: Array[Byte], p: (String, String))
    val candOrd: Ordering[Cand] = new Ordering[Cand] {
      def compare(a: Cand, b: Cand): Int = {
        val c = java.lang.Long.compare(a.n, b.n)
        if (c != 0) c
        else java.util.Arrays.compareUnsigned(b.key, a.key) // smaller key wins
      }
    }
    val heap = mutable.PriorityQueue.empty[Cand](candOrd)
    def keyBytes(p: (String, String)): Array[Byte] =
      (p._1 + BpeEncode.US + p._2)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def addWord(wi: Int, sign: Long): Unit =
      pairsOf(words(wi)).foreach { p =>
        val n = pairCount.getOrElse(p, 0L) + sign * freq(wi)
        if (n == 0L) { pairCount.remove(p); pairWords.get(p).foreach(_ -= wi) }
        else {
          pairCount.update(p, n)
          heap.enqueue(Cand(n, keyBytes(p), p))
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        }
      }
    words.indices.foreach(addWord(_, 1L))
    // leftmost-non-overlapping single-merge application — char-for-char
    // BpeEncode.encodeWord's merge step
    def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
      val out = new mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }
    var merges = Vector.empty[(String, String)]
    val taken = mutable.HashSet.empty[String] // symbols created by merges
    val operands = mutable.HashSet.empty[String] // symbols used as l or r
    def valid(l: String, r: String): Boolean = {
      val concat = l + r
      !concat.exists(c => c == BpeEncode.RS || c == BpeEncode.US) &&
        !taken.contains(concat) && !operands.contains(concat)
    }
    var continue = true
    while (continue && merges.size < nMerges) {
      // pop to the first CURRENT entry (count matches the live map).
      // Stale entries drop; an entry whose pair became invalid
      // (collision/marker) drops permanently — validity only ever
      // shrinks, and its count-current duplicates re-surface and drop
      // the same way. The first current entry is the true maximum: a
      // live pair's latest count was pushed at its last update and can
      // only sit BELOW stale-high garbage, never below another current
      // entry that outranks it.
      var best: (String, String) = null
      var stop = false
      while (best == null && !stop) {
        if (heap.isEmpty) stop = true
        else {
          val c = heap.dequeue()
          if (pairCount.getOrElse(c.p, 0L) == c.n) {
            if (c.n < minCount) stop = true // true max below the floor
            else if (valid(c.p._1, c.p._2)) best = c.p
            // invalid-forever: drop and keep popping
          }
        }
      }
      if (best == null) continue = false
      else {
        val (l, r) = best
        merges = merges :+ best
        taken += (l + r); operands += l; operands += r
        // incremental: only words currently containing the pair change
        pairWords.get(best).map(_.toArray).getOrElse(Array.empty).foreach { wi =>
          addWord(wi, -1L)
          words(wi) = applyMerge(words(wi), l, r)
          addWord(wi, 1L)
        }
        pairCount.remove(best)
        pairWords.remove(best)
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
