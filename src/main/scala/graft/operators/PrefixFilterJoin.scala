package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** PPJoin-style prefix-filtered exact similarity join over word-3-gram
  * shingles (Xiao et al., "Efficient Similarity Joins for Near Duplicate
  * Detection", WWW'08 — the candidate-bounding idea; the implementation
  * here is Spark-native dataflow, not the paper's index loop).
  *
  * For Jaccard threshold t = num/den, any pair with jaccard >= t must
  * share at least one shingle within each document's first
  * (|d| - ceil(t·|d|) + 1) shingles under a GLOBAL rarest-first order. So:
  * one map-side-combinable frequency pass builds the order, an equi-join
  * on prefix shingles generates candidates (tiny buckets on Zipfian
  * corpora — the prefix keeps only rare shingles), a length-ratio filter
  * prunes further, and the merge-walk Jaccard expression rescores
  * exactly. No false negatives: the result is identical to the all-pairs
  * join at any scale.
  *
  * The threshold is a rational num/den so the prefix length is computed
  * in exact integer arithmetic — ceil(0.8·|d|) in double is off by one
  * for |d| divisible by 5.
  */
object PrefixFilterJoin {

  /** Exact jaccard-threshold pairs (doc_a < doc_b, jaccard >= num/den)
    * over `docs` with columns (doc_id, text).
    */
  def pairs(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && num <= den, s"threshold must be in (0,1]: $num/$den")
    val s = docs.sparkSession
    GraftFunctions.register(s)
    val threshold = num.toDouble / den.toDouble
    val sets = docs
      .select(col("doc_id"),
        GraftFunctions.ngram_hashes(split(col("text"), " ")).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
      .cache()
    // materialize before the final action fans out over four plan branches
    // (freq, ranked, and both rescoring sides) — an unmaterialized cache is
    // raced by concurrent branches and recomputed per branch
    sets.count()
    // global rarest-first order: frequency, ties by hash
    val freq = sets.select(explode(col("sh")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("f"))
    // per-doc prefix under that order: sz - ceil(t*sz) + 1 rarest shingles
    val prefixLen = expr(s"sz - (($num * sz + ${den - 1}) div $den) + 1").cast("int")
    val ranked = sets.select(col("doc_id"), col("sz"), explode(col("sh")).as("h"))
      .join(freq, Seq("h"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("f"), col("h")))).as("fh"))
      .select(col("doc_id"), col("sz"),
        slice(transform(col("fh"), x => x.getField("h")), lit(1), prefixLen).as("prefix"))
      // both sides of the candidate self-join read `ranked`; uncached,
      // Spark recomputes the freq-join + collect_list subtree per side
      .cache()
    ranked.count()
    val pref = ranked.select(col("doc_id"), col("sz"),
      posexplode(col("prefix")).as(Seq("p", "h")))
    // positional filter (PPJoin's second pruning rule): a prefix shingle
    // matching at 1-based positions (i, j) of the docs' globally-sorted
    // shingle lists caps the possible overlap at min(|A|-i, |B|-j) + 1 —
    // everything shared sits at or after the match on both sides. A true
    // pair (jaccard >= t, i.e. overlap >= ceil(t/(1+t)·(|A|+|B|))) passes
    // the cap at its FIRST common shingle, which the prefix theorem
    // guarantees is a prefix-prefix match, so keeping pairs where ANY
    // co-occurrence passes is exact. Integer rational arithmetic again:
    // with t = num/den, o_req = ceil(num·(szA+szB) / (num+den)).
    val oReq = expr(
      s"($num * (sz_a + sz_b) + ${num + den - 1}) div ${num + den}")
    val uBound =
      least(col("sz_a") - (col("p_a") + 1), col("sz_b") - (col("p_b") + 1)) + 1
    val candidates = pref
      .select(col("h"), col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("p").as("p_a"))
      .join(pref.select(col("h"), col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("p").as("p_b")), Seq("h"))
      // doc order + length-ratio filter: jaccard >= t needs t|A| <= |B| <= |A|/t
      .filter(col("doc_a") < col("doc_b") &&
        col("sz_b") * den >= col("sz_a") * num && col("sz_a") * den >= col("sz_b") * num &&
        uBound >= oReq)
      .select(col("doc_a"), col("doc_b"))
      // one exchange, not two: an explicit-width repartition on the pair key
      // followed by dropDuplicates reuses that partitioning for the dedup
      // aggregate (no second shuffle), and the explicit numPartitions keeps
      // AQE from coalescing the bytes-small but compute-heavy candidate set
      // to ~1 partition, which would serialize the rescoring
      .repartition(s.sparkContext.defaultParallelism, col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        GraftFunctions.sorted_set_jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= lit(threshold))
  }
}
