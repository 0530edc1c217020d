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
  * one map-side-combinable frequency pass builds the order, prefix
  * shingles are grouped into an inverted index (tiny buckets on Zipfian
  * corpora — the prefix keeps only rare shingles), pairs are generated
  * INSIDE each bucket (so the prefix relation is computed exactly once —
  * no self-join, no cache, no eager materialization on the timed path),
  * a length-ratio filter plus PPJoin's positional filter prune further,
  * and the merge-walk Jaccard expression rescores exactly. No false
  * negatives: the result is identical to the all-pairs join at any scale.
  *
  * The threshold is a rational num/den so the prefix length is computed
  * in exact integer arithmetic — ceil(0.8·|d|) in double is off by one
  * for |d| divisible by 5.
  *
  * Nothing is cached: the shingle relation is recomputed per consumer
  * (one ranked pass + two rescore sides). At 100 TB the shingle arrays
  * would never fit in cache anyway — recompute-from-scan is the shape
  * that survives scale, and at bench scale the ngram pass is scan-bound
  * and cheap. This also means repeated invocations leak nothing in the
  * block manager.
  */
object PrefixFilterJoin {

  /** Exact jaccard-threshold pairs (doc_a < doc_b, jaccard >= num/den)
    * over `docs` with columns (doc_id, text).
    *
    * `charWindow >= 0` additionally requires |n_chars_a - n_chars_b| <=
    * charWindow (docs must then carry an n_chars column). The window is
    * enforced INSIDE the candidate stage — before any rescore — so a
    * length-blocked variant costs strictly less than the unblocked join.
    * This is the scale-correct way to run a "length-bucketed" similarity
    * join: plain length blocking floods (at sf0.1 the +/-16-char buckets
    * admit 812k candidate pairs for 5k docs, ~65x the corpus), while the
    * rarest-first prefix filter bounds candidates by shingle rarity and
    * the window is a free residual predicate on columns already in the
    * bucket structs.
    */
  def pairs(docs: DataFrame, num: Int, den: Int,
            charWindow: Int = -1): DataFrame = {
    require(num > 0 && num <= den, s"threshold must be in (0,1]: $num/$den")
    val s = docs.sparkSession
    GraftFunctions.register(s)
    val threshold = num.toDouble / den.toDouble
    // nc: the doc's char length, carried through the prefix machinery
    // ONLY when a window is requested. Unconditionally widening the
    // (doc_id, sz, h) rows by 8 bytes sounds free, but the freq join
    // sort-merges ~38 exploded rows per doc — at 10M docs that is
    // 380M sorted rows, and the extra column tipped the unwindowed
    // join from heavy-spill-but-completes into executor OOM on the
    // 8 GB ScaleSmoke heap. The windowed variant pays for exactly what
    // it uses.
    val windowed = charWindow >= 0
    val ncCols: Seq[org.apache.spark.sql.Column] =
      if (windowed) Seq(col("nc")) else Nil
    def sets: DataFrame = {
      val base = docs.select(
        Seq(col("doc_id")) ++
          (if (windowed) Seq(col("n_chars").as("nc")) else Nil) :+
          GraftFunctions.ngram_hashes(split(col("text"), " ")).as("sh"): _*)
      base.withColumn("sz", size(col("sh")))
        .filter(col("sz") > 0)
    }
    // global rarest-first order: frequency, ties by hash. Partial-agg
    // combinable, skew-free (no per-shingle doc lists materialized).
    val freq = sets.select(explode(col("sh")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("f"))
    // per-doc prefix under that order: sz - ceil(t*sz) + 1 rarest shingles
    val prefixLen = expr(s"sz - (($num * sz + ${den - 1}) div $den) + 1").cast("int")
    val pref = sets.select(
        Seq(col("doc_id"), col("sz")) ++ ncCols :+ explode(col("sh")).as("h"): _*)
      .join(freq, Seq("h"))
      .groupBy(Seq(col("doc_id"), col("sz")) ++ ncCols: _*)
      .agg(array_sort(collect_list(struct(col("f"), col("h")))).as("fh"))
      .select(Seq(col("doc_id"), col("sz")) ++ ncCols :+
        posexplode(slice(transform(col("fh"), x => x.getField("h")), lit(1), prefixLen))
          .as(Seq("p", "h")): _*)
    // inverted index on prefix shingles: pairs are generated inside each
    // bucket, so the ranked-prefix subtree above is computed exactly once
    // (a prefix self-JOIN would read it twice, forcing a cache + eager
    // materialization onto the timed path — the round-6 regression).
    // Buckets are rare-shingle postings lists: tiny on Zipfian text.
    val buckets = pref
      .groupBy(col("h"))
      .agg(collect_list(struct(
        Seq(col("doc_id"), col("sz")) ++ ncCols :+ col("p"): _*)).as("ds"))
      .filter(size(col("ds")) > 1)
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
    val shufflePartitions = s.conf.get("spark.sql.shuffle.partitions").toInt
    val candidates = buckets
      .select(explode(col("ds")).as("a"), col("ds"))
      // only partners later in doc order: halves the fan-out pre-explode
      .select(col("a"),
        explode(filter(col("ds"), b => b.getField("doc_id") > col("a.doc_id")))
          .as("b"))
      .select(
        Seq(col("a.doc_id").as("doc_a"), col("a.sz").as("sz_a"),
          col("a.p").as("p_a"),
          col("b.doc_id").as("doc_b"), col("b.sz").as("sz_b"),
          col("b.p").as("p_b")) ++
        (if (windowed) Seq(col("a.nc").as("nc_a"), col("b.nc").as("nc_b"))
         else Nil): _*)
      // length-ratio filter: jaccard >= t needs t|A| <= |B| <= |A|/t;
      // plus the char-length window in the windowed variant
      .filter(col("sz_b") * den >= col("sz_a") * num &&
        col("sz_a") * den >= col("sz_b") * num &&
        uBound >= oReq &&
        (if (windowed) abs(col("nc_b") - col("nc_a")) <= charWindow
         else lit(true)))
      .select(col("doc_a"), col("doc_b"))
      // one exchange, not two: an explicit-width repartition on the pair key
      // followed by dropDuplicates reuses that partitioning for the dedup
      // aggregate (no second shuffle), and the explicit numPartitions keeps
      // AQE from coalescing the bytes-small but compute-heavy candidate set
      // to ~1 partition, which would serialize the rescoring. Width follows
      // spark.sql.shuffle.partitions — a data/deployment-tunable knob —
      // not defaultParallelism (a fixed cluster-shaped constant that stops
      // scaling when the candidate set needs more partitions than cores).
      .repartition(shufflePartitions, col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // rescore: stack the two pair sides into (pair, role, doc_id) rows so
    // ONE join against `sets` attaches both shingle arrays — one corpus
    // scan + ngram pass instead of two (the arrays regroup on the tiny
    // pair key, never on a corpus-sized one).
    val stacked = candidates
      .select(explode(array(
        struct(struct(col("doc_a"), col("doc_b")).as("pair"),
          lit(0).as("role"), col("doc_a").as("doc_id")),
        struct(struct(col("doc_a"), col("doc_b")).as("pair"),
          lit(1).as("role"), col("doc_b").as("doc_id")))).as("x"))
      .select(col("x.pair").as("pair"), col("x.role").as("role"), col("x.doc_id").as("doc_id"))
    stacked.join(sets.select(col("doc_id"), col("sh")), Seq("doc_id"))
      .groupBy(col("pair"))
      // exactly one non-null per role within a pair, so first() is
      // deterministic in value
      .agg(
        first(when(col("role") === 0, col("sh")), ignoreNulls = true).as("sh_a"),
        first(when(col("role") === 1, col("sh")), ignoreNulls = true).as("sh_b"))
      .select(col("pair.doc_a").as("doc_a"), col("pair.doc_b").as("doc_b"),
        GraftFunctions.sorted_set_jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= lit(threshold))
  }
}
