package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Exact blocklist anti-join accelerated by a bloom pre-filter — the
  * "remove benchmark/eval contamination" step of a training-data
  * pipeline at 100 TB scale.
  *
  * A plain `left_anti` join shuffles the ENTIRE corpus on the join key.
  * With a blocklist that is orders of magnitude smaller than the corpus
  * (the realistic case: thousands of eval fingerprints vs billions of
  * docs), that shuffle is nearly all wasted motion — almost every row
  * is clean. Instead:
  *
  *   1. aggregate the blocklist keys into ONE serialized bloom filter
  *      (a few MB; partial aggregation means each executor sends one
  *      filter, not its rows);
  *   2. embed it as a literal in a scan-side predicate
  *      (`bloom_might_contain`) — rows the filter rejects are
  *      DEFINITELY clean and never shuffle;
  *   3. exact-anti-join only the candidates that the filter might
  *      contain (expected: blocklist hits + FPR × corpus — roughly
  *      `fpr`% of the original shuffle volume).
  *
  * The result is row-identical to the plain anti-join (the bloom filter
  * has no false negatives; false positives are re-checked by the exact
  * join). The corpus is scanned twice, but columnar scans are cheap
  * compared to a full-corpus shuffle, and the second scan's join input
  * is tiny. This mirrors what Spark's own InjectRuntimeFilter does for
  * shuffle semi/inner joins — expressed here as a reusable operator the
  * optimizer can't inject on its own (it never fires for anti-joins).
  */
object BloomAntiJoin {

  /** All `corpus` rows whose `key` does not appear in `blocklist.bKey`.
    * `expectedItems`/`numBits` size the filter (defaults: 1M items in
    * 8M bits ≈ 3% FPR at capacity; at 100 TB pass the real blocklist
    * cardinality). `numBits` is clamped to the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 64M
    * bits = 8 MB): BloomFilterAggregate itself applies the same
    * `Math.min`, so an over-ask would otherwise be SILENTLY truncated —
    * clamping here makes the effective size explicit. The cap exists
    * because the serialized filter is embedded in the plan as a
    * literal, so an unbounded filter would bloat every task's plan.
    * Past the cap the filter stays valid but its FPR degrades toward
    * `1 - exp(-k·items/maxBits)` — that costs exact-join work, never
    * correctness; raise the conf before calling if a billion-key
    * blocklist needs a tighter pre-filter.
    */
  def antiJoin(
      corpus: DataFrame,
      key: Column,
      blocklist: DataFrame,
      bKey: Column,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    val maxNumBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val cappedBits = math.min(numBits, maxNumBits)
    val bloomRow = blocklist
      .agg(GraftFunctions.bloom_filter_agg(bKey, expectedItems, cappedBits).as("bf"))
      .head()
    // empty blocklist → aggregate yields null → nothing is blocked
    if (bloomRow.isNullAt(0)) return corpus
    val bloom = lit(bloomRow.getAs[Array[Byte]](0))
    val candidates = corpus
      .filter(GraftFunctions.bloom_might_contain(bloom, key))
      .join(blocklist.select(bKey.as("__bkey")), key === col("__bkey"), "left_anti")
    val clean = corpus.filter(!GraftFunctions.bloom_might_contain(bloom, key))
    clean.unionByName(candidates)
  }
}
