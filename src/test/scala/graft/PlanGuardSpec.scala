package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make these queries
  * scale are asserted, not assumed — losing a pushdown, a broadcast, or
  * the top-k operator in a refactor fails here, not at 100 TB.
  */
class PlanGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: date filter pushed to the parquet scan, schema pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "q1 must not read unused columns")
  }

  test("q5: every dimension join is broadcast") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk_orders: TakeOrderedAndProject, no global sort") {
    val p = plan("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("etl_f5: range predicate reaches the scan") {
    val p = plan("etl_f5_range_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"), p)
  }

  test("semi/anti joins plan as semi/anti, not inner+dedup") {
    assert(plan("q_semi_join").contains("LeftSemi"), plan("q_semi_join"))
    assert(plan("q_anti_join").contains("LeftAnti"), plan("q_anti_join"))
  }

  test("native top-k per key plans the two-phase heap operator") {
    val p = plan("q_topk_per_key_native")
    assert("TopKPerKey \\[".r.findAllIn(p).nonEmpty, p)
  }

  test("q_range_join: band join broadcasts the inline dimension, no shuffle join") {
    val p = plan("q_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dd_jaccard_ppjoin: candidate generation is an equi join, never cartesian") {
    val p = plan("dd_jaccard_ppjoin")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_exists_subquery: correlated EXISTS plans as semi/anti joins") {
    val p = plan("q_exists_subquery")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("narrow per-row text ops stay in one whole-stage codegen span") {
    val p = plan("txt_token_stats")
    assert(p.contains("*(1)"), p) // the whole-stage-codegen span marker
    assert(!p.contains("Exchange"), "per-row text stats must not shuffle")
  }

  test("dd_contamination: benchmark spans broadcast; the corpus never shuffles for the join") {
    val p = plan("dd_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dd_span_dupes: no distinct-aggregate Expand — plain two-level hash aggregation") {
    val p = plan("dd_span_dupes")
    assert(!p.contains("Expand"), p)
  }

  test("pipe_quota_sample: runs on the native top-k plan, not a window sort") {
    val p = plan("pipe_quota_sample")
    assert("TopKPerKey \\[".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("Window"), p)
  }

  test("ev_funnel: stage joins are hash joins, never cartesian") {
    val p = plan("ev_funnel")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_interval_overlap: binned overlap joins as equi-join, never cartesian") {
    val p = plan("q_interval_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph_pagerank: rank updates are hash joins over the cached edge list") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("InMemoryTableScan"), "edge list must be cached")
  }

  test("q_window_ignore_nulls: one shuffle for all four window functions") {
    val p = plan("q_window_ignore_nulls")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_multi_exists: EXISTS and NOT EXISTS decorrelate to semi and anti joins") {
    val p = plan("q_multi_exists")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_gap_fill: date filter pushed to scan; spine fill is a broadcast join") {
    val p = plan("q_gap_fill")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_mode_deterministic: two aggregations with map-side partials, no window and no join") {
    val p = plan("q_mode_deterministic")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    // counts combine map-side; the struct arg-max (SortAggregate — struct
    // max has no hash impl) also runs partial_max before its shuffle
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_max"), p)
  }

  test("q8_market_share: dimension filters broadcast; no cartesian in the 8-way join") {
    val p = plan("q8_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q10_returned_items: top-20 is TakeOrderedAndProject, not a global sort") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q18_large_orders: the HAVING subquery plans as a semi join") {
    val p = plan("q18_large_orders")
    assert(p.contains("LeftSemi"), p)
  }

  test("q_window_zscore: one shuffle serves all three window aggregates") {
    val p = plan("q_window_zscore")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_outlier_clip: percentile bounds broadcast back to the rows") {
    val p = plan("q_outlier_clip")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_not_in_nulls: NOT IN plans as anti joins, never a cartesian filter") {
    val p = plan("q_not_in_nulls")
    assert(p.contains("LeftAnti"), p)
  }

  test("pipe_chunk_overlap: chunking is map-only — generators, no shuffle") {
    val p = plan("pipe_chunk_overlap")
    assert(!p.contains("Exchange"), "chunking must not shuffle:\n" + p)
    assert(p.contains("Generate"), p)
  }

  test("src_partitioned_join: storage-partitioned layout serves the join — no key shuffle") {
    val p = plan("src_partitioned_join")
    assert(!p.contains("Exchange hashpartitioning(c_nationkey"), p)
    assert(!p.contains("Exchange hashpartitioning(s_nationkey"), p)
  }

  test("src_bucketed_join: bucket layout serves the join — no Exchange on either side") {
    val p = plan("src_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // the only shuffle allowed is the final groupBy(c_mktsegment);
    // neither join key may repartition at read time
    assert(!p.contains("Exchange hashpartitioning(o_custkey"), p)
    assert(!p.contains("Exchange hashpartitioning(c_custkey"), p)
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("txt_bm25_topk: postings prune to query terms before any shuffle; " +
    "df/query/stats sides broadcast") {
    val p = plan("txt_bm25_topk")
    // the In(term, ...) filter must sit under the first Exchange — data
    // motion proportional to matching postings, not corpus size
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    val termFilter = p.indexOf("term#")
    assert(firstExchange >= 0, p)
    assert(p.contains("customer"), p) // the literal query-term list is inline
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(termFilter >= 0, p)
  }

  test("sim_semantic_dedup: seeds broadcast; the pair join shuffles only on the cluster key") {
    val p = plan("sim_semantic_dedup")
    assert(!p.contains("CartesianProduct"), "assignment must broadcast seeds:\n" + p)
    // intra-cluster pairing is an equi join on `cluster`
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q_typed_aggregator: typed Aggregator keeps map-side partial aggregation") {
    val p = plan("q_typed_aggregator")
    val aggs = "ObjectHashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate, got $aggs:\n" + p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("pipe_leak_safe_split: split assignment is map-side over the cluster map — " +
    "no extra shuffle beyond the dedup pipeline itself") {
    val p = plan("pipe_leak_safe_split")
    // the md5/split projection must not introduce its own Exchange: the
    // same exchange count as the canonical-cluster pipeline feeding it
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    val cluster = SparkEntry.queries("dd_cluster_canonical")(spark, dir)
      .queryExecution.executedPlan.toString
    val clusterExchanges = "Exchange hashpartitioning".r.findAllIn(cluster).size
    // + 1 for the left join attaching components to ALL docs (the
    // cluster query returns only clustered docs)
    assert(exchanges <= clusterExchanges + 2,
      s"split added ${exchanges - clusterExchanges} exchanges over the cluster pipeline:\n" + p)
  }

  test("txt_unigram_score: token counts broadcast back; corpus total rides a 1-row broadcast") {
    val p = plan("txt_unigram_score")
    // tokens ⋈ tf is a broadcast hash join (vocabulary-sized build side)
    assert(p.contains("BroadcastHashJoin"), p)
    // the scalar total attaches via a broadcast nested loop over ONE row,
    // never a shuffled cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("txt_repetition_ratio: shuffle-free — per-row array work only") {
    val p = plan("txt_repetition_ratio")
    assert(!p.contains("Exchange"), "repetition ratio must not shuffle:\n" + p)
  }

  test("txt_char_diversity: per-char aggregate broadcasts back to the doc table") {
    val p = plan("txt_char_diversity")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pipe_dataset_card: one corpus scan feeding a single global aggregate") {
    val p = plan("pipe_dataset_card")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "dataset card must read the corpus once:\n" + p)
    assert(!p.contains("Join"), p)
  }

  test("sim_pq_adc: encode is shuffle-free per-row work; queries broadcast; rank pushed down") {
    val p = plan("sim_pq_adc")
    // the 10-query side broadcasts against the coded corpus scan
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the ONLY shuffle is the per-query window; encode itself never
    // exchanges (128 dot products inside whole-stage codegen)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    // rank<=5 is pushed into the shuffle as a group limit
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("sim_knn_label: neighbor scoring broadcasts the query side, never a shuffled cartesian") {
    val p = plan("sim_knn_label")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dd_incremental_lsh: candidate generation is equi-joins on band keys, never cartesian") {
    val p = plan("dd_incremental_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  /** True iff an EXPLICIT broadcast hint forces an array-carrying
    * relation (shingle arrays) through a broadcast — the executor
    * memory bomb that no size estimate can veto at 100 TB. Size-based
    * auto-broadcasts at tiny test SFs are fine: they flip to shuffle
    * joins on real statistics.
    */
  private def forcesArrayBroadcast(name: String): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // only the hint root's OUTPUT is the broadcast payload — arrays
    // consumed and collapsed by aggregates/projections BELOW the hint
    // (e.g. a tiny hot-key list derived from the shingle relation)
    // never travel through the broadcast
    SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      .collect { case h: ResolvedHint if h.hints.strategy.nonEmpty => h }
      .exists(_.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
  }

  test("dd_ngram_jaccard: shingle arrays never force-broadcast; nothing cached on the timed path") {
    val p = plan("dd_ngram_jaccard")
    assert(!forcesArrayBroadcast("dd_ngram_jaccard"),
      "the rescore must attach shingle arrays via pair-keyed joins, not broadcast hints:\n" + p)
    assert(!p.contains("InMemoryTableScan"), "no cache on the timed path:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dd_minhash_lsh: shingle arrays never force-broadcast; no full-corpus cache") {
    val p = plan("dd_minhash_lsh")
    assert(!forcesArrayBroadcast("dd_minhash_lsh"), p)
    assert(!p.contains("InMemoryTableScan"), "no cache on the timed path:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }


  test("pipe_dedup_funnel: no cartesian anywhere in the three-stage pipeline") {
    val p = plan("pipe_dedup_funnel")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join allowed is the 1-row stage-count attach
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  // Generate-guard regression: exploding a COMPUTED array lets
  // InferFiltersFromGenerate push a size guard whose alias substitution
  // re-evaluates the array-building pipeline at the scan — once per
  // referenced slot (32x for the old posexplode(bands), measured 30-50x
  // the signature pass at 1M docs). These queries explode literal/cheap
  // index sequences instead; a refactor back to the array shape shows up
  // as the expensive expression appearing inside a Filter condition, or
  // as the expression fanning out across the plan.
  private def filterLines(name: String): Seq[String] =
    plan(name).linesIterator.filter(_.contains("Filter")).toSeq

  test("LSH/simhash/span/fuzzy: no expensive expression inside a pushed filter") {
    for ((q, bad) <- Seq(
        "dd_minhash_lsh" -> Seq("minhash_sig(", "ngram_hashes("),
        "dd_incremental_lsh" -> Seq("minhash_sig(", "ngram_hashes("),
        "dd_simhash_pairs" -> Seq("simhash64("),
        "dd_span_dupes" -> Seq("array_join("),
        "dd_span_dupes_hashed" -> Seq("array_join(", "md5("),
        "dd_contamination" -> Seq("array_join("),
        "q_fuzzy_join" -> Seq("substr(")))
      for (b <- bad; l <- filterLines(q))
        assert(!l.contains(b), s"$q: expensive expr $b re-evaluated in a filter: $l")
  }

  test("dd_minhash_lsh: the signature pipeline appears once, not per band slot") {
    val p = plan("dd_minhash_lsh")
    assert("minhash_sig\\(".r.findAllIn(p).size <= 2,
      "minhash_sig fanned out across the plan (generate-guard blowup):\n" + p)
  }
}
