package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.NearDupLsh

/** Streaming NEAR-duplicate dedup against the persisted LSH signature
  * index — the cross-batch half of a daily-crawl ingest pipeline
  * (DedupStoreStream is the exact-hash half). Documents arrive in
  * micro-batches forever; each batch keeps only documents with no
  * near-duplicate (3-gram Jaccard >= threshold) among the documents
  * ACCEPTED in any earlier batch, then appends the survivors'
  * signatures to the index so later batches dedup against them.
  *
  * Per micro-batch:
  *   1. within-batch EXACT dedup (md5 keep-first) — near-dup pruning
  *      within a batch is the batch-prep job (`pipe_dedup_funnel`);
  *      this stream owns the incremental cross-batch part, where the
  *      index is the only affordable memory of 100 TB of history.
  *   2. `NearDupLsh.pairsAgainstIndex` against the standing index,
  *      hot buckets skipped via the PERSISTED per-batch stats (one
  *      tiny read, never an index re-aggregation) — O(batch) compute:
  *      only the batch is shingled/hashed, the corpus is re-read as
  *      pruned parquet columns and never reshuffled.
  *   3. survivors' signatures + stats deltas land in `batch=<id>`
  *      partition dirs with OVERWRITE (`writeIndexBatch`): a crash
  *      between the index write and the checkpoint commit redelivers
  *      the batch, which then REPLACES its own partitions — the dedup
  *      decision replays identically because its inputs (the earlier
  *      batches' partitions) are untouched. Exactly-once membership
  *      without a transaction log.
  *
  * Documents with fewer than 3 tokens carry no shingles, can never
  * clear a Jaccard threshold, and are accepted without entering the
  * index (exact-dup control for those belongs to DedupStoreStream's
  * md5 store).
  */
object NearDupIndexStream {

  /** Dedup one micro-batch against the index, append survivors.
    * Idempotent per `batchId` (see class doc). `batch` needs columns
    * (doc_id, text); ids must be globally unique across batches.
    */
  def applyBatch(
      spark: SparkSession,
      indexPath: String,
      logPath: String,
      threshold: Double,
      maxBucket: Int,
      batchId: Long,
      batch: DataFrame): Unit = {
    val keepFirst = Window.partitionBy(col("sig")).orderBy(col("doc_id").asc)
    val exact = batch
      .select(col("doc_id"), col("text"), md5(col("text")).as("sig"))
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"))
    // the batch is pinned and counted ONCE here: the serve path's
    // broadcast-vs-shuffle_hash decision needs the batch row count, and
    // without passing it the plan construction re-runs a limit-bounded
    // count (re-evaluating the window dedup above) per serve call
    exact.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactRows = exact.count()
    // replay safety: read ONLY strictly-earlier batch partitions. A
    // redelivered batch may find its own partition already written
    // (crash after the index write, before the checkpoint commit) —
    // unfiltered, the batch would near-dup against its own entries at
    // jaccard 1.0 and reject everything on replay. Earlier partitions
    // are immutable, so the filtered decision replays identically.
    // (A pre-stream corpus bootstrap uses writeIndexBatch(.., -1).)
    val accepted =
      if (!exists(spark, indexPath)) exact
      else {
        val index = NearDupLsh.readIndex(spark, indexPath)
        require(index.columns.contains("batch"),
          s"index at $indexPath has no `batch` partition column — it was " +
            "written with a pre-unification flat layout. Rebuild it with " +
            "writeIndex/writeIndexBatch (both now write batch=<id> " +
            "partitions; a bootstrap lands in batch=-1), or move the old " +
            "files under a batch=-1 subdirectory.")
        // O(hot tail) when the truncated sidecar covers every served
        // batch partition; the exact full-stats aggregate otherwise —
        // same strictly-earlier cut either way, so the decision replays
        // identically (see NearDupLsh.hotBuckets)
        val hot = NearDupLsh.hotBuckets(spark, indexPath, maxBucket,
          maxBatchExclusive = Some(batchId))
        // path-based serve: candidates come from the flat sorted band
        // artifact (not an array re-explode), restricted to strictly-
        // earlier batch partitions on every relation it reads
        val dupIds = NearDupLsh
          .pairsAgainstIndexAt(spark, exact, indexPath, threshold,
            Some(hot), maxBatchExclusive = Some(batchId),
            batchRows = Some(exactRows))
          .select(col("new_id").as("doc_id")).distinct()
        exact.join(dupIds, Seq("doc_id"), "left_anti")
      }
    // one materialization for the three consumers below (signatures
    // write, stats write, membership log): the lazy plan would re-run
    // the full index join per consumer, and the decision would have to
    // stay deterministic WHILE the batch's own partition is being
    // overwritten between writes — persist pins both. Batch-sized, so
    // this is not the full-corpus-cache anti-pattern; unpersisted in
    // the same call.
    accepted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      NearDupLsh.writeIndexBatch(accepted, indexPath, batchId)
      // membership log, same idempotent partition-overwrite contract
      accepted.select(col("doc_id")).write.mode("overwrite")
        .parquet(s"$logPath/batch=$batchId")
    } finally {
      accepted.unpersist()
      exact.unpersist()
    }
  }

  /** Accepted membership after the stream: (doc_id, batch). */
  def acceptedLog(spark: SparkSession, logPath: String): DataFrame =
    spark.read.parquet(logPath).select(col("doc_id"), col("batch"))

  /** One full micro-batch tick with auto-maintenance: resolve the
    * active generation under `indexRoot`, decide/append against it,
    * then run the maintenance tick (no-op unless
    * `spark.graft.index.autoMaintain` is true AND the compaction
    * trigger is due — see IndexGenerations for the adoption protocol
    * and why accept decisions are byte-identical across the swap).
    */
  def applyBatchMaintained(
      spark: SparkSession,
      indexRoot: String,
      logPath: String,
      threshold: Double,
      maxBucket: Int,
      batchId: Long,
      batch: DataFrame): Unit = {
    val active = graft.operators.IndexGenerations.activePath(spark, indexRoot)
    applyBatch(spark, active, logPath, threshold, maxBucket, batchId, batch)
    graft.operators.IndexGenerations.maintainTick(spark, indexRoot, active,
      batchId, (src, tgt, w) =>
        NearDupLsh.maintain(spark, src, tgt, throughBatch = w))
  }

  def start(
      source: DataFrame,
      indexPath: String,
      logPath: String,
      threshold: Double,
      maxBucket: Int,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatchMaintained(batch.sparkSession, indexPath, logPath,
          threshold, maxBucket, id, batch)
      }
      .start()

  /** Drive `docs` through the stream as `k` deterministic micro-batches
    * (batch i = doc_id % k == i, fed and drained strictly in order) and
    * return the accepted membership. The MemoryStream feed is a gate
    * harness shim — it pins batch BOUNDARIES so the greedy accept
    * sequence is reproducible for the oracle; production ingest is
    * `readStream` over arriving files/Kafka with the same foreachBatch.
    */
  def runToCompletion(
      spark: SparkSession,
      docs: DataFrame,
      k: Int,
      indexPath: String,
      logPath: String,
      threshold: Double,
      maxBucket: Int,
      checkpoint: String): DataFrame = {
    import spark.implicits._
    val feed = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = start(feed.toDF().toDF("doc_id", "text"),
      indexPath, logPath, threshold, maxBucket, checkpoint)
    try {
      (0 until k).foreach { i =>
        val rows = docs.filter(pmod(col("doc_id"), lit(k)) === i)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        feed.addData(rows)
        q.processAllAvailable()
      }
    } finally q.stop()
    acceptedLog(spark, logPath)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
