package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixFilterJoin

/** Streaming EXACT near-duplicate dedup against the persisted
  * prefix-filter (PPJoin) index — the zero-false-negative,
  * zero-false-positive sibling of [[NearDupIndexStream]] (whose LSH serve
  * is probabilistic). Documents arrive in micro-batches forever; each
  * batch keeps only documents with no near-duplicate (word-3-gram Jaccard
  * >= num/den, EXACT) among the documents accepted in any earlier batch,
  * then appends the survivors' shingle sets/prefix postings so later
  * batches dedup against them.
  *
  * Per micro-batch:
  *   1. within-batch exact dedup (md5 keep-first) — same division of
  *      labor as the LSH stream: within-batch NEAR-dup pruning is the
  *      batch-prep job; the stream owns the cross-batch increment.
  *   2. `PrefixFilterJoin.pairsAgainstIndex` restricted to
  *      strictly-earlier batch partitions (`maxBatchExclusive`) — the
  *      replay filter: a redelivered batch may find its own partitions
  *      already written (crash between the index write and the
  *      checkpoint commit) and must not near-dup against itself.
  *   3. survivors land via `appendIndex` — sets/prefix/pstats all
  *      OVERWRITE into `batch=<id>` partitions, so redelivery REPLACES
  *      partial state. Exactly-once membership without a transaction
  *      log, exactly the LSH stream's contract.
  *
  * The index is bootstrapped on first touch with an EMPTY `writeIndex`
  * (idempotent: writeIndex is all-OVERWRITE and batch-independent),
  * freezing the rarest-first order at (f = 0 for every shingle) — a
  * legal total order (ties by hash), so prefix filtering stays lossless;
  * a standing-corpus bootstrap (`writeIndex` on real docs, batch = -1)
  * gives better candidate efficiency and is preferred in production.
  *
  * Documents with fewer than 3 tokens carry no shingles, can never clear
  * a Jaccard threshold, and are accepted without entering the index
  * (exact-dup control for those belongs to DedupStoreStream's md5 store).
  */
object PpJoinIndexStream {

  /** Dedup one micro-batch against the index, append survivors.
    * Idempotent per `batchId` (see class doc). `batch` needs columns
    * (doc_id, text); ids must be globally unique across batches.
    */
  def applyBatch(
      spark: SparkSession,
      indexPath: String,
      logPath: String,
      num: Int,
      den: Int,
      batchId: Long,
      batch: DataFrame): Unit = {
    val keepFirst = Window.partitionBy(col("sig")).orderBy(col("doc_id").asc)
    val exact = batch
      .select(col("doc_id"), col("text"), md5(col("text")).as("sig"))
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"))
    // pinned and counted ONCE: the serve's broadcast decision needs the
    // batch row count, and the serve's plan construction would otherwise
    // re-run a limit-bounded count through the window dedup above
    exact.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val exactRows = exact.count()
      if (!exists(spark, s"$indexPath/meta"))
        PrefixFilterJoin.writeIndex(
          batch.select(col("doc_id"), col("text")).limit(0),
          indexPath, num, den)
      val dupIds = PrefixFilterJoin
        .pairsAgainstIndex(spark, exact, indexPath, num, den,
          batchRows = Some(exactRows),
          maxBatchExclusive = Some(batchId))
        .select(col("new_id").as("doc_id")).distinct()
      val accepted = exact.join(dupIds, Seq("doc_id"), "left_anti")
      // one materialization for the two consumers (index append +
      // membership log): the lazy plan would re-run the serve join per
      // consumer WHILE the batch's own partitions are being overwritten.
      // Batch-sized — not the full-corpus-cache anti-pattern.
      accepted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        PrefixFilterJoin.appendIndex(accepted, indexPath, batchId)
        accepted.select(col("doc_id")).write.mode("overwrite")
          .parquet(s"$logPath/batch=$batchId")
      } finally accepted.unpersist()
    } finally exact.unpersist()
  }

  /** Accepted membership after the stream: (doc_id, batch). */
  def acceptedLog(spark: SparkSession, logPath: String): DataFrame =
    spark.read.parquet(logPath).select(col("doc_id"), col("batch"))

  /** One full micro-batch tick with auto-maintenance: resolve the
    * active generation under `indexRoot`, decide/append against it,
    * then run the maintenance tick (no-op unless
    * `spark.graft.index.autoMaintain` is true and compaction is due —
    * IndexGenerations documents the adoption protocol and why accept
    * decisions are byte-identical across the swap).
    */
  def applyBatchMaintained(
      spark: SparkSession,
      indexRoot: String,
      logPath: String,
      num: Int,
      den: Int,
      batchId: Long,
      batch: DataFrame): Unit = {
    val active = graft.operators.IndexGenerations.activePath(spark, indexRoot)
    applyBatch(spark, active, logPath, num, den, batchId, batch)
    graft.operators.IndexGenerations.maintainTick(spark, indexRoot, active,
      batchId, (src, tgt, w) =>
        PrefixFilterJoin.maintain(spark, src, tgt, throughBatch = w))
  }

  def start(
      source: DataFrame,
      indexPath: String,
      logPath: String,
      num: Int,
      den: Int,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatchMaintained(batch.sparkSession, indexPath, logPath,
          num, den, id, batch)
      }
      .start()

  /** Drive `docs` through the stream as `k` deterministic micro-batches
    * (batch i = doc_id % k == i, fed and drained strictly in order) and
    * return the accepted membership — the same gate-harness shim as
    * NearDupIndexStream.runToCompletion; production ingest is
    * `readStream` over arriving files/Kafka with the same foreachBatch.
    */
  def runToCompletion(
      spark: SparkSession,
      docs: DataFrame,
      k: Int,
      indexPath: String,
      logPath: String,
      num: Int,
      den: Int,
      checkpoint: String): DataFrame = {
    import spark.implicits._
    val feed = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = start(feed.toDF().toDF("doc_id", "text"),
      indexPath, logPath, num, den, checkpoint)
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
