package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bm25Index

/** Streaming ingest driver for the persisted BM25 retrieval index —
  * the maintenance half that keeps a standing full-text index current
  * as documents arrive in micro-batches forever, mirroring
  * NearDupIndexStream / PpJoinIndexStream for the dedup indexes.
  *
  * Exactly-once membership BY LAYOUT, not by transaction log: each
  * micro-batch's postings/df/stats land with OVERWRITE in the batch's
  * own `batch=<id>` partitions (Bm25Index.appendIndex), so a
  * redelivered batch — crash anywhere between the first artifact write
  * and the checkpoint commit, then retry — REPLACES partial state
  * instead of double-appending. Unlike the dedup streams, ingest makes
  * no accept/reject decision and never reads the index, so there is no
  * replay-filter subtlety on the WRITE side at all; the strictly-earlier
  * discipline lives on the READ side instead: a retrieval serve running
  * WHILE the stream ingests passes the last checkpoint-COMMITTED batch
  * id + 1 as `Bm25Index.topK(maxBatchExclusive = ...)`, which cuts all
  * three artifacts consistently and keeps a half-landed batch (postings
  * written, df/stats missing) invisible — scores equal a fresh index
  * built on exactly the committed batches. Periodic
  * `Bm25Index.compactIndex` with the same committed watermark folds the
  * accumulated per-batch partitions into one `batch=-1` set without
  * changing any serve.
  *
  * Document ids must be globally unique across the bootstrap and every
  * micro-batch (the append contract: global df/N are SUMS of per-batch
  * values, valid only for disjoint doc sets).
  */
object Bm25IndexStream {

  /** Ingest one micro-batch. Idempotent per `batchId` (see class doc). */
  def applyBatch(spark: SparkSession, indexPath: String,
      batchId: Long, batch: DataFrame): Unit =
    Bm25Index.appendIndex(
      batch.select(col("doc_id"), col("text")), indexPath, batchId)

  /** Micro-batch tick with auto-maintenance: append to the active
    * generation, then run the maintenance tick (no-op unless
    * `spark.graft.index.autoMaintain` is true and compaction is due —
    * IndexGenerations documents the adoption protocol).
    */
  def applyBatchMaintained(spark: SparkSession, indexRoot: String,
      batchId: Long, batch: DataFrame): Unit = {
    val active = graft.operators.IndexGenerations.activePath(spark, indexRoot)
    applyBatch(spark, active, batchId, batch)
    graft.operators.IndexGenerations.maintainTick(spark, indexRoot, active,
      batchId, (src, tgt, w) =>
        Bm25Index.maintain(spark, src, tgt, throughBatch = w))
  }

  def start(
      source: DataFrame,
      indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatchMaintained(batch.sparkSession, indexPath, id, batch)
      }
      .start()

  /** Drive `docs` through the stream as `k` deterministic micro-batches
    * (batch i = doc_id % k == i, fed and drained strictly in order).
    * The MemoryStream feed is a gate-harness shim pinning batch
    * boundaries for reproducibility; production ingest is `readStream`
    * over arriving files/Kafka with the same foreachBatch.
    */
  def runToCompletion(
      spark: SparkSession,
      docs: DataFrame,
      k: Int,
      indexPath: String,
      checkpoint: String): Unit = {
    import spark.implicits._
    val feed = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = start(feed.toDF().toDF("doc_id", "text"), indexPath, checkpoint)
    try {
      (0 until k).foreach { i =>
        val rows = docs.filter(pmod(col("doc_id"), lit(k)) === i)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        feed.addData(rows)
        q.processAllAvailable()
      }
    } finally q.stop()
  }
}
