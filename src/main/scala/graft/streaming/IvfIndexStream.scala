package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

/** Streaming ingest driver for the persisted IVF ANN index — the
  * maintenance half that keeps a standing vector index current as
  * embeddings arrive in micro-batches, completing the lifecycle
  * quartet (NearDupIndexStream / PpJoinIndexStream / Bm25IndexStream).
  *
  * Exactly-once membership BY LAYOUT: each micro-batch assigns its
  * vectors under the FROZEN build-time quantizer and lands them with
  * OVERWRITE in the batch's own `corpus/batch=<id>` cell-partitioned
  * dirs (IvfIndex.appendIndex), so a redelivered batch — crash between
  * the write and the checkpoint commit, then retry — replaces partial
  * state instead of double-appending. Ingest never reads the corpus
  * side of the index (only the tiny centroid table), so there is no
  * write-side replay subtlety; a search running WHILE the stream
  * ingests passes the last checkpoint-COMMITTED batch id + 1 as
  * `IvfIndex.topK(maxBatchExclusive = ...)` to keep a half-landed
  * batch invisible, and periodic `IvfIndex.compactIndex` with the same
  * watermark folds the accumulated batch partitions without changing
  * any serve (the quantizer copies verbatim — compaction never
  * retrains).
  *
  * Vector ids must be globally unique across the bootstrap and every
  * micro-batch (the append contract shared by all four indexes).
  */
object IvfIndexStream {

  /** Ingest one micro-batch. Idempotent per `batchId` (see class doc). */
  def applyBatch(spark: SparkSession, indexPath: String,
      batchId: Long, batch: DataFrame): Unit =
    IvfIndex.appendIndex(
      batch.select(col("vec_id"), col("v"), col("norm2")), indexPath, batchId)

  /** Micro-batch tick with auto-maintenance: append to the active
    * generation, then run the maintenance tick (no-op unless
    * `spark.graft.index.autoMaintain` is true and compaction is due —
    * IndexGenerations documents the adoption protocol). Note the tick
    * only ever COMPACTS; a standing drift alarm survives it by
    * IvfIndex.compactIndex's carry contract, so auto-maintenance can
    * never silently re-baseline a drifted quantizer.
    */
  def applyBatchMaintained(spark: SparkSession, indexRoot: String,
      batchId: Long, batch: DataFrame): Unit = {
    val active = graft.operators.IndexGenerations.activePath(spark, indexRoot)
    applyBatch(spark, active, batchId, batch)
    graft.operators.IndexGenerations.maintainTick(spark, indexRoot, active,
      batchId, (src, tgt, w) =>
        IvfIndex.maintain(spark, src, tgt, throughBatch = w))
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

  /** Drive `vectors` through the stream as `k` deterministic
    * micro-batches (batch i = vec_id % k == i, fed and drained strictly
    * in order). MemoryStream is the gate-harness shim pinning batch
    * boundaries; production ingest is `readStream` with the same
    * foreachBatch.
    */
  def runToCompletion(
      spark: SparkSession,
      vectors: DataFrame,
      k: Int,
      indexPath: String,
      checkpoint: String): Unit = {
    import spark.implicits._
    val feed = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double], Double)](spark)
    val q = start(feed.toDF().toDF("vec_id", "v", "norm2"),
      indexPath, checkpoint)
    try {
      (0 until k).foreach { i =>
        val rows = vectors.filter(pmod(col("vec_id"), lit(k)) === i)
          .select(col("vec_id"), col("v"), col("norm2"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
          .toSeq
        feed.addData(rows)
        q.processAllAvailable()
      }
    } finally q.stop()
  }
}
