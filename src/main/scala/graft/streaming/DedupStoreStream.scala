package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftMerge

/** Streaming corpus dedup against a PERSISTED store — the incremental
  * shape of a production training-data pipeline: documents arrive in
  * micro-batches forever, and each batch must keep only documents whose
  * content hash has never been seen in ANY earlier batch.
  *
  * Per micro-batch: hash the text (md5), keep the min-doc_id row per
  * hash WITHIN the batch, then MERGE the batch's rows into the store
  * table keyed on the hash — novel hashes insert, already-stored hashes
  * are pre-filtered by an anti-join so the first-seen row is never
  * replaced. The merge commits with a (stream, batchId) txn marker
  * inside the manifest, so a crash between the store commit and the
  * checkpoint commit re-delivers the batch and the marker skips it:
  * exactly-once membership, no double inserts, across restarts.
  *
  * At 100 TB the store is the big table; the per-batch work is an
  * anti-join of a small batch against it — partition the store by a
  * hash prefix so the copy-on-write merge rewrites only touched
  * partitions, and put a bloom filter of store hashes in front of the
  * anti-join (BloomAntiJoin) so most batch rows never probe it.
  */
object DedupStoreStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Merge one batch of documents into the dedup store exactly once. */
  def applyBatch(
      spark: SparkSession,
      storeFqn: String,
      appId: String,
      batchId: Long,
      batch: DataFrame): Unit = {
    val keepFirst = Window.partitionBy(col("sig")).orderBy(col("doc_id").asc)
    val hashed = batch
      .select(col("doc_id"), md5(col("text")).as("sig"), col("text"))
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1).drop("rn")
    // pre-filter to NOVEL hashes: MERGE would replace a stored row on a
    // matching key, but dedup semantics keep the FIRST-seen row forever
    val novel = hashed.join(
      spark.table(storeFqn).select(col("sig")), Seq("sig"), "left_anti")
      .withColumn("op", lit("I"))
    GraftMerge.into(spark, storeFqn, novel, keyCols = Seq("sig"),
      txn = Some(appId -> batchId))
  }

  /** Drive the document stream in `dir` to completion into `storeFqn`
    * (created if absent: sig key, first doc_id, text).
    */
  def runToCompletion(
      spark: SparkSession,
      dir: String,
      storeFqn: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None,
      glob: String = "documents.parquet"): Unit = {
    val appId = CdcMergeStream.appIdFor(checkpoint)
    val reader = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", glob)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(dir)
    val q = stream.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, storeFqn, appId, id, batch)
      }
      .start()
    q.awaitTermination()
  }
}
