package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.GraftMerge

/** Streaming MERGE: a CDC feed applied to a graft catalog table one
  * micro-batch at a time through foreachBatch — the standard pattern for
  * sinks whose write protocol is transactional but not natively
  * streaming. Each micro-batch becomes ONE atomic copy-on-write snapshot
  * commit (GraftMerge's manifest rename), so readers always see a batch
  * boundary, never a half-applied batch, and every pre-batch state stays
  * queryable via VERSION AS OF.
  *
  * Exactly-once comes from the pairing of the checkpoint with the
  * sink's atomicity: a batch that fails mid-merge never swapped its
  * manifest, so the retry re-merges the SAME input onto the SAME base
  * snapshot — the merge is idempotent per (batch, base) pair. A feed
  * with several changes to one key within one micro-batch must be
  * collapsed (last change per key) upstream, exactly as for batch MERGE.
  */
object CdcMergeStream {

  /** Start applying `changes` (a streaming DataFrame carrying `keyCols`,
    * the table's columns, and `opCol` with U/I/D) to `tableFqn`.
    */
  def start(
      tableFqn: String,
      changes: DataFrame,
      keyCols: Seq[String],
      checkpoint: String,
      opCol: String = "op"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          GraftMerge.into(batch.sparkSession, tableFqn, batch, keyCols, opCol)
          ()
        }
      }
      .start()
}
