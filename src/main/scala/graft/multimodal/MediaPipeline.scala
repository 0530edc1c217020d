package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** An opaque media payload with typed metadata — the shape a 100 TB
  * multimodal corpus uses: `binary` column + small typed sidecar fields,
  * never decoded strings in the storage layer.
  */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded features (what a real image/audio decode would emit). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    channels: Int,
    checksum: Long)

/** The decode seam. A production build would back this with an image
  * codec (JNI/ffi) — none is available in this container, so the decode
  * is a STUB: a deterministic function of the payload bytes with the same
  * interface and batch shape a real decoder would have.
  */
object MediaDecoder {

  /** Batched decode: one call per partition-batch, mirroring how a real
    * codec amortizes setup (model load, JNI handles) across rows — the
    * Scala analog of a pandas-UDF batch.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // STUB decoder: features derived deterministically from the bytes.
    // Real implementation: parse header, decode frame, extract dims.
    rows.map { r =>
      var h = 1125899906842597L
      var i = 0
      while (i < r.payload.length) { h = h * 31L + r.payload(i); i += 1 }
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = r.payload.length.toLong,
        width = (Math.floorMod(h, 1024L) + 1L).toInt,
        height = (Math.floorMod(h >>> 10, 1024L) + 1L).toInt,
        channels = 3,
        checksum = h)
    }
  }
}

/** One sampled frame of a (stub-decoded) video payload. */
final case class FrameSample(
    doc_id: Long,
    frame_index: Int,
    frame_ts_ms: Long,
    frame_checksum: Long)

/** Spark-side plumbing for multimodal decode: binary columns flow through
  * a typed Dataset; the decode runs via `mapPartitions` so the codec sees
  * batches, not rows; output is a flat feature frame ready to join back.
  * Partitioning is preserved (no shuffle) — decode is embarrassingly
  * parallel at any scale.
  */
object MediaPipeline {

  /** documents.text bytes stand in for the media payload (no binary
    * fixtures in TESTDATA); everything downstream treats it as opaque.
    */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDataset(spark, dir)
      .mapPartitions(MediaDecoder.decodeBatch)
      .toDF()
  }

  /** Frame sampling: each payload yields `framesPerDoc` frame rows — the
    * 1→N flatMap shape video pipelines need (a real decoder would seek
    * keyframes; the STUB derives frames deterministically from payload
    * bytes). Still partition-local: no shuffle, output fans out in place.
    */
  def sampleFrames(spark: SparkSession, dir: String, framesPerDoc: Int): DataFrame = {
    import spark.implicits._
    mediaDataset(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          var h = 1125899906842597L
          var i = 0
          while (i < r.payload.length) { h = h * 31L + r.payload(i); i += 1 }
          val durationMs = 1000L + Math.floorMod(h, 60000L) // fake duration
          (0 until framesPerDoc).iterator.map { f =>
            FrameSample(
              doc_id = r.doc_id,
              frame_index = f,
              frame_ts_ms = durationMs * f / framesPerDoc,
              frame_checksum = h * 31L + f)
          }
        }
      }
      .toDF()
  }
}
