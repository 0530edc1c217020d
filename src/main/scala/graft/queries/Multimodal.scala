package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.multimodal.MediaPipeline

/** Multimodal-column operators. TESTDATA has no image/audio fixtures, so
  * the binary payloads are synthesized from document text bytes — the
  * Spark-side plumbing (binary columns + typed metadata, batched
  * partition-level decode, schema contracts) is real and tested; only the
  * codec itself is a stub (see graft.multimodal.MediaDecoder).
  */
object Multimodal {

  def defs: Seq[GraftQuery] = Seq(

    // Binary-column metadata: payload as opaque bytes + byte length.
    // (octet_length over the utf-8 payload is SQL-expressible — the
    // plumbing from string→binary→length survives an oracle check.)
    GraftQuery(
      "mm_binary_meta",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            octet_length(col("text").cast("binary")).cast("long").as("n_bytes")),
      Some("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes " +
        "FROM documents")),

    // Full decode pipeline through the typed Dataset + mapPartitions
    // batch interface (deterministic stub codec). Rows-only check;
    // semantics asserted in MultimodalSpec.
    GraftQuery(
      "mm_decode_features",
      (s, dir) => MediaPipeline.decodeFeatures(s, dir)),

    // Frame sampling: 1→N fan-out per payload, partition-local
    // (rows-only; shape + determinism asserted in MultimodalSpec).
    GraftQuery(
      "mm_frame_sample",
      (s, dir) => MediaPipeline.sampleFrames(s, dir, framesPerDoc = 4)))
}
