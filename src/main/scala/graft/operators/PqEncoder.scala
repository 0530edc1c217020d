package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product-quantization encode/reconstruct as pure column expressions.
  *
  * A d-dim vector splits into `sub` subspaces of `dim`; each subvector
  * is replaced by the index of its nearest codebook entry (squared-L2,
  * expanded as x·x − 2·x·c + c·c so both engines of the oracle replay
  * the identical IEEE sequence; ties break to the FIRST minimum —
  * `array_position` semantics). Codes are 1-based so they line up with
  * SQL `list_indexof` in the DuckDB replay.
  *
  * Everything is per-row expression work inside whole-stage codegen —
  * sub·|codebook| fused dot products of `dim` doubles, no shuffle, no
  * UDF. At 100 TB this is the compression pass that turns a 256 GB/1B
  * float32 corpus into ~a few GB of codes: encode once at ingest, scan
  * codes at serve time, reconstruct only for scoring.
  *
  * The codebook here is caller-provided (the gate query uses a
  * deterministic slice of the corpus so DuckDB can replay it; production
  * trains per-subspace k-means — the expressions are unchanged).
  */
object PqEncoder {

  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  /** Per-subspace nearest-codebook-entry codes: array<int>, 1-based. */
  def codes(v: Column, codebook: IndexedSeq[Seq[Double]], sub: Int, dim: Int): Column = {
    val nCodes = codebook.size
    array((0 until sub).map { sp =>
      val xs = slice(v, sp * dim + 1, dim)
      val dists = array((0 until nCodes).map { c =>
        val cs = typedlit(codebook(c).slice(sp * dim, (sp + 1) * dim))
        dot(xs, xs) - lit(2.0d) * dot(xs, cs) + dot(cs, cs)
      }: _*)
      array_position(dists, array_min(dists)).cast("int")
    }: _*)
  }

  /** Codebook lookup + concat: the reconstruction ADC scores against. */
  def reconstruct(codes: Column, codebook: IndexedSeq[Seq[Double]],
      sub: Int, dim: Int): Column = {
    val nCodes = codebook.size
    concat((0 until sub).map { sp =>
      element_at(
        typedlit((0 until nCodes).map(c => codebook(c).slice(sp * dim, (sp + 1) * dim))),
        element_at(codes, sp + 1))
    }: _*)
  }
}
