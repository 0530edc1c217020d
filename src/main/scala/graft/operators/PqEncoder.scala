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

  /** ‖codebook(c)'s sp-th subvector‖² folded on the driver with the
    * DotProduct loop's exact multiply/add order, so the literal is
    * bit-identical to dot(cs, cs) (the normLut rule).
    */
  private def selfDot(codebook: IndexedSeq[Seq[Double]], c: Int,
      sp: Int, dim: Int): Double =
    codebook(c).slice(sp * dim, (sp + 1) * dim)
      .foldLeft(0.0d)((acc, x) => acc + x * x)

  /** Per-subspace nearest-codebook-entry codes: array<int>, 1-based. */
  def codes(v: Column, codebook: IndexedSeq[Seq[Double]], sub: Int, dim: Int): Column = {
    val nCodes = codebook.size
    array((0 until sub).map { sp =>
      val xs = slice(v, sp * dim + 1, dim)
      val dists = array((0 until nCodes).map { c =>
        val cs = typedlit(codebook(c).slice(sp * dim, (sp + 1) * dim))
        // cs·cs is a driver-side constant (selfDot, bit-identical to
        // the folded dot_product): pre-folding it keeps sub·|codebook|
        // dot_product subtrees out of every analysis/optimization pass
        // — the optimizer would constant-fold them anyway, but this
        // query is rebuilt per run and the planning cost is real
        dot(xs, xs) - lit(2.0d) * dot(xs, cs) + lit(selfDot(codebook, c, sp, dim))
      }: _*)
      array_position(dists, array_min(dists)).cast("int")
    }: _*)
  }

  /** Per-vector total squared quantization error: Σ over subspaces of
    * the squared-L2 distance to the NEAREST codebook entry — the
    * objective Lloyd training minimizes. Same expanded-dot distance and
    * fold order as [[codes]], so the error is exactly the one the
    * chosen codes realize.
    */
  def distortion(v: Column, codebook: IndexedSeq[Seq[Double]],
      sub: Int, dim: Int): Column =
    (0 until sub).map { sp =>
      val xs = slice(v, sp * dim + 1, dim)
      array_min(array(codebook.indices.map { c =>
        val cs = typedlit(codebook(c).slice(sp * dim, (sp + 1) * dim))
        // pre-folded cs·cs — see codes()
        dot(xs, xs) - lit(2.0d) * dot(xs, cs) + lit(selfDot(codebook, c, sp, dim))
      }: _*))
    }.reduce(_ + _)

  /** Codebook lookup + concat: the reconstruction. ADC serve paths
    * should score via [[adcLut]]/[[adcSum]] instead — reconstructing per
    * row defeats the point of the codes.
    */
  def reconstruct(codes: Column, codebook: IndexedSeq[Seq[Double]],
      sub: Int, dim: Int): Column = {
    val nCodes = codebook.size
    concat((0 until sub).map { sp =>
      element_at(
        typedlit((0 until nCodes).map(c => codebook(c).slice(sp * dim, (sp + 1) * dim))),
        element_at(codes, sp + 1))
    }: _*)
  }

  /** Per-query ADC lookup table (true asymmetric-distance scoring — the
    * point of PQ at serve time): a flattened sub×|codebook| array whose
    * 1-based entry sp·|codebook| + c is the dim-dot of the query's sp-th
    * subvector with codebook entry c's. Then
    * dot(query, reconstruct(codes)) = Σ_sp lut[sp·|codebook| + codes_sp]
    * — `sub` table lookups per scored vector instead of a full-width
    * dot product. Computed once per query row (sub·|codebook| fused
    * dim-dots); in a scoring join the table rides the (tiny, broadcast)
    * query side.
    */
  def adcLut(q: Column, codebook: IndexedSeq[Seq[Double]],
      sub: Int, dim: Int): Column =
    array((for (sp <- 0 until sub; c <- codebook.indices) yield
      dot(slice(q, sp * dim + 1, dim),
        typedlit(codebook(c).slice(sp * dim, (sp + 1) * dim)))): _*)

  /** Query-independent self-norm table: entry sp·|codebook| + c is
    * ‖codebook entry c's sp-th subvector‖², so a reconstruction's
    * squared norm is Σ_sp normLut[sp·|codebook| + codes_sp] (subspaces
    * are disjoint segments). Sequential driver-side arithmetic — the
    * same multiply/add order as the DotProduct loop, so values are
    * bit-identical to dotting the reconstruction slices.
    */
  def normLut(codebook: IndexedSeq[Seq[Double]], sub: Int, dim: Int): IndexedSeq[Double] =
    (for (sp <- 0 until sub; c <- codebook.indices) yield
      codebook(c).slice(sp * dim, (sp + 1) * dim)
        .foldLeft(0.0d)((acc, x) => acc + x * x)).toIndexedSeq

  /** Σ over subspaces of LUT lookups for a 1-based codes column. The
    * reduce builds a left-to-right addition chain, so an oracle that
    * adds its per-subspace dots left-to-right replays the identical
    * IEEE sum.
    */
  def adcSum(codes: Column, lut: Column, sub: Int, nCodes: Int): Column =
    (0 until sub).map { sp =>
      element_at(lut, lit(sp * nCodes) + element_at(codes, sp + 1))
    }.reduce(_ + _)
}
