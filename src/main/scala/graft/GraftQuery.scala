package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program over the TESTDATA tables in
  * `dir`, plus — when the semantics are SQL-expressible — an equivalent
  * ANSI SQL oracle that DuckDB runs over the same parquet tables.
  *
  * Oracle-parity rules used throughout (empirically verified against
  * DuckDB 1.0 semantics):
  *  - row-level double arithmetic is left unrounded (IEEE ops on identical
  *    inputs are bit-identical in both engines);
  *  - aggregates over doubles go through `CAST(x AS DECIMAL(38,6))` so the
  *    sum is order-independent, then back to DOUBLE for a canonical value;
  *  - `round` is only applied to decimals (HALF_UP in both engines) —
  *    `round(double, n)` disagrees between engines on exact-half cases;
  *  - Spark `dayofweek` is 1=Sunday; DuckDB `dayofweek` is 0=Sunday.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false,
    // true = the oracle is deliberately quadratic (exact all-pairs /
    // recursive ground truth) and intractable in DuckDB beyond sf0.01.
    // The sf0.1 sweep (Verify "@sweep") swaps these for their `_sliced`
    // companions — same program over a deterministic md5 corpus slice,
    // exactness preserved on the slice, DuckDB-tractable at sf0.1.
    quadraticOracle: Boolean = false)

object GraftQuery {
  /** All query groups, in inventory order. Names must be unique: the
    * driver contract is a name→query Map, where a duplicate would
    * silently shadow one of the two (and the shadowed query's oracle
    * would "pass" against the wrong program).
    */
  def all: Seq[GraftQuery] = {
    val qs = defsInOrder
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  private def defsInOrder: Seq[GraftQuery] =
    queries.EtlParity.defs ++
      queries.Relational.defs ++
      queries.TpchShapes.defs ++
      queries.Advanced.defs ++
      queries.Coverage.defs ++
      queries.Coverage2.defs ++
      queries.Coverage3.defs ++
      queries.Coverage4.defs ++
      queries.Coverage5.defs ++
      queries.Coverage6.defs ++
      queries.Coverage7.defs ++
      queries.Coverage8.defs ++
      queries.SourceRoundtrip.defs ++
      queries.Pipeline.defs ++
      queries.TextAnalysis.defs ++
      queries.Retrieval.defs ++
      queries.Typed.defs ++
      queries.Dedup.defs ++
      queries.Similarity.defs ++
      queries.Events.defs ++
      queries.Multimodal.defs
}
