package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available in any session via configuration —
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — the deployment path for a cluster where user code can't call
  * [[GraftFunctions.register]] per session (e.g. Thrift server, SQL-only
  * notebooks). Same builders as the per-session registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "4.1.2", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL surface for table maintenance (OPTIMIZE ... ZORDER BY /
    // COMPACT SMALL FILES, VACUUM ... RETAIN): non-matching statements
    // delegate verbatim to the stock parser
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // fold inferred size(array(...)) generate-guards instead of
    // re-running the array construction at the scan
    ext.injectOptimizerRule(_ => graft.plans.FoldKnownArraySizeGuards)
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash"),
      (exprs: Seq[Expression]) => SimHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>) - k=32 MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_set_jaccard"),
      info("sorted_set_jaccard",
        "sorted_set_jaccard(array<bigint>, array<bigint>) - exact Jaccard of sorted sets"),
      (exprs: Seq[Expression]) => SortedSetJaccard(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes",
        "ngram_hashes(array<string>) - sorted distinct 3-gram hashes"),
      (exprs: Seq[Expression]) => NGramHashes(exprs.head)))
  }
}
