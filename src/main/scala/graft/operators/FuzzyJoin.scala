package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-threshold self-join (entity resolution over names /
  * near-identical identifiers) via deletion-neighborhood blocking
  * (the FastSS scheme, Bocek et al. 2007).
  *
  * For threshold 1: if edit(a, b) <= 1 then the 1-deletion
  * neighborhoods D(a) and D(b) intersect — a substitution at position i
  * makes the two position-i deletions equal, an insert/delete makes one
  * string a member of the other's neighborhood, and equal strings share
  * themselves. The converse is NOT true (D("ab") and D("ba") intersect
  * at distance 2), so candidates rescore with exact levenshtein — the
  * result is identical to the quadratic all-pairs join.
  *
  * Scale shape: the blocking explodes each string into (len+1) variants
  * — linear data motion, an equi-join on the variant, and candidate
  * buckets bounded by real near-duplicate groups rather than n². The
  * all-pairs alternative is a cartesian product; at 1B names it cannot
  * run, while this is one shuffle of ~20n short strings.
  */
object FuzzyJoin {

  /** Variant of column `name` with the character at 1-based position `i`
    * deleted; `i = 0` is the string itself. Computed per exploded row
    * rather than as one pre-built array: exploding a computed variant
    * array lets InferFiltersFromGenerate push a size guard that builds
    * the whole array a second time at the scan, and the transform()
    * lambda runs interpreted. Repeated characters now yield duplicate
    * variants (the old array_distinct collapsed them) — duplicates only
    * add candidate rows that dropDuplicates already removes.
    */
  private def deletionVariant(name: String, idx: String) = expr(
    s"CASE WHEN $idx = 0 THEN $name " +
      s"ELSE concat(substr($name, 1, $idx - 1), substr($name, $idx + 1)) END")

  /** Pairs (id_a < id_b) of `rel` rows whose `strCol` values are within
    * levenshtein distance 1, with the exact distance.
    */
  def selfPairs(rel: DataFrame, idCol: String, strCol: String): DataFrame = {
    // the equi-join keys on the variant's 64-bit hash, not its text —
    // a fraction of the shuffle bytes; hash collisions only ADD false
    // candidates, which the exact rescore below removes anyway
    val variants = rel
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"),
        explode(sequence(lit(0), char_length(col("s")))).as("i"))
      .select(col("id"), col("s"), xxhash64(deletionVariant("s", "i")).as("v"))
    variants.as("a")
      .join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= 1)
  }
}
