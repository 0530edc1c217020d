package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting.
  *
  * A shuffle join on a power-law key sends every row of the hot key to one
  * reducer. Salting spreads them: each left row gets a deterministic salt
  * in [0, buckets) derived from the whole row (so rows of the SAME hot key
  * scatter uniformly), the right side is replicated once per salt value,
  * and the join key becomes (key, salt). Row-for-row identical to the
  * plain join — every left row still meets exactly one copy of each
  * matching right row — at the cost of `buckets`× the (small) right side.
  *
  * AQE's skew-join split handles many of these cases at runtime; explicit
  * salting is the deterministic tool when the skew is known in advance
  * (null-heavy foreign keys, power-law user ids) or when AQE's split is
  * suppressed by a downstream distribution requirement.
  */
object SaltedJoin {

  /** Join `left` (large, possibly skewed) with `right` (small enough to
    * replicate `buckets` times) on equal-named `keys`.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves inner/left joins only: $joinType")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
