package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 126-bit sum of a LONG column as a DeclarativeAggregate — the
  * unbounded-range replacement for the long-micros fast sum.
  *
  * The plain long-micros path (`sum(floor(x*1e6+0.5))`) is 2–3× cheaper
  * than a decimal sum but caps at Σ < 2^63 micros ≈ 9.2e12 in value
  * terms — a bound a 100 TB fact table genuinely exceeds. Spark's
  * decimal Sum lifts the cap but drags BigDecimal arithmetic through
  * the per-row hot loop. This aggregate keeps per-row work in pure long
  * arithmetic (one add, one shift, one subtract — all inside
  * whole-stage codegen's primitive buffer slots) by carrying the total
  * as two longs, `hi·2^62 + lo` with `lo ∈ [0, 2^62)`:
  *
  *   t  = lo + x            // |x| < 2^62, lo < 2^62 ⇒ no long overflow
  *   c  = t >> 62           // arithmetic shift = floor(t / 2^62) ∈ [-2, 1]
  *   lo' = t - (c << 62)    // back into [0, 2^62)
  *   hi' = hi + c
  *
  * Decimal arithmetic happens exactly once per GROUP, in
  * `evaluateExpression` (hi·2^62 + lo reassembled as DECIMAL(38,0)).
  * Total range ±2^125 ≈ 4e37 — fits DECIMAL(38,0).
  *
  * Contract: inputs must satisfy |x| < 2^62 (any per-row metric in
  * micros qualifies: 2^62 µ ≈ 4.6e12 in value units). Violations are
  * loud, never silent, in BOTH ANSI and default sessions: each update
  * routes through an explicit range check that raises an error on
  * |x| >= 2^62 (two long compares per row — stays in codegen), rather
  * than relying on ANSI mode to catch the downstream `lo + x`
  * overflow. NULLs contribute 0 (all-NULL groups yield 0, not NULL —
  * intended for non-null metric columns).
  */
case class Sum128(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sum128 requires a bigint argument, got ${child.dataType}")

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false
  override def prettyName: String = "sum128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = hi :: lo :: Nil
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L), Literal(0L))

  /** (hi', lo') after folding `x` into the (h, l) pair. */
  private def fold(h: Expression, l: Expression, x: Expression): Seq[Expression] = {
    val t = Add(l, x)
    val c = ShiftRight(t, Literal(62))
    Seq(Add(h, c), Subtract(t, ShiftLeft(c, Literal(62))))
  }

  /** `child` with the |x| < 2^62 contract enforced: out-of-range rows
    * raise USER_RAISED_EXCEPTION regardless of ANSI mode, instead of
    * silently wrapping the long add in a non-ANSI session.
    */
  private lazy val rangeCheckedChild: Expression = {
    val lim = 1L << 62
    val outOfRange = Or(
      GreaterThanOrEqual(child, Literal(lim)),
      LessThanOrEqual(child, Literal(-lim)))
    val raise = Cast(
      RaiseError(Literal(
        s"sum128 input out of range: |x| must be < 2^62 (= $lim)")),
      LongType)
    If(outOfRange, raise, child)
  }

  override lazy val updateExpressions: Seq[Expression] =
    fold(hi, lo, If(IsNull(child), Literal(0L), rangeCheckedChild))

  override lazy val mergeExpressions: Seq[Expression] =
    fold(Add(hi.left, hi.right), lo.left, lo.right)

  override lazy val evaluateExpression: Expression = {
    val dec = DecimalType(38, 0)
    val twoTo62 = Literal.create(Decimal(BigDecimal(2).pow(62)), dec)
    Add(Multiply(Cast(hi, dec), twoTo62), Cast(lo, dec))
  }

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}
