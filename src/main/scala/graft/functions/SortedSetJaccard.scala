package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact Jaccard similarity of two ascending-sorted distinct int64 arrays
  * via a single merge walk — O(n+m), zero allocation, inside whole-stage
  * codegen. The builtin `array_intersect`/`array_union` pair builds two
  * hash sets per row-pair; on the near-dup rescoring hot path (millions of
  * candidate pairs) the merge walk is ~an order of magnitude cheaper.
  *
  * Inputs MUST be sorted+distinct (produce with
  * `array_sort(array_distinct(...))` once per document, amortized over
  * all pairs that document participates in).
  */
case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_set_jaccard requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedSetJaccard.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedSetJaccard.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_set_jaccard"
}

object SortedSetJaccard {

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}
