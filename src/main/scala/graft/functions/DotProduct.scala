package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two array<double> columns in one fused loop, inside
  * whole-stage codegen. The builtin composition
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` materializes the zipped
  * array and folds it through two higher-order lambdas per row-pair; on
  * the similarity-search hot path (every query × every candidate) the
  * fused loop removes both the per-pair allocation and the lambda
  * dispatch. Also the building block for cosine: dot(a,b) /
  * (sqrt(dot(a,a)) * sqrt(dot(b,b))).
  *
  * Arrays of different lengths are scored over the common prefix
  * (length mismatch is a data bug; the engine's embedding fixtures are
  * fixed-width).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dist2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Squared L2 distance of two array<double> columns — same fused-loop
  * rationale as [[DotProduct]]; the k-means assign hot path evaluates it
  * corpus-size × nlist times per Lloyd iteration. Fold order matches the
  * `aggregate(zip_with(...))` composition bit-for-bit.
  */
case class L2Distance2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l2_dist2 requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dist2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_dist2"
}
