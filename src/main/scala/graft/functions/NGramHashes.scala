package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Sorted distinct 64-bit hashes of the word-3-grams of a token array,
  * computed WITHOUT materializing shingle strings: each token hashes
  * once, each window combines three token hashes — at corpus scale the
  * concatenated-shingle strings the naive formulation allocates are pure
  * garbage-collector load (they exist only to be hashed).
  *
  * Output feeds [[SortedSetJaccard]] directly (sorted distinct) and
  * [[MinHashSig]] (which accepts pre-hashed arrays).
  */
case class NGramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NGramHashes.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramHashes.hashes($c);")

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)

  override def prettyName: String = "ngram_hashes"
}

object NGramHashes {

  val N = 3

  def hashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < N) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // hash each token once
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (tokens.isNullAt(i)) 0L
        else MinHashSig.tokenHash(tokens.getUTF8String(i).getBytes)
      i += 1
    }
    // combine windows of N with an order-sensitive mix
    val out = new Array[Long](n - N + 1)
    i = 0
    while (i <= n - N) {
      var h = -3750763034362895579L
      var j = 0
      while (j < N) {
        h = (h ^ th(i + j)) * 1099511628211L
        j += 1
      }
      out(i) = MinHashSig.mix64Public(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    // distinct in place on the sorted array
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }
}
