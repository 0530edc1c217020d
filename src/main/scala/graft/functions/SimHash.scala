package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over an array of tokens (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms"): each token hashes to
  * 64 bits; every bit position accumulates +1/−1 by that bit; the sign
  * vector is the fingerprint. Near-duplicate docs land within a small
  * Hamming distance.
  *
  * Native Catalyst expression with `doGenCode` — one pass over the token
  * array per row inside whole-stage codegen, vs 64 higher-order
  * `aggregate` calls if composed from builtins.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got $other")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash {

  /** 64-bit token hash (same recurrence as RollingHash, distinct seed). */
  private def tokenHash(bytes: Array[Byte]): Long = {
    var h = -7046029254386353131L // 0x9E3779B97F4A7C15 golden-ratio seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 1099511628211L // FNV-1a style mix, 64-bit
      i += 1
    }
    // finalizer (splitmix64) so low bits are well distributed
    h ^= h >>> 30; h *= -4658895280553007687L
    h ^= h >>> 27; h *= -7723592293110705685L
    h ^ (h >>> 31)
  }

  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
