package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k=32 MinHash signature over an array of tokens (Broder 1997, "On the
  * resemblance and containment of documents"): sig(i) = min over tokens of
  * permutation_i(hash64(token)), permutations a_i*x+b_i with odd a_i
  * (bijective mod 2^64 — Java arithmetic wraps, which is exactly the
  * point; composing this from builtins trips ANSI overflow checks).
  *
  * One native expression evaluates all 32 lanes in a single pass over the
  * token array inside whole-stage codegen.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> or array<bigint>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def prehashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any =
    if (prehashed) MinHashSig.signatureOfHashes(input.asInstanceOf[ArrayData])
    else MinHashSig.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (prehashed) "signatureOfHashes" else "signature"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.$method($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  val K = 32

  private def mix64(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  /** Odd multipliers (bijective mod 2^64) + offsets, fixed stream. */
  val hashA: Array[Long] = Array.tabulate(K)(i => mix64(2L * i) | 1L)
  val hashB: Array[Long] = Array.tabulate(K)(i => mix64(2L * i + 1))

  /** Base 64-bit token hash (FNV-1a + splitmix finalizer — same family
    * as SimHash but a distinct seed stream).
    */
  def tokenHash(bytes: Array[Byte]): Long = {
    var h = -3750763034362895579L // FNV-1a 64 offset basis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 1099511628211L
      i += 1
    }
    mix64(h)
  }

  def signature(tokens: ArrayData): ArrayData = {
    val sig = Array.fill(K)(Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val base = tokenHash(tokens.getUTF8String(t).getBytes)
        var i = 0
        while (i < K) {
          val v = hashA(i) * base + hashB(i) // wraps mod 2^64 by design
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Signature over already-hashed elements (e.g. [[NGramHashes]]). */
  def signatureOfHashes(hashes: ArrayData): ArrayData = {
    val sig = Array.fill(K)(Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      val base = hashes.getLong(t)
      var i = 0
      while (i < K) {
        val v = hashA(i) * base + hashB(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Public alias of the finalizer for sibling expressions. */
  def mix64Public(z: Long): Long = mix64(z)
}
