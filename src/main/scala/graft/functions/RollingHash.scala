package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes:
  * `h = h * 31 + byte` over the whole value (a Rabin-Karp-style document
  * fingerprint; the same recurrence underlies the shingle hashes in
  * `graft.queries.Dedup`).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * stays inside whole-stage codegen — no UDF serialization, no codegen
  * fence in the hot path. This is the pattern for engine extensions that
  * `org.apache.spark.sql.functions` can't express.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {

  /** Shared by interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = h * 31L + bytes(i)
      i += 1
    }
    h
  }
}
