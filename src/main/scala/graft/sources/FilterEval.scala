package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level evaluator for pushed-down [[Filter]] trees under SQL
  * three-valued logic — the delete path's row test (a row is removed only
  * when the predicate is definitely TRUE; UNKNOWN keeps it, exactly like
  * `DELETE FROM t WHERE p`). Evaluation uses the same value coercion and
  * byte-wise string ordering as the stats layer, so the row decision and
  * the file-skip decision can never disagree.
  */
object FilterEval {

  /** Is every node of `f` something [[eval]] can decide for this schema? */
  def evaluable(f: Filter, schema: StructType): Boolean = {
    def colOk(name: String) = schema.fieldNames.contains(name)
    f match {
      case EqualTo(a, _) => colOk(a)
      case EqualNullSafe(a, _) => colOk(a)
      case GreaterThan(a, _) => colOk(a)
      case GreaterThanOrEqual(a, _) => colOk(a)
      case LessThan(a, _) => colOk(a)
      case LessThanOrEqual(a, _) => colOk(a)
      case In(a, _) => colOk(a)
      case IsNull(a) => colOk(a)
      case IsNotNull(a) => colOk(a)
      case StringStartsWith(a, _) => colOk(a)
      case StringEndsWith(a, _) => colOk(a)
      case StringContains(a, _) => colOk(a)
      case And(l, r) => evaluable(l, schema) && evaluable(r, schema)
      case Or(l, r) => evaluable(l, schema) && evaluable(r, schema)
      case Not(c) => evaluable(c, schema)
      case AlwaysTrue() => true
      case AlwaysFalse() => true
      case _ => false
    }
  }

  /** Three-valued evaluation: TRUE / FALSE / null (UNKNOWN). */
  def eval(f: Filter, row: InternalRow, schema: StructType): java.lang.Boolean = {
    def ord(name: String): Int = schema.fieldIndex(name)
    def value(name: String): Any = {
      val i = ord(name)
      if (row.isNullAt(i)) null
      else schema(i).dataType match {
        case StringType => row.getUTF8String(i)
        case LongType => row.getLong(i)
        case IntegerType => row.getInt(i)
        case DoubleType => row.getDouble(i)
        case BooleanType => row.getBoolean(i)
        case dt => throw new IllegalArgumentException(s"unsupported type $dt")
      }
    }
    def cmp(name: String, lit: Any)(p: Int => Boolean): java.lang.Boolean = {
      val v = value(name)
      if (v == null || lit == null) return null
      GraftStats.typedLiteral(schema, name, lit) match {
        case Some(t) => java.lang.Boolean.valueOf(p(GraftStats.compare(v, t)))
        case None => null
      }
    }
    def strTest(name: String, s: String)(p: (String, String) => Boolean): java.lang.Boolean = {
      val v = value(name)
      if (v == null || s == null) null
      else java.lang.Boolean.valueOf(p(v.asInstanceOf[UTF8String].toString, s))
    }

    f match {
      case EqualTo(a, v) => cmp(a, v)(_ == 0)
      case EqualNullSafe(a, v) =>
        val rv = value(a)
        if (rv == null && v == null) java.lang.Boolean.TRUE
        else if (rv == null || v == null) java.lang.Boolean.FALSE
        else cmp(a, v)(_ == 0)
      case GreaterThan(a, v) => cmp(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v)(_ >= 0)
      case LessThan(a, v) => cmp(a, v)(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v)(_ <= 0)
      case In(a, vs) =>
        val rv = value(a)
        if (rv == null) return null
        if (vs == null || vs.isEmpty) return java.lang.Boolean.FALSE
        var sawNull = false
        val hit = vs.exists { v =>
          if (v == null) { sawNull = true; false }
          else GraftStats.typedLiteral(schema, a, v)
            .exists(t => GraftStats.compare(rv, t) == 0)
        }
        if (hit) java.lang.Boolean.TRUE
        else if (sawNull) null // x IN (…, NULL) is UNKNOWN when unmatched
        else java.lang.Boolean.FALSE
      case IsNull(a) => java.lang.Boolean.valueOf(value(a) == null)
      case IsNotNull(a) => java.lang.Boolean.valueOf(value(a) != null)
      case StringStartsWith(a, p) => strTest(a, p)(_.startsWith(_))
      case StringEndsWith(a, p) => strTest(a, p)(_.endsWith(_))
      case StringContains(a, p) => strTest(a, p)(_.contains(_))
      case And(l, r) =>
        val a = eval(l, row, schema); val b = eval(r, row, schema)
        if (a == java.lang.Boolean.FALSE || b == java.lang.Boolean.FALSE)
          java.lang.Boolean.FALSE
        else if (a == null || b == null) null
        else java.lang.Boolean.TRUE
      case Or(l, r) =>
        val a = eval(l, row, schema); val b = eval(r, row, schema)
        if (a == java.lang.Boolean.TRUE || b == java.lang.Boolean.TRUE)
          java.lang.Boolean.TRUE
        else if (a == null || b == null) null
        else java.lang.Boolean.FALSE
      case Not(c) =>
        val a = eval(c, row, schema)
        if (a == null) null else java.lang.Boolean.valueOf(!a.booleanValue())
      case AlwaysTrue() => java.lang.Boolean.TRUE
      case AlwaysFalse() => java.lang.Boolean.FALSE
      case other => throw new IllegalArgumentException(
        s"unevaluable filter $other (canDeleteWhere should have rejected it)")
    }
  }
}
