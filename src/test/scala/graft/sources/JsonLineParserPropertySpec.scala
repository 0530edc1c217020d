package graft.sources

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The catalog read path must invert the sink's renderRow exactly for
  * every value the format supports — property-tested rather than
  * example-tested because escaping bugs live in the corners.
  */
class JsonLineParserPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val schema = StructType(Seq(
    StructField("s", StringType),
    StructField("l", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("b", BooleanType)))

  private val nastyChars = Gen.oneOf(
    '"', '\\', '\n', '\r', '\t', 1.toChar, 31.toChar,
    'a', 'Z', '0', ' ', 'ü', 'é', '中')
  private val strGen: Gen[String] =
    Gen.oneOf(Gen.listOf(nastyChars).map(_.mkString), Gen.alphaNumStr)
  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12),
    Gen.oneOf(0.0, -0.0, 1e-300, Double.MaxValue, Double.MinPositiveValue,
      Double.PositiveInfinity, Double.NegativeInfinity))

  test("parse inverts renderRow for every supported value") {
    check(Prop.forAll(strGen, Gen.long,
      Gen.chooseNum(Int.MinValue, Int.MaxValue), doubleGen,
      Gen.oneOf(true, false), Gen.chooseNum(0, 31)) {
      (s: String, l: Long, i: Int, d: Double, b: Boolean, nullMask: Int) =>
        val vals: Array[Any] = Array(
          if ((nullMask & 1) != 0) null else UTF8String.fromString(s),
          if ((nullMask & 2) != 0) null else java.lang.Long.valueOf(l),
          if ((nullMask & 4) != 0) null else java.lang.Integer.valueOf(i),
          if ((nullMask & 8) != 0) null else java.lang.Double.valueOf(d),
          if ((nullMask & 16) != 0) null else java.lang.Boolean.valueOf(b))
        val line = GraftJsonSink.renderRow(new GenericInternalRow(vals), schema)
        val back = JsonLineParser.parse(line, schema, schema)
        (back.isNullAt(0) == (vals(0) == null)) &&
          (vals(0) == null ||
            back.getUTF8String(0).toString == vals(0).asInstanceOf[UTF8String].toString) &&
          (vals(1) == null || back.getLong(1) == l) &&
          (vals(2) == null || back.getInt(2) == i) &&
          (vals(3) == null || java.lang.Double.compare(back.getDouble(3), d) == 0) &&
          (vals(4) == null || back.getBoolean(4) == b)
    })
  }

  test("column pruning during parse keeps only requested fields") {
    val vals: Array[Any] = Array(
      UTF8String.fromString("x,\"y\":1"), 7L, java.lang.Integer.valueOf(3),
      java.lang.Double.valueOf(2.5), java.lang.Boolean.TRUE)
    val line = GraftJsonSink.renderRow(new GenericInternalRow(vals), schema)
    val pruned = StructType(Seq(schema("d"), schema("s")))
    val back = JsonLineParser.parse(line, schema, pruned)
    assert(back.numFields == 2)
    assert(back.getDouble(0) == 2.5)
    assert(back.getUTF8String(1).toString == "x,\"y\":1")
  }
}
