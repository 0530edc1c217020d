package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's assumptions about the driver-generated testdata
  * against the actual parquet footers, so a silent fixture regeneration
  * (the r7 incident: events.ts flipped from INT64 nanos to
  * timestamp[us]) fails HERE, in one obvious place, instead of as a
  * scatter of broken queries.
  *
  * The events `ts` column is allowed either vintage — bigint nanos or a
  * timestamp — because [[Tables.events]] adapts to both; anything else
  * is the loud failure this spec exists for.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events: ts is a supported vintage and the rest is stable") {
    val f = fields("events")
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)
      .contains(f("ts")), s"events.ts unexpected type ${f("ts")}")
    assert(f("event_id") == LongType)
    assert(f("user_id") == LongType)
    assert(f("event_type") == StringType)
    assert(f("value") == DoubleType)
    assert(f("props") == StringType)
  }

  test("normalized events shape is vintage-independent") {
    val ev = Tables.events(spark, dir)
    val f = ev.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(f("ts_ns") == LongType)
    assert(f("ts") == TimestampType)
    // spot-check the value relationship: ts == micros(ts_ns div 1000)
    val bad = ev.filter(
      org.apache.spark.sql.functions.expr("unix_micros(ts) != ts_ns div 1000"))
    assert(bad.count() == 0L)
  }

  test("documents / embeddings columns the engine depends on") {
    val d = fields("documents")
    assert(d("doc_id") == LongType)
    assert(d("text") == StringType)
    assert(d("lang") == StringType)
    assert(d("source") == StringType)
    val e = fields("embeddings")
    assert(e("vec_id") == LongType)
    assert(e("label") == IntegerType)
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding unexpected type ${e("embedding")}")
  }

  test("tpch tables: key/measure columns the queries touch") {
    val l = fields("lineitem")
    assert(l("l_orderkey") == LongType)
    assert(l("l_linenumber") == IntegerType)
    assert(l("l_quantity") == DoubleType)
    assert(l("l_extendedprice") == DoubleType)
    assert(l("l_shipdate") == TimestampNTZType)
    val o = fields("orders")
    assert(o("o_orderkey") == LongType)
    assert(o("o_totalprice") == DoubleType)
    assert(o("o_orderdate") == TimestampNTZType)
    val c = fields("customer")
    assert(c("c_custkey") == LongType)
    assert(c("c_nationkey") == IntegerType)
    assert(c("c_mktsegment") == StringType)
    val p = fields("part")
    assert(p("p_partkey") == LongType)
    assert(p("p_size") == IntegerType)
    val s = fields("supplier")
    assert(s("s_suppkey") == LongType)
    val n = fields("nation")
    assert(n("n_nationkey") == IntegerType)
    val r = fields("region")
    assert(r("r_regionkey") == IntegerType)
  }

  test("all three scale factors agree on the events ts vintage") {
    val types = Seq("sf0.001", "sf0.01", "sf0.1").map { sf =>
      Tables.table(spark, s"/root/testdata/$sf", "events")
        .schema("ts").dataType
    }
    assert(types.distinct.size == 1,
      s"events.ts differs across scale factors: $types")
  }
}
