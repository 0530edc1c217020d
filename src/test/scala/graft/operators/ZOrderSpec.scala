package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Z-order layout must preserve the data exactly and actually cluster in
  * BOTH dimensions — the property that makes min/max file pruning work
  * for 2-D predicates at 100 TB.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("z-value interleaves bits (known values)") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue16(col("x"), col("y"))).collect().map(_.getLong(0))
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)))
        .reduce(_ | _)
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (1023L, 1023L))
      .map { case (x, y) => morton(x, y) }
    assert(got.toSeq == want)
  }

  test("layout preserves rows exactly") {
    val li = Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val laid = ZOrder.layout(li, col("l_partkey") % 1024, col("l_suppkey") % 1024, 16)
    assert(laid.count() == li.count())
    assert(laid.columns.toSeq == li.columns.toSeq)
    val a = li.agg(sum(col("l_partkey")), sum(col("l_suppkey"))).head()
    val b = laid.agg(sum(col("l_partkey")), sum(col("l_suppkey"))).head()
    assert(a == b)
  }

  test("z-order layout clusters both dimensions; single-column sort does not") {
    // balanced 6-bit dims (z-ordering assumes comparably-scaled
    // dimensions — normalize/bucket real columns to similar bit widths)
    val li = Tables.table(spark, dir, "lineitem")
      .select((col("l_partkey") % 64).as("x"), (col("l_suppkey") % 64).as("y"))

    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x") + 1).as("xr"), (max("y") - min("y") + 1).as("yr"))
        .agg(avg("xr"), avg("yr")).head()
      (r.getDouble(0), r.getDouble(1))
    }

    val (zx, zy) = avgRanges(ZOrder.layout(li, col("x"), col("y"), 16))
    val (sx, sy) = avgRanges(
      li.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    // x-only layout: tight in x, blind in y (partition y-range ≈ full 64)
    assert(sx < 16, s"sx=$sx")
    assert(sy > 48, s"sy=$sy")
    // z-order: BOTH per-partition ranges stay well under the full width,
    // so min/max stats prune scans for predicates on either dimension
    assert(zx < 32, s"zx=$zx")
    assert(zy < 32, s"zy=$zy")
  }
}
