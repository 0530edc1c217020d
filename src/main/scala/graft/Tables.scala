package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — filters/projections applied by
  * callers reach the scan via Catalyst pushdown, so a query that needs
  * 2 columns reads 2 columns. `events.parquet` stores its `ts` column as
  * parquet INT64 TIMESTAMP(NANOS), which Spark 4 only reads with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (ts then arrives as
  * bigint nanoseconds since epoch).
  */
object Tables {

  /** Read one of the TESTDATA tables from `dir`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/events.parquet")
      case other =>
        spark.read.parquet(s"$dir/$other.parquet")
    }

  /** `events` with `ts` converted from bigint nanos to a proper timestamp
    * (microsecond precision — Spark's native resolution). The raw nanos
    * column is kept as `ts_ns` for exact bucketing arithmetic.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integral div: double division rounds at 2^53, nanos are ~2^60
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
}
