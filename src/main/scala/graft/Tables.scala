package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — filters/projections applied by
  * callers reach the scan via Catalyst pushdown, so a query that needs
  * 2 columns reads 2 columns.
  *
  * `events.parquet` has shipped with two vintages of its `ts` column:
  * parquet INT64 TIMESTAMP(NANOS) (which Spark 4 reads only with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, arriving as bigint
  * nanoseconds since the epoch) and plain `timestamp[us]` without a
  * timezone (arriving as TIMESTAMP_NTZ). [[events]] adapts to whichever
  * shape is on disk and always yields the same normalized schema —
  * `ts_ns: bigint` plus `ts: timestamp` — so downstream integer-nanos
  * arithmetic stays valid across fixture regenerations. Any third shape
  * fails loudly here (and FixtureSchemaSpec pins the current one).
  */
object Tables {

  /** Read one of the TESTDATA tables from `dir`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // harmless when ts is timestamp[us]; required when it is NANOS
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/events.parquet")
      case other =>
        spark.read.parquet(s"$dir/$other.parquet")
    }

  /** Exact epoch-microseconds expression for an events `ts` column of
    * the given stored type. All three arms are integer arithmetic — no
    * doubles (double division rounds at 2^53; epoch nanos are ~2^60).
    */
  def eventTsMicros(dt: DataType): Column = dt match {
    // legacy fixture: bigint nanoseconds — integral division
    case LongType => expr("ts div 1000")
    // current fixture: timestamp[us] with no timezone — epoch micros via
    // an NTZ−NTZ diff, independent of the session timezone
    case TimestampNTZType =>
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    // a tz-aware timestamp already denotes an absolute instant
    case TimestampType => unix_micros(col("ts"))
    case other => throw new IllegalStateException(
      s"events.ts: unsupported stored type $other — expected bigint (nanos) or timestamp")
  }

  /** Epoch-milliseconds flavor of [[eventTsMicros]] (same exactness). */
  def eventTsMillis(dt: DataType): Column = dt match {
    case LongType => expr("ts div 1000000")
    case TimestampNTZType =>
      expr("timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    case TimestampType => unix_millis(col("ts"))
    case other => throw new IllegalStateException(
      s"events.ts: unsupported stored type $other — expected bigint (nanos) or timestamp")
  }

  /** `events` normalized to the engine's canonical shape: `ts_ns` holds
    * exact integer epoch nanoseconds (the stored value when the fixture
    * is nanos; micros·1000 when it is timestamp[us]) and `ts` is a
    * proper timestamp at Spark's native microsecond resolution. Column
    * order matches the historical layout (ts_ns in place of ts, the
    * derived ts appended) so `select *` consumers are stable.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    val tsType = raw.schema("ts").dataType
    val tsUs = eventTsMicros(tsType)
    val tsNs = tsType match {
      case LongType => col("ts") // keep the exact stored nanos
      case _ => tsUs * lit(1000L)
    }
    val cols = raw.columns.toSeq.map {
      case "ts" => tsNs.as("ts_ns")
      case c => col(c)
    } :+ timestamp_micros(tsUs).as("ts")
    raw.select(cols: _*)
  }
}
