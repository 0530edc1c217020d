package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Columnar read path for parquet-format graft tables: scans hand Spark
  * [[ColumnarBatch]]es instead of one [[InternalRow]] at a time, so the
  * downstream ColumnarToRow transition runs inside whole-stage codegen —
  * the same batched decode Spark's native parquet source gets, behind the
  * same table protocol (manifest, stats/bloom skipping, time travel).
  *
  * Per data file the reader adapts on its FOOTER:
  *  - fast path (the overwhelming case — any file written under the
  *    current schema, plus post-ADD null-fill and int32→long/double
  *    widening, both of which Spark's vectorized reader handles natively
  *    via missing-column vectors and widening updaters): delegate to
  *    [[VectorizedParquetRecordReader]], requested schema = the scan's
  *    required struct, footer passed through so it is parsed once;
  *  - alias path (files written before a RENAME COLUMN, whose footers
  *    hold former names): decode through the row materializer's alias
  *    binding ([[ParquetFormat.readRows]]) and repack into on-heap
  *    vectors — correctness identical, per-file cost equal to the old
  *    row scan plus one copy.
  *
  * Scans with deletion vectors stay on the row path (ordinal subtraction
  * is row-at-a-time by contract), as do empty projections (agg pushdown
  * owns count-style scans).
  */
private[sources] object GraftColumnarScan {

  val Capacity = 4096

  /** Spark type a graft-written parquet primitive reads back as (the
    * writer's 5-type mapping, inverted).
    */
  private def sparkTypeOf(t: org.apache.parquet.schema.Type): Option[DataType] = {
    if (!t.isPrimitive) None
    else {
      val p = t.asPrimitiveType()
      p.getPrimitiveTypeName match {
        case PrimitiveTypeName.BINARY
            if p.getLogicalTypeAnnotation == LogicalTypeAnnotation.stringType() =>
          Some(StringType)
        case PrimitiveTypeName.INT64 if p.getLogicalTypeAnnotation == null =>
          Some(LongType)
        case PrimitiveTypeName.INT32 if p.getLogicalTypeAnnotation == null =>
          Some(IntegerType)
        case PrimitiveTypeName.DOUBLE => Some(DoubleType)
        case PrimitiveTypeName.BOOLEAN => Some(BooleanType)
        case _ => None
      }
    }
  }

  /** Whether Spark's vectorized reader can serve `required` from this
    * footer directly: every required field either binds BY CURRENT NAME
    * to a file column of an identical or widenable (int32 → long/double,
    * the updaters Spark ships) type, or is absent under ALL of its names
    * (a post-ADD column — the vectorized reader null-fills missing
    * columns). A field whose current name is absent but whose FORMER
    * name is present needs the alias binding only the row materializer
    * does.
    */
  def vectorizable(fileMsg: MessageType, required: StructType,
      aliases: Map[String, Set[String]]): Boolean = {
    val inFile = fileMsg.getFields.asScala.map(f => f.getName -> f).toMap
    required.fields.forall { f =>
      inFile.get(f.name) match {
        case Some(t) => sparkTypeOf(t) match {
          case Some(dt) => dt == f.dataType ||
            (dt == IntegerType &&
              (f.dataType == LongType || f.dataType == DoubleType))
          case None => false
        }
        case None =>
          aliases.getOrElse(f.name, Set.empty).forall(!inFile.contains(_))
      }
    }
  }
}

/** One scan partition's files as ColumnarBatches — files open one at a
  * time; close() releases whichever reader is live (early-exit scans).
  */
private[sources] class GraftColumnarReader(paths: Seq[String],
    tableSchema: StructType, required: StructType,
    aliases: Map[String, Set[String]])
    extends PartitionReader[ColumnarBatch] {

  import GraftColumnarScan.Capacity

  private val pathIt = paths.iterator

  // scan-constant setup hoisted out of the per-file loop: the configured
  // Configuration (a property-map copy — never a fresh XML parse) and the
  // attempt context are identical for every file this partition reads
  private lazy val scanConf: Configuration = {
    val conf = GraftFormat.confCopy()
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, required.json)
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    // the schema converter reads these from the hadoop conf with NO
    // defaults (Spark's own file source propagates session values); the
    // graft type system has no binary/int96/timestamp columns, so the
    // stock values are semantically inert here
    conf.set("spark.sql.parquet.binaryAsString", "false")
    conf.set("spark.sql.parquet.int96AsTimestamp", "true")
    conf.set("spark.sql.caseSensitive", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf
  }
  private lazy val attemptCtx =
    new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      scanConf, new org.apache.hadoop.mapreduce.TaskAttemptID())

  // exactly one of (vec) or (rows, rowVectors, rowBatch) is live at a time
  private var vec: VectorizedParquetRecordReader = _
  private var rows: GraftFormat.Rows = _
  private var rowVectors: Array[OnHeapColumnVector] = _
  private var rowBatch: ColumnarBatch = _
  private var current: ColumnarBatch = _

  private def closeCurrent(): Unit = {
    if (vec != null) { vec.close(); vec = null }
    if (rows != null) { rows.close(); rows = null }
    if (rowBatch != null) { rowBatch.close(); rowBatch = null; rowVectors = null }
  }

  private def openNext(): Boolean = {
    while (pathIt.hasNext) {
      val p = Paths.get(pathIt.next())
      openFile(p)
      if (advanceInFile()) return true
      closeCurrent()
    }
    false
  }

  private def openFile(p: Path): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p.toUri)
    // one footer parse serves both the binding decision and (passed
    // through) the vectorized reader's initialization
    val fr = ParquetFileReader.open(
      HadoopInputFile.fromPath(hp, GraftFormat.hadoopConf))
    val footer = try fr.getFooter catch {
      case t: Throwable => fr.close(); throw t
    }
    if (GraftColumnarScan.vectorizable(
        footer.getFileMetaData.getSchema, required, aliases)) {
      fr.close()
      // the legacy mapred split class: SpecificParquetRecordReaderBase
      // casts to it (it predates the mapreduce API split)
      val split = new org.apache.hadoop.mapred.FileSplit(
        hp, 0, Files.size(p), Array.empty[String])
      // no timestamp/date columns in the graft type system, so the
      // rebase modes are never consulted; CORRECTED = no rewriting
      val r = new VectorizedParquetRecordReader(
        null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, Capacity)
      try {
        r.initialize(split, attemptCtx,
          Some(HadoopInputFile.fromPath(hp, scanConf)), None, Some(footer))
        r.initBatch(new StructType(), InternalRow.empty)
        r.enableReturningBatches()
      } catch { case t: Throwable => r.close(); throw t }
      vec = r
    } else {
      // pre-rename fallback: hand the SAME open reader (and its parsed
      // footer) to the row view — no second open/footer-parse per file
      rows = try ParquetFormat.readRowsFromReader(fr, required, aliases) catch {
        case t: Throwable => fr.close(); throw t
      }
      rowVectors = OnHeapColumnVector.allocateColumns(Capacity, required)
      rowBatch = new ColumnarBatch(
        rowVectors.asInstanceOf[Array[ColumnVector]])
    }
  }

  private def advanceInFile(): Boolean =
    if (vec != null) {
      if (vec.nextKeyValue()) {
        current = vec.getCurrentValue.asInstanceOf[ColumnarBatch]
        true
      } else false
    } else if (rows != null && rows.hasNext) {
      var n = 0
      var i = 0
      while (i < rowVectors.length) { rowVectors(i).reset(); i += 1 }
      while (n < Capacity && rows.hasNext) {
        val r = rows.next()
        var c = 0
        while (c < rowVectors.length) {
          if (r.isNullAt(c)) rowVectors(c).putNull(n)
          else required(c).dataType match {
            case StringType =>
              rowVectors(c).putByteArray(n, r.getUTF8String(c).getBytes)
            case LongType => rowVectors(c).putLong(n, r.getLong(c))
            case IntegerType => rowVectors(c).putInt(n, r.getInt(c))
            case DoubleType => rowVectors(c).putDouble(n, r.getDouble(c))
            case BooleanType => rowVectors(c).putBoolean(n, r.getBoolean(c))
            case dt => throw new IllegalArgumentException(s"unsupported $dt")
          }
          c += 1
        }
        n += 1
      }
      rowBatch.setNumRows(n)
      current = rowBatch
      true
    } else false

  override def next(): Boolean = {
    if ((vec != null || rows != null) && advanceInFile()) return true
    closeCurrent()
    openNext()
  }

  override def get(): ColumnarBatch = current

  override def close(): Unit = closeCurrent()
}
