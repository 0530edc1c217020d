package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics for graft-json tables — the data-skipping
  * layer every lakehouse format carries (Delta's stats in the commit log,
  * Iceberg's manifest value ranges, parquet's row-group min/max).
  *
  * Writers collect min/max/null-count per column while rendering rows
  * (zero extra passes); the driver's commit merges them into a
  * `_graft_stats.json` sidecar keyed by data-file name. Scans consult the
  * sidecar to drop whole files whose [min,max] ranges cannot satisfy the
  * pushed-down predicate — at 100 TB the win is files never opened, reads
  * never issued. The sidecar is ADVISORY: a file without stats is always
  * scanned, and Spark re-applies every filter post-scan, so skipping can
  * only remove provably-empty work, never change results.
  *
  * Orderings match Spark's comparison semantics exactly: strings compare
  * as UTF-8 bytes ([[UTF8String]]), not UTF-16 code units; a double
  * column that ever sees NaN drops its min/max (NaN breaks total order
  * and has no JSON rendering).
  */
object GraftStats {

  val StatsName = "_graft_stats.json"

  /** min/max are engine values (UTF8String/Long/Int/Double/Boolean) or
    * null when unavailable (all-null file, NaN seen, or unparsed). A file
    * row count lives beside the per-column map so IsNotNull pruning knows
    * whether any non-null value exists.
    */
  final case class ColStats(min: Any, max: Any, nulls: Long) extends Serializable
  final case class FileStats(rows: Long, cols: Map[String, ColStats]) extends Serializable

  // ---------------------------------------------------------------- collect

  /** Mutable per-task accumulator the data writer feeds row by row. */
  final class Collector(schema: StructType) extends Serializable {
    private val n = schema.length
    private val mins = new Array[Any](n)
    private val maxs = new Array[Any](n)
    private val nulls = new Array[Long](n)
    private val poisoned = new Array[Boolean](n) // NaN seen: no usable range
    private var rows = 0L

    def observe(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      var i = 0
      while (i < n) {
        if (row.isNullAt(i)) nulls(i) += 1
        else if (!poisoned(i)) {
          val v: Any = schema(i).dataType match {
            case StringType => row.getUTF8String(i).clone() // row buffers are reused
            case LongType => row.getLong(i)
            case IntegerType => row.getInt(i)
            case DoubleType =>
              val d = row.getDouble(i)
              if (d.isNaN) { poisoned(i) = true; mins(i) = null; maxs(i) = null }
              d
            case BooleanType => row.getBoolean(i)
            case dt => throw new IllegalArgumentException(s"unsupported type $dt")
          }
          if (!poisoned(i)) {
            if (mins(i) == null || compare(v, mins(i)) < 0) mins(i) = v
            if (maxs(i) == null || compare(v, maxs(i)) > 0) maxs(i) = v
          }
        }
        i += 1
      }
      rows += 1
    }

    def result(): FileStats = FileStats(
      rows,
      schema.fields.zipWithIndex.map { case (f, i) =>
        f.name -> ColStats(mins(i), maxs(i), nulls(i))
      }.toMap)
  }

  private[sources] def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalArgumentException(
      s"incomparable stats values: ${a.getClass} vs ${b.getClass}")
  }

  /** Union of ranges — compaction folds the stats of the files it merges
    * (valid because the compacted file is exactly their concatenation).
    * A side whose range is missing contributes nothing when it provably
    * holds only nulls (nulls == rows); otherwise its non-null values are
    * unknown (NaN-poisoned or unparsed) and the union range must degrade
    * to unknown too.
    */
  def merge(a: FileStats, b: FileStats): FileStats = FileStats(
    a.rows + b.rows,
    (a.cols.keySet ++ b.cols.keySet).map { c =>
      (a.cols.get(c), b.cols.get(c)) match {
        case (Some(x), Some(y)) =>
          def allNull(s: ColStats, rows: Long) = s.min == null && s.nulls == rows
          val xNone = allNull(x, a.rows)
          val yNone = allNull(y, b.rows)
          val (mn, mx) =
            if (xNone && yNone) (null, null)
            else if (xNone) (y.min, y.max)
            else if (yNone) (x.min, x.max)
            else if (x.min == null || y.min == null) (null, null)
            else (
              if (compare(x.min, y.min) <= 0) x.min else y.min,
              if (compare(x.max, y.max) >= 0) x.max else y.max)
          Some(c -> ColStats(mn, mx, x.nulls + y.nulls))
        // a side with no entry has unknown contents for this column —
        // even its null count — so no merged entry (reads treat a missing
        // entry as "anything possible")
        case _ => None
      }
    }.flatten.toMap)

  // ---------------------------------------------------------------- pruning

  /** A literal from a pushed-down [[Filter]] coerced to the engine value
    * of the named column's type; None when the column is unknown, the
    * type unsupported, or the literal unconvertible.
    */
  private[sources] def typedLiteral(
      schema: StructType, name: String, v: Any): Option[Any] =
    schema.fields.find(_.name == name).map(_.dataType).flatMap { dt =>
      try Some(dt match {
        case StringType => v match {
          case s: String => UTF8String.fromString(s)
          case u: UTF8String => u
          case other => UTF8String.fromString(other.toString)
        }
        case LongType => v match {
          case l: Long => l; case i: Int => i.toLong
          case s: Short => s.toLong; case b: Byte => b.toLong
          case other => other.toString.toLong
        }
        case IntegerType => v match {
          case i: Int => i; case l: Long if l == l.toInt.toLong => l.toInt
          case s: Short => s.toInt; case b: Byte => b.toInt
          case other => other.toString.toInt
        }
        case DoubleType => v match {
          case d: Double => d; case f: Float => f.toDouble
          case l: Long => l.toDouble; case i: Int => i.toDouble
          case other => other.toString.toDouble
        }
        case BooleanType => v match {
          case b: Boolean => b
          case other => other.toString.toBoolean
        }
        case _ => return None
      }) catch { case _: Exception => None }
    }

  /** Can any row in a file with these stats satisfy `filter`? Conservative:
    * anything not understood (or any missing stat) returns true.
    */
  def mayMatch(filter: Filter, fs: FileStats, schema: StructType): Boolean = {
    def col(name: String): Option[ColStats] = fs.cols.get(name)
    def typed(name: String, v: Any): Option[Any] = typedLiteral(schema, name, v)
    def range(name: String, v: Any)(p: (ColStats, Any) => Boolean): Boolean =
      (col(name), typed(name, v)) match {
        case (Some(c), Some(t)) if c.min != null && c.max != null => p(c, t)
        case _ => true
      }

    filter match {
      case EqualTo(a, v) =>
        if (v == null) false // SQL semantics: = null matches nothing
        else range(a, v)((c, t) => compare(c.min, t) <= 0 && compare(c.max, t) >= 0)
      case EqualNullSafe(a, v) =>
        if (v == null) col(a).forall(_.nulls > 0)
        else range(a, v)((c, t) => compare(c.min, t) <= 0 && compare(c.max, t) >= 0)
      case GreaterThan(a, v) => range(a, v)((c, t) => compare(c.max, t) > 0)
      case GreaterThanOrEqual(a, v) => range(a, v)((c, t) => compare(c.max, t) >= 0)
      case LessThan(a, v) => range(a, v)((c, t) => compare(c.min, t) < 0)
      case LessThanOrEqual(a, v) => range(a, v)((c, t) => compare(c.min, t) <= 0)
      case In(a, vs) =>
        if (vs == null || vs.isEmpty) false
        else vs.exists(v => mayMatch(EqualTo(a, v), fs, schema))
      case IsNull(a) => col(a).forall(_.nulls > 0)
      case IsNotNull(a) => col(a).forall(c => fs.rows - c.nulls > 0)
      case StringStartsWith(a, p) if p != null && p.nonEmpty =>
        // v has prefix p iff its first |p| bytes equal p; byte truncation
        // is monotone under the byte-wise order, so matches exist only if
        // p ∈ [trunc(min,|p|), trunc(max,|p|)]
        range(a, p) { (c, t) =>
          val pref = t.asInstanceOf[UTF8String].getBytes
          def truncCmp(v: Any): Int = {
            val b = v.asInstanceOf[UTF8String].getBytes
            val n = math.min(b.length, pref.length)
            var i = 0
            while (i < n) {
              val d = (b(i) & 0xff) - (pref(i) & 0xff)
              if (d != 0) return d
              i += 1
            }
            b.length.min(pref.length) - pref.length // shorter trunc < pref
          }
          truncCmp(c.min) <= 0 && truncCmp(c.max) >= 0
        }
      case And(l, r) => mayMatch(l, fs, schema) && mayMatch(r, fs, schema)
      case Or(l, r) => mayMatch(l, fs, schema) || mayMatch(r, fs, schema)
      case _ => true // Not, string contains/ends-with, UDF residuals, …
    }
  }

  /** The subset of `filters` the skipping layer understands — reported as
    * pushed for explain-plan visibility; every filter stays a residual
    * (Spark re-evaluates post-scan), which is what makes skipping safe.
    */
  def understood(filters: Array[Filter]): Array[Filter] = filters.filter {
    case EqualTo(_, _) | EqualNullSafe(_, _) | GreaterThan(_, _) |
        GreaterThanOrEqual(_, _) | LessThan(_, _) | LessThanOrEqual(_, _) |
        In(_, _) | IsNull(_) | IsNotNull(_) | StringStartsWith(_, _) => true
    case And(l, r) => understood(Array(l, r)).length == 2
    case Or(l, r) => understood(Array(l, r)).length == 2
    case _ => false
  }

  // ------------------------------------------------------------ persistence

  /** Render one file's stats as a JSON object fragment. */
  private def renderFile(fs: FileStats, schema: StructType): String = {
    val sb = new java.lang.StringBuilder(128)
    sb.append("{\"rows\":").append(fs.rows).append(",\"cols\":{")
    var first = true
    schema.fields.foreach { f =>
      fs.cols.get(f.name).foreach { c =>
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(f.name).append("\":{")
        sb.append("\"nulls\":").append(c.nulls)
        if (c.min != null) sb.append(",\"min\":").append(renderValue(c.min))
        if (c.max != null) sb.append(",\"max\":").append(renderValue(c.max))
        sb.append('}')
      }
    }
    sb.append("}}").toString
  }

  private def renderValue(v: Any): String = v match {
    case u: UTF8String => renderString(u.toString)
    case s: String => renderString(s)
    case d: Double =>
      if (d.isInfinite) renderString(d.toString) // JSON has no Infinity literal
      else d.toString
    case other => other.toString // Long / Int / Boolean
  }

  private def renderString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Write the sidecar atomically (tmp + rename, like the manifest). The
    * sidecar is advisory, so a crash between manifest swap and stats write
    * merely disables skipping for the new files.
    */
  def write(dir: Path, stats: Map[String, FileStats], schema: StructType): Unit = {
    val sb = new java.lang.StringBuilder(256)
    sb.append('{')
    var first = true
    stats.toSeq.sortBy(_._1).foreach { case (file, fs) =>
      if (!first) sb.append(',')
      first = false
      sb.append(renderString(file)).append(':').append(renderFile(fs, schema))
    }
    sb.append("}\n")
    val tmp = dir.resolve(StatsName + ".tmp")
    Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(StatsName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Parse the sidecar; empty map when absent or unparseable (skipping
    * silently disabled — advisory metadata must never fail a read).
    */
  def read(dir: Path, schema: StructType): Map[String, FileStats] = {
    val p = dir.resolve(StatsName)
    if (!Files.exists(p)) return Map.empty
    // sidecars written before a RENAME COLUMN key the former name; fold
    // those entries into the current name (values re-parse under the
    // current type, same as the widening path) so skipping on a renamed
    // column keeps pruning pre-rename files
    val renameTo: Map[String, String] = GraftCatalog.renamesAt(dir)
      .flatMap { case (cur, formers) => formers.map(_ -> cur) }
    try parseSidecar(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim,
      schema, renameTo)
    catch { case _: Exception => Map.empty }
  }

  private def parseSidecar(text: String, schema: StructType,
      renameTo: Map[String, String]): Map[String, FileStats] = {
    val current = schema.fields.map(f => f.name -> f.dataType).toMap
    val types = current ++
      renameTo.flatMap { case (former, cur) => current.get(cur).map(former -> _) }
    var i = 0
    def expect(c: Char): Unit = {
      require(i < text.length && text.charAt(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def parseStr(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      while (text.charAt(i) != '"') {
        val c = text.charAt(i)
        if (c == '\\') {
          text.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' =>
              sb.append(Integer.parseInt(text.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case o => throw new IllegalArgumentException(s"bad escape \\$o")
          }
        } else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
    def parseScalarText(): String = {
      val start = i
      while (i < text.length && !",}]".contains(text.charAt(i))) i += 1
      text.substring(start, i)
    }
    def parseValue(dt: DataType): Any = dt match {
      case StringType => UTF8String.fromString(parseStr())
      case LongType => parseScalarText().toLong
      case IntegerType => parseScalarText().toInt
      case DoubleType =>
        if (text.charAt(i) == '"') parseStr().toDouble else parseScalarText().toDouble
      case BooleanType => parseScalarText().toBoolean
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
    def parseCol(dt: DataType): ColStats = {
      expect('{')
      var mn: Any = null; var mx: Any = null; var nulls = 0L
      var more = text.charAt(i) != '}'
      while (more) {
        val k = parseStr(); expect(':')
        k match {
          case "nulls" => nulls = parseScalarText().toLong
          case "min" => mn = parseValue(dt)
          case "max" => mx = parseValue(dt)
          case other => throw new IllegalArgumentException(s"unknown stat $other")
        }
        if (text.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      ColStats(mn, mx, nulls)
    }
    def parseFile(): FileStats = {
      expect('{')
      var rows = 0L
      var cols = Map.empty[String, ColStats]
      var more = text.charAt(i) != '}'
      while (more) {
        val k = parseStr(); expect(':')
        k match {
          case "rows" => rows = parseScalarText().toLong
          case "cols" =>
            expect('{')
            var cmore = text.charAt(i) != '}'
            while (cmore) {
              val cn = parseStr(); expect(':')
              types.get(cn) match {
                case Some(dt) =>
                  cols += renameTo.getOrElse(cn, cn) -> parseCol(dt)
                case None =>
                  // schema drift (e.g. DROP COLUMN left its entries
                  // behind): skip THIS column's object — throwing here
                  // would discard the whole sidecar and the next commit
                  // would then persist the loss for every file
                  expect('{')
                  var smore = text.charAt(i) != '}'
                  while (smore) {
                    parseStr(); expect(':')
                    if (text.charAt(i) == '"') parseStr() else parseScalarText()
                    if (text.charAt(i) == ',') i += 1 else smore = false
                  }
                  expect('}')
              }
              if (text.charAt(i) == ',') i += 1 else cmore = false
            }
            expect('}')
          case other => throw new IllegalArgumentException(s"unknown key $other")
        }
        if (text.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      FileStats(rows, cols)
    }
    expect('{')
    var out = Map.empty[String, FileStats]
    var more = text.charAt(i) != '}'
    while (more) {
      val f = parseStr(); expect(':')
      out += f -> parseFile()
      if (text.charAt(i) == ',') i += 1 else more = false
    }
    expect('}')
    out
  }
}
