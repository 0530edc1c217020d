package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Base64

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom-filter index for graft-json tables — the point-lookup
  * companion to [[GraftStats]]' min/max ranges (the same pairing Delta's
  * bloom filter index and Parquet's bloom pages ship).
  *
  * Min/max skipping is blind to equality predicates on high-cardinality
  * columns whose value ranges overlap across files (ids, hashes, URLs: in
  * an un-clustered table every file spans nearly the full key range, so
  * no file is ever pruned). A per-file Bloom filter answers "might this
  * file contain v?" with no false negatives, so `WHERE k = v` scans only
  * the files that could hold v — at 100 TB the difference between one
  * file read and a full-table scan for needle queries.
  *
  * The sidecar `_graft_bloom.json` is ADVISORY, exactly like the stats
  * sidecar: a file without an entry is always scanned, every filter stays
  * a residual Spark re-applies post-scan, and a stale entry for a
  * vanished file is ignored. Copy-on-write rewrites (DELETE / UPDATE /
  * compaction) produce files with fresh names that simply have no entry
  * until the next `buildIndex` — degraded pruning, never a wrong result.
  *
  * Hashing canonicalizes integers to 64-bit before hashing, so an index
  * built before `ALTER COLUMN ... TYPE BIGINT` keeps pruning after the
  * widen; renamed columns fold through the same alias map as stats.
  * Doubles and booleans are not indexable (equality on doubles is a
  * smell, booleans prune nothing).
  */
object GraftBloom {

  val BloomName = "_graft_bloom.json"

  /** One file-column filter: m bits (multiple of 64), k probes, the bit
    * array as packed longs. `m == 0` encodes "column had no non-null
    * values in this file" — every membership test is definitively false.
    */
  final case class ColBloom(m: Int, k: Int, bits: Array[Long]) {
    def mightContain(h1: Long, h2: Long): Boolean = {
      if (m <= 0) return false
      var i = 0
      while (i < k) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m.toLong).toInt
        if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** Mutable builder used while indexing one file's column. */
  final class Builder(expectedKeys: Long, bitsPerKey: Int) {
    // Kirsch–Mitzenmacher double hashing: k probes from two base hashes.
    val m: Int = {
      val raw = math.max(64L, expectedKeys * bitsPerKey.toLong)
      val rounded = ((raw + 63L) / 64L) * 64L
      math.min(rounded, 1L << 30).toInt
    }
    val k: Int = math.max(1, math.round(bitsPerKey * math.log(2.0)).toInt)
    private val bits = new Array[Long](m >>> 6)
    private var any = false

    def add(h1: Long, h2: Long): Unit = {
      any = true
      var i = 0
      while (i < k) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m.toLong).toInt
        bits(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }

    def result(): ColBloom =
      if (any) ColBloom(m, k, bits) else ColBloom(0, k, Array.empty)
  }

  /** Two independent 64-bit hashes of an engine value, canonicalized so
    * the same logical value hashes identically across INT/BIGINT (the
    * widening path re-types old files' literals). None = not indexable.
    */
  def hashPair(v: Any): Option[(Long, Long)] = v match {
    case u: UTF8String => Some((XXH64.hashUTF8String(u, 0L), XXH64.hashUTF8String(u, 1L)))
    case l: Long => Some((XXH64.hashLong(l, 0L), XXH64.hashLong(l, 1L)))
    case i: Int => Some((XXH64.hashLong(i.toLong, 0L), XXH64.hashLong(i.toLong, 1L)))
    case _ => None
  }

  /** Is `dt` a type this index can cover? */
  def indexable(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType => true
    case _ => false
  }

  // ---------------------------------------------------------------- pruning

  /** Can any row in a file with these per-column filters satisfy
    * `filter`? Conservative: anything not understood, any unindexed
    * column, or any unconvertible literal returns true. Only equality
    * shapes consult the filters — ranges are the stats layer's job.
    */
  def mayMatch(filter: Filter, blooms: Map[String, ColBloom], schema: StructType): Boolean = {
    def lookup(name: String, v: Any): Boolean = blooms.get(name) match {
      case Some(b) =>
        GraftStats.typedLiteral(schema, name, v).flatMap(hashPair) match {
          case Some((h1, h2)) => b.mightContain(h1, h2)
          case None => true
        }
      case None => true
    }
    filter match {
      case EqualTo(a, v) if v != null => lookup(a, v)
      case EqualNullSafe(a, v) if v != null => lookup(a, v)
      case In(a, vs) if vs != null && vs.nonEmpty =>
        // null elements match nothing under IN; the all-null / empty case
        // is already pruned by the stats layer
        vs.exists(v => v != null && lookup(a, v))
      case And(l, r) => mayMatch(l, blooms, schema) && mayMatch(r, blooms, schema)
      case Or(l, r) => mayMatch(l, blooms, schema) || mayMatch(r, blooms, schema)
      case _ => true
    }
  }

  // ------------------------------------------------------------ persistence

  /** Write the sidecar atomically (tmp + rename). Advisory: a crash
    * between a data commit and this write merely disables point-lookup
    * pruning for the unindexed files.
    */
  def write(dir: Path, index: Map[String, Map[String, ColBloom]]): Unit = {
    val sb = new java.lang.StringBuilder(1024)
    sb.append('{')
    var firstF = true
    index.toSeq.sortBy(_._1).foreach { case (file, cols) =>
      if (!firstF) sb.append(',')
      firstF = false
      sb.append('"').append(file).append("\":{")
      var firstC = true
      cols.toSeq.sortBy(_._1).foreach { case (c, b) =>
        if (!firstC) sb.append(',')
        firstC = false
        val bytes = new Array[Byte](b.bits.length * 8)
        val buf = java.nio.ByteBuffer.wrap(bytes)
        b.bits.foreach(buf.putLong)
        sb.append('"').append(c).append("\":{\"m\":").append(b.m)
          .append(",\"k\":").append(b.k)
          .append(",\"b\":\"").append(Base64.getEncoder.encodeToString(bytes))
          .append("\"}")
      }
      sb.append('}')
    }
    sb.append("}\n")
    val tmp = dir.resolve(BloomName + ".tmp")
    Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(BloomName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Parse the sidecar; empty when absent or unparseable. Entries keyed
    * by a former column name (pre-RENAME builds) fold into the current
    * name, same as the stats reader.
    */
  def read(dir: Path): Map[String, Map[String, ColBloom]] = {
    val p = dir.resolve(BloomName)
    if (!Files.exists(p)) return Map.empty
    val renameTo: Map[String, String] = GraftCatalog.renamesAt(dir)
      .flatMap { case (cur, formers) => formers.map(_ -> cur) }
    try {
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
      parse(text, renameTo)
    } catch { case _: Exception => Map.empty }
  }

  private def parse(text: String,
      renameTo: Map[String, String]): Map[String, Map[String, ColBloom]] = {
    var i = 0
    def expect(c: Char): Unit = {
      require(i < text.length && text.charAt(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def parseStr(): String = {
      expect('"')
      val start = i
      while (text.charAt(i) != '"') i += 1 // file/col names and base64: no escapes
      val s = text.substring(start, i)
      i += 1
      s
    }
    def parseInt(): Int = {
      val start = i
      while (i < text.length && !",}".contains(text.charAt(i))) i += 1
      text.substring(start, i).toInt
    }
    def parseCol(): ColBloom = {
      expect('{')
      var m = 0; var k = 1; var bits: Array[Long] = Array.empty
      var more = text.charAt(i) != '}'
      while (more) {
        val key = parseStr(); expect(':')
        key match {
          case "m" => m = parseInt()
          case "k" => k = parseInt()
          case "b" =>
            val bytes = Base64.getDecoder.decode(parseStr())
            val buf = java.nio.ByteBuffer.wrap(bytes)
            bits = Array.fill(bytes.length / 8)(buf.getLong)
          case other => throw new IllegalArgumentException(s"unknown key $other")
        }
        if (text.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      require(m == 0 || bits.length == m >>> 6, s"bit array length mismatch: m=$m")
      ColBloom(m, k, bits)
    }
    expect('{')
    var out = Map.empty[String, Map[String, ColBloom]]
    var more = text.charAt(i) != '}'
    while (more) {
      val f = parseStr(); expect(':')
      expect('{')
      var cols = Map.empty[String, ColBloom]
      var cmore = text.charAt(i) != '}'
      while (cmore) {
        val c = parseStr(); expect(':')
        cols += renameTo.getOrElse(c, c) -> parseCol()
        if (text.charAt(i) == ',') i += 1 else cmore = false
      }
      expect('}')
      out += f -> cols
      if (text.charAt(i) == ',') i += 1 else more = false
    }
    expect('}')
    out
  }
}
