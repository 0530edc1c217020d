package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video-container sniffing for binary media columns: recognize MP4/MOV
  * (ISO-BMFF box walk to moov/mvhd for timescale+duration), AVI (RIFF
  * walk to the avih main header for dimensions and frame timing), and
  * Matroska/WebM (EBML magic + DocType scan) without touching a codec —
  * the metadata pass a multimodal ingest pipeline runs before deciding
  * what to hand to real decoders. Null for anything unrecognized or
  * truncated.
  *
  * Returns struct<format string, duration_ms bigint, width int, height int>
  * with per-format nulls where a container does not expose the field at
  * header level (MP4 dimensions live per-track in tkhd; Matroska needs a
  * full EBML parse for duration).
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"video_meta requires binary, got $t")
  }

  override def dataType: DataType = VideoMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    VideoMeta.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      org.apache.spark.sql.catalyst.InternalRow r = graft.functions.VideoMeta.parse($b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)

  override def prettyName: String = "video_meta"
}

object VideoMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def row(fmt: String, durMs: Any, w: Any, h: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), durMs, w, h))

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def beU64(b: Array[Byte], i: Int): Long =
    (beU32(b, i) << 32) | beU32(b, i + 4)

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + 4 && b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  /** Null when the payload is not a recognizable video container. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    // ISO-BMFF (MP4/MOV): first box must be ftyp
    if (fourcc(b, 4, "ftyp")) return parseMp4(b)
    // RIFF ... "AVI "
    if (fourcc(b, 0, "RIFF") && fourcc(b, 8, "AVI ")) return parseAvi(b)
    // Matroska/WebM: EBML magic, then DocType string within the header
    if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) return parseEbml(b)
    null
  }

  /** Walk top-level boxes to moov, then moov children to mvhd;
    * duration_ms = duration * 1000 / timescale in the mvhd version's
    * field widths.
    */
  private def parseMp4(b: Array[Byte]): InternalRow = {
    var i = 0L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      var size = beU32(b, ii)
      val isMoov = fourcc(b, ii + 4, "moov")
      var payload = i + 8
      if (size == 1 && i + 16 <= b.length) { // 64-bit largesize
        size = beU64(b, ii + 8); payload = i + 16
      } else if (size == 0) { // box extends to end of file
        size = b.length - i
      }
      if (size < 8) return row("mp4", null, null, null)
      if (isMoov) {
        val mvhd = findMvhd(b, payload, math.min(i + size, b.length.toLong))
        return mvhd.getOrElse(row("mp4", null, null, null))
      }
      i += size
    }
    row("mp4", null, null, null)
  }

  private def findMvhd(b: Array[Byte], from: Long, until: Long): Option[InternalRow] = {
    var i = from
    while (i + 8 <= until) {
      val ii = i.toInt
      var size = beU32(b, ii)
      var payload = i + 8
      if (size == 1 && i + 16 <= until) { size = beU64(b, ii + 8); payload = i + 16 }
      else if (size == 0) size = until - i
      if (size < 8) return None
      if (fourcc(b, ii + 4, "mvhd")) {
        val p = payload.toInt
        if (p >= b.length) return None
        val version = b(p) & 0xFF
        if (version == 0 && p + 20 <= b.length) {
          val timescale = beU32(b, p + 12)
          val duration = beU32(b, p + 16)
          if (timescale > 0)
            return Some(row("mp4", duration * 1000L / timescale, null, null))
        } else if (version == 1 && p + 32 <= b.length) {
          val timescale = beU32(b, p + 20)
          val duration = beU64(b, p + 24)
          if (timescale > 0)
            return Some(row("mp4", duration * 1000L / timescale, null, null))
        }
        return None
      }
      i += size
    }
    None
  }

  /** Scan RIFF chunks for the avih main AVI header: frame timing at
    * offsets 0/16 of its payload, dimensions at 32/36 (all LE).
    */
  private def parseAvi(b: Array[Byte]): InternalRow = {
    var i = 12
    while (i + 8 <= b.length) {
      if (fourcc(b, i, "avih")) {
        val p = i + 8
        if (p + 40 > b.length) return row("avi", null, null, null)
        val musPerFrame = leU32(b, p)
        val totalFrames = leU32(b, p + 16)
        val w = leU32(b, p + 32).toInt
        val h = leU32(b, p + 36).toInt
        val durMs: Any =
          if (musPerFrame > 0) musPerFrame * totalFrames / 1000L else null
        return row("avi", durMs, w, h)
      }
      // LIST chunks nest: descend into their payload (skip the list type)
      if (fourcc(b, i, "LIST")) i += 12
      else {
        val size = leU32(b, i + 4)
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        if (size < 0 || size > b.length) return row("avi", null, null, null)
      }
    }
    row("avi", null, null, null)
  }

  /** EBML: DocType is an ASCII string near the start of the header —
    * scan the first 64 bytes rather than full EBML varint parsing.
    */
  private def parseEbml(b: Array[Byte]): InternalRow = {
    val hay = new String(b, 0, math.min(b.length, 64), "ISO-8859-1")
    if (hay.contains("webm")) row("webm", null, null, null)
    else if (hay.contains("matroska")) row("mkv", null, null, null)
    else null
  }
}
