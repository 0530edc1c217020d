package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format sniffing for binary media columns: parse
  * width/height out of PNG / JPEG / GIF / BMP headers without decoding
  * pixels — the cheap metadata pass a multimodal ingest pipeline runs
  * over every blob before deciding what to fully decode. Pure byte
  * inspection (magic numbers + fixed offsets; JPEG walks its marker
  * segments to the first SOF), no codec dependency, null for anything
  * unrecognized or truncated.
  *
  * Returns struct<format string, width int, height int>.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_meta requires binary, got $t")
  }

  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    ImageMeta.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      org.apache.spark.sql.catalyst.InternalRow r = graft.functions.ImageMeta.parse($b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}

object ImageMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private def beI32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def leI32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Null when the payload is not a recognizable image header. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 8-byte signature, IHDR width/height big-endian at 16/20
    if (b.length >= 24 &&
        (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A)
      return row("png", beI32(b, 16), beI32(b, 20))
    // GIF87a / GIF89a: dims little-endian at 6/8
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", leU16(b, 6), leU16(b, 8))
    // BMP: "BM", BITMAPINFOHEADER dims little-endian at 18/22
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return row("bmp", leI32(b, 18), math.abs(leI32(b, 22)))
    // JPEG: walk marker segments to the first start-of-frame
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xFF) == 0xFF) {
        val marker = b(i + 1) & 0xFF
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
          i += 2 // standalone marker, no length
        } else {
          val len = beU16(b, i + 2)
          if (len < 2) return null
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (i + 9 > b.length) return null
            return row("jpeg", beU16(b, i + 7), beU16(b, i + 5))
          }
          i += 2 + len
        }
      }
      return null
    }
    null
  }
}
