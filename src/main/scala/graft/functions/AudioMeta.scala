package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio-container sniffing for binary media columns — the WAV/FLAC
  * analog of [[ImageMeta]]: parse sample rate / channels / bit depth
  * from container headers without decoding samples. WAV walks RIFF
  * chunks to `fmt `; FLAC reads the STREAMINFO bitfields; OGG and MP3
  * sync frames are recognized as formats with null parameters (their
  * rates live in codec-specific tables). Null for anything else.
  *
  * Returns struct<format string, sample_rate int, channels int, bits int>.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"audio_meta requires binary, got $t")
  }

  override def dataType: DataType = AudioMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    AudioMeta.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      org.apache.spark.sql.catalyst.InternalRow r = graft.functions.AudioMeta.parse($b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)

  override def prettyName: String = "audio_meta"
}

object AudioMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType)))

  private def row(fmt: String, rate: Any, ch: Any, bits: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), rate, ch, bits))

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def leI32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    // WAV: RIFF....WAVE, then chunk walk to "fmt "
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      while (i + 8 <= b.length) {
        val size = leI32(b, i + 4)
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
          if (i + 8 + 16 > b.length || size < 16) return null
          return row("wav",
            leI32(b, i + 12), // sample rate
            leU16(b, i + 10), // channels
            leU16(b, i + 22)) // bits per sample
        }
        if (size < 0) return null
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      return null
    }
    // FLAC: fLaC + STREAMINFO block (bitfields at fixed offsets)
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' && b.length >= 26) {
      val rate = ((b(18) & 0xFF) << 12) | ((b(19) & 0xFF) << 4) | ((b(20) & 0xFF) >>> 4)
      val channels = (((b(20) & 0xFF) >>> 1) & 0x7) + 1
      val bits = ((((b(20) & 0xFF) & 1) << 4) | ((b(21) & 0xFF) >>> 4)) + 1
      return row("flac", rate, channels, bits)
    }
    // OGG container / MP3 frame sync or ID3: format only
    if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')
      return row("ogg", null, null, null)
    if ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0))
      return row("mp3", null, null, null)
    null
  }
}
