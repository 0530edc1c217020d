package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.multimodal.MediaPipeline

/** Multimodal-column operators. TESTDATA has no image/audio fixtures, so
  * the binary payloads are synthesized from document text bytes — the
  * Spark-side plumbing (binary columns + typed metadata, batched
  * partition-level decode, schema contracts) is real and tested; only the
  * codec itself is a stub (see graft.multimodal.MediaDecoder).
  */
object Multimodal {

  // DuckDB emulation of the stub decoder's wrapping Java-long hash
  // h = 1125899906842597; h = h*31 + signedByte — identical to the
  // rolling_hash oracle. `hu` is the hash as an unsigned HUGEINT in
  // [0, 2^64).
  private val M = "18446744073709551616::HUGEINT"
  private val HALF = "9223372036854775808::HUGEINT"
  private val byteAt = "CAST(('0x' || substr(hex(encode(text)), (i-1)*2+1, 2)) AS INT)"
  private val huExpr =
    "list_reduce(list_prepend(1125899906842597::HUGEINT, " +
      "list_transform(range(1, octet_length(encode(text)) + 1), " +
      s"i -> CAST($byteAt AS HUGEINT) - CASE WHEN $byteAt >= 128 THEN 256 ELSE 0 END)), " +
      s"(acc, x) -> ((acc * 31 + x) % $M + $M) % $M)"

  val decodeFeaturesOracle: String =
    s"WITH base AS (SELECT doc_id, text, $huExpr AS hu FROM documents) " +
      "SELECT doc_id, 'text/plain' AS media_type, " +
      "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(hu % 1024 + 1 AS INT) AS width, " +
      "CAST((hu // 1024) % 1024 + 1 AS INT) AS height, " +
      "CAST(3 AS INT) AS channels, " +
      s"CAST(CASE WHEN hu >= $HALF THEN hu - $M ELSE hu END AS BIGINT) AS checksum " +
      "FROM base"

  val frameSampleOracle: String =
    s"WITH base AS (SELECT doc_id, $huExpr AS hu FROM documents), " +
      s"s AS (SELECT doc_id, hu, CASE WHEN hu >= $HALF THEN hu - $M ELSE hu END AS hs FROM base), " +
      "f AS (SELECT unnest([0, 1, 2, 3]) AS fi) " +
      "SELECT doc_id, CAST(fi AS INT) AS frame_index, " +
      "CAST((1000 + ((hs % 60000) + 60000) % 60000) * fi // 4 AS BIGINT) AS frame_ts_ms, " +
      s"CAST(CASE WHEN ((hs * 31 + fi) % $M + $M) % $M >= $HALF " +
      s"THEN ((hs * 31 + fi) % $M + $M) % $M - $M " +
      s"ELSE ((hs * 31 + fi) % $M + $M) % $M END AS BIGINT) AS frame_checksum " +
      "FROM s CROSS JOIN f"

  def defs: Seq[GraftQuery] = Seq(

    // Binary-column metadata: payload as opaque bytes + byte length.
    // (octet_length over the utf-8 payload is SQL-expressible — the
    // plumbing from string→binary→length survives an oracle check.)
    GraftQuery(
      "mm_binary_meta",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            octet_length(col("text").cast("binary")).cast("long").as("n_bytes")),
      Some("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes " +
        "FROM documents")),

    // Full decode pipeline through the typed Dataset + mapPartitions
    // batch interface. The stub codec is deterministic (a 31-polynomial
    // byte hash), so even this path is oracle-gated: DuckDB emulates the
    // wrapping 64-bit arithmetic in HUGEINT mod 2^64 and re-derives every
    // feature column.
    GraftQuery(
      "mm_decode_features",
      (s, dir) => MediaPipeline.decodeFeatures(s, dir),
      Some(Multimodal.decodeFeaturesOracle)),

    // Frame sampling: 1→N fan-out per payload, partition-local. Same
    // HUGEINT emulation, crossed with the frame index range.
    GraftQuery(
      "mm_frame_sample",
      (s, dir) => MediaPipeline.sampleFrames(s, dir, framesPerDoc = 4),
      Some(Multimodal.frameSampleOracle)),

    // REAL decode, oracle-gated by construction: build a complete valid
    // 24-bit BMP per row (BITMAPFILEHEADER + BITMAPINFOHEADER + padded
    // bottom-up pixel rows, assembled as hex text and unhex'd once) with
    // dimensions and a constant fill color derived from fixture columns,
    // then run it through the javax.imageio decode path
    // (MediaPipeline.decodeImageStats). The integer channel sums over
    // the DECODED raster must equal color × pixel-count — any header
    // mistake, stride error, or stub shortcut diverges. Constant fill
    // makes the check orientation-free (BMP stores rows bottom-up).
    GraftQuery(
      "mm_decode_real",
      (s, dir) => {
        val w = (col("doc_id") % 4 + 1).cast("int")
        val h = (col("n_chars") % 4 + 1).cast("int")
        val cr = (col("doc_id") % 256).cast("int")
        val cg = (col("n_chars") % 256).cast("int")
        val cb = ((col("doc_id") + col("n_chars")) % 256).cast("int")
        def hex2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
        def leHex(c: org.apache.spark.sql.Column, n: Int) =
          concat((0 until n).map(k =>
            hex2(shiftright(c, 8 * k).bitwiseAND(lit(255)))): _*)
        // row stride pads to a 4-byte boundary: 3w + (4 - 3w mod 4) mod 4
        val pad = pmod(lit(4) - pmod(w * 3, lit(4)), lit(4))
        val stride = w * 3 + pad
        val imageSize = (stride * h).cast("long")
        val fileSize = imageSize + lit(54L)
        val rowHex = concat(
          repeat(concat(hex2(cb), hex2(cg), hex2(cr)), w), // BGR byte order
          repeat(lit("00"), pad))
        val hdrHex = concat(
          lit("424D"), leHex(fileSize, 4), lit("0000000036000000"), // BM, size, offs 54
          lit("28000000"), leHex(w.cast("long"), 4), leHex(h.cast("long"), 4),
          lit("0100"), lit("1800"), lit("00000000"), // planes 1, 24 bpp, BI_RGB
          leHex(imageSize, 4), lit("00000000000000000000000000000000"))
        val images = Tables.table(s, dir, "documents")
          .select(col("doc_id"), lit("image/bmp").as("media_type"),
            unhex(concat(hdrHex, repeat(rowHex, h))).as("payload"))
        graft.multimodal.MediaPipeline.decodeImageStats(images)
      },
      Some("SELECT doc_id, 'bmp' AS format, " +
        "CAST(doc_id % 4 + 1 AS INT) AS width, " +
        "CAST(n_chars % 4 + 1 AS INT) AS height, " +
        "CAST((doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS n_pixels, " +
        "CAST((doc_id % 256) * (doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS sum_r, " +
        "CAST((n_chars % 256) * (doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS sum_g, " +
        "CAST(((doc_id + n_chars) % 256) * (doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS sum_b " +
        "FROM documents")),

    // REAL compressed-container decode, oracle-gated by construction:
    // per row, a constant-color raster is ENCODED through the JDK
    // writers (PNG for even doc_ids — zlib'd IDAT, CRC'd chunks; GIF
    // for odd — LZW data, palette) with dimensions and fill color
    // derived from fixture columns, then decoded back through the same
    // javax.imageio batch path the BMP gate row uses. The integer
    // channel sums over the DECODED raster must equal color ×
    // pixel-count — this gates the full codec round-trip for two more
    // container formats than the hand-assembled BMP (any compression,
    // palette-derivation, or batch-shape bug diverges). Encode runs in
    // the same mapPartitions batch shape as decode: partition-local,
    // no shuffle.
    GraftQuery(
      "mm_decode_real_png",
      (s, dir) => {
        import s.implicits._
        val images = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
          .mapPartitions(_.map { case (id, nc) =>
            val fmt = if (id % 2 == 0) "png" else "gif"
            val w = (id % 4 + 1).toInt
            val h = (nc % 4 + 1).toInt
            val rgb = (((id % 256) << 16) | ((nc % 256) << 8) | ((id + nc) % 256)).toInt
            graft.multimodal.MediaRow(id, s"image/$fmt",
              graft.multimodal.MediaDecoder.encodeRaster(fmt, w, h, rgb))
          })
          .toDF()
        graft.multimodal.MediaPipeline.decodeImageStats(images)
      },
      Some("SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format, " +
        "CAST(doc_id % 4 + 1 AS INT) AS width, " +
        "CAST(n_chars % 4 + 1 AS INT) AS height, " +
        "CAST((doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS n_pixels, " +
        "CAST((doc_id % 256) * (doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS sum_r, " +
        "CAST((n_chars % 256) * (doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS sum_g, " +
        "CAST(((doc_id + n_chars) % 256) * (doc_id % 4 + 1) * (n_chars % 4 + 1) AS BIGINT) AS sum_b " +
        "FROM documents")),

    // REAL lossy-codec decode, oracle-gated with a TOLERANCE verdict:
    // per row, a constant-color raster is encoded through the JDK JPEG
    // writer (default quality — DCT + quantization + YCbCr round trip,
    // genuinely lossy) and decoded back through the same javax.imageio
    // batch path. Exact cells: format/width/height/n_pixels (JPEG never
    // changes geometry). Lossy cells: the decoded per-channel MEAN must
    // sit within ±8 of the encoded fill color (constant-color blocks
    // round-trip within a few units — DC-only DCT; the bound is stated
    // by the oracle as literal TRUE verdict columns, so any codec-path
    // breakage, channel swap, or raster misread flips a cell). All
    // inputs derive from doc_id alone, so no join back to the fixture.
    GraftQuery(
      "mm_decode_real_jpeg",
      (s, dir) => {
        import s.implicits._
        val images = Tables.table(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (id % 4 + 1).toInt
            val h = ((id / 4) % 4 + 1).toInt
            val rgb = ((((id % 256) << 16) |
              ((id * 7 % 256) << 8) | (id * 13 % 256))).toInt
            graft.multimodal.MediaRow(id, "image/jpeg",
              graft.multimodal.MediaDecoder.encodeRaster("jpg", w, h, rgb))
          })
          .toDF()
        def meanOk(sum: String, expected: org.apache.spark.sql.Column) =
          abs(col(sum).cast("double") / col("n_pixels") -
            expected.cast("double")) <= lit(8.0)
        graft.multimodal.MediaPipeline.decodeImageStats(images)
          .select(col("doc_id"), col("format"), col("width"), col("height"),
            col("n_pixels"),
            meanOk("sum_r", col("doc_id") % 256).as("r_within_tol"),
            meanOk("sum_g", col("doc_id") * 7 % 256).as("g_within_tol"),
            meanOk("sum_b", col("doc_id") * 13 % 256).as("b_within_tol"))
      },
      Some("SELECT doc_id, 'jpeg' AS format, " +
        "CAST(doc_id % 4 + 1 AS INT) AS width, " +
        "CAST((doc_id // 4) % 4 + 1 AS INT) AS height, " +
        "CAST((doc_id % 4 + 1) * ((doc_id // 4) % 4 + 1) AS BIGINT) AS n_pixels, " +
        "TRUE AS r_within_tol, TRUE AS g_within_tol, TRUE AS b_within_tol " +
        "FROM documents")),

    // Image-header sniffing, oracle-gated by construction: build a real
    // PNG header per row with dimensions derived from fixture columns
    // (int → 4-byte big-endian via hex/unhex), parse it back with the
    // native image_meta expression, and let the oracle compute the
    // expected dimensions directly — the parser's output must agree
    // cell-exactly with the values that went in.
    GraftQuery(
      "mm_image_meta",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
        val width = (col("n_chars") % 1024 + 1).cast("int")
        val height = (col("doc_id") % 768 + 1).cast("int")
        val payload = concat(
          unhex(lit("89504E470D0A1A0A")), // PNG signature
          unhex(lit("0000000D49484452")), // IHDR length + tag
          be32(width), be32(height),
          unhex(lit("0806000000"))) // bit depth, color type, etc.
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.GraftFunctions.image_meta(payload).as("m"))
          .select(
            col("doc_id"),
            col("m.format").as("format"),
            col("m.width").cast("long").as("width"),
            col("m.height").cast("long").as("height"))
      },
      Some("SELECT doc_id, 'png' AS format, " +
        "n_chars % 1024 + 1 AS width, doc_id % 768 + 1 AS height " +
        "FROM documents")),

    // Audio-header sniffing, oracle-gated the same way: build a real WAV
    // RIFF header per row (little-endian fields via shift/hex/unhex),
    // parse it back with audio_meta, oracle computes the inputs directly.
    GraftQuery(
      "mm_audio_meta",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        def le(c: org.apache.spark.sql.Column, n: Int) = concat((0 until n).map(k =>
          unhex(lpad(hex(shiftright(c, 8 * k).bitwiseAND(lit(255L))), 2, "0"))): _*)
        val rate = (lit(8000L) + col("n_chars") % 40000L)
        val ch = (col("doc_id") % 2 + 1)
        val bits = ((col("doc_id") % 3) * 8 + 8)
        val payload = concat(
          lit("RIFF").cast("binary"), le(lit(36L), 4), lit("WAVE").cast("binary"),
          lit("fmt ").cast("binary"), le(lit(16L), 4),
          le(lit(1L), 2), le(ch, 2), le(rate, 4),
          le(lit(0L), 4), le(lit(0L), 2), le(bits, 2))
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.GraftFunctions.audio_meta(payload).as("m"))
          .select(
            col("doc_id"),
            col("m.format").as("format"),
            col("m.sample_rate").cast("long").as("sample_rate"),
            col("m.channels").cast("long").as("channels"),
            col("m.bits").cast("long").as("bits"))
      },
      Some("SELECT doc_id, 'wav' AS format, " +
        "8000 + n_chars % 40000 AS sample_rate, " +
        "doc_id % 2 + 1 AS channels, (doc_id % 3) * 8 + 8 AS bits " +
        "FROM documents")),

    // Video-container sniffing, oracle-gated by construction: even rows
    // get a real ISO-BMFF prefix (ftyp + moov/mvhd v0, timescale 600)
    // whose duration field derives from doc_id; odd rows get a RIFF AVI
    // header (LIST/hdrl/avih) carrying frame timing and dimensions. The
    // parser's struct must agree cell-exactly with the values that were
    // packed in — including the duration_ms integer arithmetic
    // (duration*1000/timescale for mp4, musPerFrame*frames/1000 for avi).
    GraftQuery(
      "mm_video_meta",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
        def le(c: org.apache.spark.sql.Column, n: Int) = concat((0 until n).map(k =>
          unhex(lpad(hex(shiftright(c, 8 * k).bitwiseAND(lit(255L))), 2, "0"))): _*)
        val mp4Duration = (col("doc_id") % 100000 + 600).cast("long")
        val mp4 = concat(
          unhex(lit("000000106674797069736F6D00000000")), // ftyp isom
          unhex(lit("000000246D6F6F76")), // moov, size 36
          unhex(lit("0000001C6D766864")), // mvhd, size 28
          unhex(lit("000000000000000000000000")), // v0 + flags + ctime + mtime
          be32(lit(600)), // timescale
          be32(mp4Duration))
        val aviFrames = (col("doc_id") % 5000 + 1).cast("long")
        val aviW = (col("n_chars") % 1920 + 16).cast("long")
        val aviH = (col("doc_id") % 1080 + 16).cast("long")
        val avi = concat(
          lit("RIFF").cast("binary"), le(lit(0L), 4), lit("AVI ").cast("binary"),
          lit("LIST").cast("binary"), le(lit(0L), 4), lit("hdrl").cast("binary"),
          lit("avih").cast("binary"), le(lit(40L), 4),
          le(lit(33333L), 4), // dwMicroSecPerFrame
          le(lit(0L), 4), le(lit(0L), 4), le(lit(0L), 4), // max bytes/padding/flags
          le(aviFrames, 4), // dwTotalFrames
          le(lit(0L), 4), le(lit(1L), 4), le(lit(0L), 4), // initial/streams/bufsize
          le(aviW, 4), le(aviH, 4))
        val payload = when(col("doc_id") % 2 === 0, mp4).otherwise(avi)
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.GraftFunctions.video_meta(payload).as("m"))
          .select(
            col("doc_id"),
            col("m.format").as("format"),
            col("m.duration_ms").as("duration_ms"),
            col("m.width").cast("long").as("width"),
            col("m.height").cast("long").as("height"))
      },
      Some("SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS format, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 100000 + 600) * 1000 // 600 " +
        "ELSE 33333 * (doc_id % 5000 + 1) // 1000 END AS BIGINT) AS duration_ms, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE n_chars % 1920 + 16 END AS BIGINT) AS width, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE doc_id % 1080 + 16 END AS BIGINT) AS height " +
        "FROM documents")))
}
