package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** An opaque media payload with typed metadata — the shape a 100 TB
  * multimodal corpus uses: `binary` column + small typed sidecar fields,
  * never decoded strings in the storage layer.
  */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded features (what a real image/audio decode would emit). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    channels: Int,
    checksum: Long)

/** Per-pixel statistics from a REAL decode: integer channel sums (exact
  * in any engine, unlike float means) over the decoded raster.
  */
final case class ImagePixelStats(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_pixels: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** The decode seam. Raster formats the JDK ships codecs for (PNG, BMP,
  * GIF, JPEG via `javax.imageio` — zero external dependencies) decode
  * for real: dimensions and channel statistics come from actual pixels.
  * Payloads with no recognizable raster magic fall back to the STUB — a
  * deterministic function of the payload bytes with the same interface
  * and batch shape a real codec would have (the seam a production build
  * fills with JNI/ffi codecs for the long-tail formats).
  */
object MediaDecoder {

  javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors

  /** Raster magic sniff: the formats the JDK can decode, else None. */
  def rasterFormat(payload: Array[Byte]): Option[String] = {
    def b(i: Int): Int = payload(i) & 0xFF
    if (payload.length < 8) None
    else if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if (b(0) == 0xFF && b(1) == 0xD8 && b(2) == 0xFF) Some("jpeg")
    else None
  }

  /** Largest raster (in pixels) a single row may decode. A crafted
    * header — a 60-byte BMP declaring 100000×100000 — otherwise makes
    * ImageIO allocate the full raster before any pixel data is even
    * validated: a one-row allocation bomb that kills the task (and the
    * job) on adversarial crawl data. 64M pixels ≈ 256 MB ARGB is far
    * above any legitimate thumbnail/photo and well inside executor
    * headroom.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Decode with the failure modes crawl data actually produces handled:
    * declared dimensions are read from the header FIRST (cheap, no pixel
    * allocation) and bounded, and the decode catches NonFatal — JDK
    * ImageIO decoders throw RuntimeExceptions (IllegalArgumentException,
    * NegativeArraySizeException, CMMException), not just IOException, on
    * malformed payloads. Any failure degrades to None (the stub/dropped-
    * row path), never a task failure.
    */
  private def decodeRaster(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Encode a constant-color raster through the JDK writers — the
    * fixture path for gate queries and specs that need REAL container
    * bytes (full PNG/GIF/BMP structure: signatures, chunks/palettes,
    * compression) without stored binary fixtures. Deterministic for a
    * given (fmt, w, h, rgb); a constant fill survives GIF palette
    * derivation exactly.
    */
  def encodeRaster(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** Batched decode: one call per partition-batch, mirroring how a real
    * codec amortizes setup (model load, JNI handles) across rows — the
    * Scala analog of a pandas-UDF batch. Raster payloads are REALLY
    * decoded (width/height/channels from the image); anything else gets
    * the stub features. The checksum is the payload byte hash in both
    * paths (content identity, not pixel identity).
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    rows.map { r =>
      var h = 1125899906842597L
      var i = 0
      while (i < r.payload.length) { h = h * 31L + r.payload(i); i += 1 }
      rasterFormat(r.payload).flatMap(_ => decodeRaster(r.payload)) match {
        case Some(img) =>
          MediaFeatures(
            doc_id = r.doc_id,
            media_type = r.media_type,
            n_bytes = r.payload.length.toLong,
            width = img.getWidth,
            height = img.getHeight,
            channels = img.getColorModel.getNumComponents,
            checksum = h)
        case None =>
          // STUB decoder: features derived deterministically from bytes.
          MediaFeatures(
            doc_id = r.doc_id,
            media_type = r.media_type,
            n_bytes = r.payload.length.toLong,
            width = (Math.floorMod(h, 1024L) + 1L).toInt,
            height = (Math.floorMod(h >>> 10, 1024L) + 1L).toInt,
            channels = 3,
            checksum = h)
      }
    }
  }

  /** Real pixel statistics for raster payloads; rows that don't decode
    * are dropped (the caller's DQ report counts them). The channel sums
    * are integers over the sRGB bytes — engine-exact, order-free.
    */
  def decodeImageBatch(rows: Iterator[MediaRow]): Iterator[ImagePixelStats] =
    rows.flatMap { r =>
      rasterFormat(r.payload).flatMap { fmt =>
        decodeRaster(r.payload).map { img =>
          val (w, hgt) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < hgt) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >>> 16) & 0xFF
              sg += (rgb >>> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          ImagePixelStats(r.doc_id, fmt, w, hgt, w.toLong * hgt, sr, sg, sb)
        }
      }
    }
}

/** One sampled frame of a (stub-decoded) video payload. */
final case class FrameSample(
    doc_id: Long,
    frame_index: Int,
    frame_ts_ms: Long,
    frame_checksum: Long)

/** Spark-side plumbing for multimodal decode: binary columns flow through
  * a typed Dataset; the decode runs via `mapPartitions` so the codec sees
  * batches, not rows; output is a flat feature frame ready to join back.
  * Partitioning is preserved (no shuffle) — decode is embarrassingly
  * parallel at any scale.
  */
object MediaPipeline {

  /** documents.text bytes stand in for the media payload (no binary
    * fixtures in TESTDATA); everything downstream treats it as opaque.
    */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDataset(spark, dir)
      .mapPartitions(MediaDecoder.decodeBatch)
      .toDF()
  }

  /** Real pixel-statistics decode over an arbitrary (doc_id, media_type,
    * payload) frame — same partition-local batch shape as
    * decodeFeatures, but the output columns come from actually decoded
    * rasters (javax.imageio), not the stub.
    */
  def decodeImageStats(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.as[MediaRow]
      .mapPartitions(MediaDecoder.decodeImageBatch)
      .toDF()
  }

  /** Frame sampling: each payload yields `framesPerDoc` frame rows — the
    * 1→N flatMap shape video pipelines need (a real decoder would seek
    * keyframes; the STUB derives frames deterministically from payload
    * bytes). Still partition-local: no shuffle, output fans out in place.
    */
  def sampleFrames(spark: SparkSession, dir: String, framesPerDoc: Int): DataFrame = {
    import spark.implicits._
    mediaDataset(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          var h = 1125899906842597L
          var i = 0
          while (i < r.payload.length) { h = h * 31L + r.payload(i); i += 1 }
          val durationMs = 1000L + Math.floorMod(h, 60000L) // fake duration
          (0 until framesPerDoc).iterator.map { f =>
            FrameSample(
              doc_id = r.doc_id,
              frame_index = f,
              frame_ts_ms = durationMs * f / framesPerDoc,
              frame_checksum = h * 31L + f)
          }
        }
      }
      .toDF()
  }
}
