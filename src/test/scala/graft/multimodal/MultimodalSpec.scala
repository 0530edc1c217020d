package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("decode pipeline: schema contract, determinism, byte counts") {
    val out = MediaPipeline.decodeFeatures(spark, dir)
    assert(out.columns.toSeq == Seq(
      "doc_id", "media_type", "n_bytes", "width", "height", "channels", "checksum"))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Int]("width") >= 1))
    assert(rows.forall(_.getAs[Int]("height") >= 1))
    // deterministic across runs
    val again = MediaPipeline.decodeFeatures(spark, dir).collect()
    assert(rows.map(_.getLong(6)).sorted.toSeq == again.map(_.getLong(6)).sorted.toSeq)
    // n_bytes equals the utf-8 length of the source text
    val expected = graft.Tables.table(spark, dir, "documents")
      .select(sum(octet_length(col("text").cast("binary")))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_bytes")).sum == expected)
  }

  test("frame sampling fans out 1->N per payload, deterministic, monotone ts") {
    val frames = MediaPipeline.sampleFrames(spark, dir, framesPerDoc = 4).collect()
    assert(frames.length == 500 * 4)
    val byDoc = frames.groupBy(_.getLong(0))
    byDoc.values.foreach { fs =>
      assert(fs.map(_.getAs[Int]("frame_index")).sorted.toSeq == (0 until 4))
      val ts = fs.sortBy(_.getAs[Int]("frame_index")).map(_.getAs[Long]("frame_ts_ms"))
      assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    }
    val again = MediaPipeline.sampleFrames(spark, dir, framesPerDoc = 4).collect()
    assert(frames.map(_.getLong(3)).sorted.toSeq == again.map(_.getLong(3)).sorted.toSeq)
  }

  test("real raster decode: PNG/GIF/BMP round-trip through javax.imageio") {
    import spark.implicits._
    // encode known images with the JDK writers, decode through the
    // engine's batch path, and check dims + exact channel sums
    def encoded(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val fixtures = Seq(
      (1L, "png", 7, 3, 0x204080),
      (2L, "gif", 5, 5, 0xFF00FF),
      (3L, "bmp", 2, 9, 0x000000))
    val rows = fixtures.map { case (id, fmt, w, h, rgb) =>
      MediaRow(id, s"image/$fmt", encoded(fmt, w, h, rgb))
    } :+ MediaRow(4L, "text/plain", "not an image at all".getBytes("UTF-8"))
    val out = MediaPipeline.decodeImageStats(
      spark.createDataset(rows).toDF()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "non-raster payloads are dropped")
    fixtures.foreach { case (id, fmt, w, h, rgb) =>
      val r = out(id)
      assert(r.getString(1) == fmt)
      assert(r.getInt(2) == w && r.getInt(3) == h)
      assert(r.getAs[Long]("n_pixels") == w.toLong * h)
      assert(r.getAs[Long]("sum_r") == ((rgb >> 16) & 0xFF).toLong * w * h, fmt)
      assert(r.getAs[Long]("sum_g") == ((rgb >> 8) & 0xFF).toLong * w * h, fmt)
      assert(r.getAs[Long]("sum_b") == (rgb & 0xFF).toLong * w * h, fmt)
    }
    // the stub seam still covers unrecognized payloads in decodeBatch
    val stub = MediaDecoder.decodeBatch(
      Iterator(MediaRow(9L, "application/octet-stream", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))).toSeq
    assert(stub.head.channels == 3 && stub.head.n_bytes == 8L)
    // and raster payloads through decodeBatch report REAL dimensions
    val real = MediaDecoder.decodeBatch(
      Iterator(MediaRow(10L, "image/png", encoded("png", 7, 3, 0x112233)))).toSeq
    assert(real.head.width == 7 && real.head.height == 3 && real.head.channels == 3)
  }

  test("malformed and adversarial payloads degrade, never kill the task") {
    // decompression bomb: a structurally-valid 58-byte BMP DECLARING
    // 100000x100000 — an unbounded decode would allocate the ~37 GB
    // raster before seeing any pixel data; the dimension gate must drop
    // it to the stub/dropped-row path instead
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray
    val bomb = Array[Byte]('B', 'M') ++ le(58, 4) ++ le(0, 4) ++ le(54, 4) ++
      le(40, 4) ++ le(100000, 4) ++ le(100000, 4) ++
      le(1, 2) ++ le(24, 2) ++ le(0, 4) ++ le(4, 4) ++
      le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4)
    assert(MediaDecoder.rasterFormat(bomb).contains("bmp"))
    // truncated PNG: real signature + IHDR, garbage after — JDK decoders
    // throw RuntimeExceptions (not just IOException) on shapes like this
    val badPng = MediaDecoder.encodeRaster("png", 4, 4, 0x112233).take(40)
    // negative declared dimensions in a BMP header
    val negative = bomb.clone()
    System.arraycopy(le(-5L & 0xFFFFFFFFL, 4), 0, negative, 18, 4)
    val rows = Seq(
      MediaRow(1L, "image/bmp", bomb),
      MediaRow(2L, "image/png", badPng),
      MediaRow(3L, "image/bmp", negative),
      MediaRow(4L, "image/png", MediaDecoder.encodeRaster("png", 3, 2, 0x010203)))
    // pixel-stats path: the three malformed rows are DROPPED, the good
    // row decodes — and nothing throws
    val stats = MediaDecoder.decodeImageBatch(rows.iterator).toSeq
    assert(stats.map(_.doc_id) == Seq(4L))
    assert(stats.head.sum_r == 1L * 6 && stats.head.sum_g == 2L * 6 &&
      stats.head.sum_b == 3L * 6)
    // feature path: malformed rows fall back to STUB features
    val feats = MediaDecoder.decodeBatch(rows.iterator).toSeq
    assert(feats.size == 4)
    val real = feats.find(_.doc_id == 4L).get
    assert(real.width == 3 && real.height == 2)
    assert(feats.filter(_.doc_id != 4L).forall(f => f.n_bytes > 0))
  }

  test("decode runs partition-parallel without shuffle") {
    val ds = MediaPipeline.mediaDataset(spark, dir).repartition(8)
    import spark.implicits._
    val decoded = ds.mapPartitions(MediaDecoder.decodeBatch)
    assert(decoded.rdd.getNumPartitions == 8)
    assert(decoded.count() == 500)
  }
}
