package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rolling_hash: deterministic, matches scalar reference, null-safe") {
    GraftFunctions.register(spark)
    val df = Seq("hello world", "hello world", "otro texto", null)
      .toDF("s")
      .select(col("s"), GraftFunctions.rolling_hash(col("s")).as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(1) == rows(1).getLong(1))
    assert(rows(0).getLong(1) != rows(2).getLong(1))
    assert(rows(3).isNullAt(1))
    // matches the shared scalar implementation byte-for-byte
    assert(rows(0).getLong(1) ==
      RollingHash.hashBytes("hello world".getBytes("UTF-8")))
  }

  test("rolling_hash callable from SQL text") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(viaSql == RollingHash.hashBytes("abc".getBytes("UTF-8")))
  }

  test("simhash64: near-identical token arrays land within small hamming distance") {
    GraftFunctions.register(spark)
    val base = (1 to 200).map(i => s"tok$i")
    val perturbed = base.updated(7, "CHANGED").updated(100, "ALSO")
    val distant = (1 to 200).map(i => s"other$i")
    val df = Seq(base, perturbed, distant).toDF("toks")
      .select(GraftFunctions.simhash64(col("toks")).as("h"))
    val Array(h1, h2, h3) = df.collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h1, h2) <= 8, s"near-dup hamming ${hamming(h1, h2)}")
    assert(hamming(h1, h3) > 16, s"unrelated hamming ${hamming(h1, h3)}")
  }

  test("minhash_sig: signature agreement estimates jaccard") {
    GraftFunctions.register(spark)
    // two sets with known overlap: 80 shared / 120 union = 2/3 jaccard
    val a = (1 to 100).map(i => s"s$i")
    val b = (21 to 120).map(i => s"s$i")
    val df = Seq(a, b).toDF("toks")
      .select(GraftFunctions.minhash_sig(col("toks")).as("sig"))
    val Array(s1, s2) = df.collect().map(_.getSeq[Long](0))
    assert(s1.length == MinHashSig.K)
    val agree = s1.zip(s2).count { case (x, y) => x == y }.toDouble / MinHashSig.K
    val trueJ = 80.0 / 120.0
    assert(math.abs(agree - trueJ) < 0.25, s"minhash agreement $agree vs jaccard $trueJ")
    // identical input -> identical signature
    val again = Seq(a).toDF("toks")
      .select(GraftFunctions.minhash_sig(col("toks")).as("sig"))
      .head().getSeq[Long](0)
    assert(again == s1)
  }

  test("dot_product / l2_dist2 match the zip_with composition bit-for-bit") {
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rng.nextDouble() * 2 - 1),
      Seq.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val native = df.select(
      GraftFunctions.dot_product(col("a"), col("b")),
      GraftFunctions.l2_dist2(col("a"), col("b")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(native == composed) // exact double equality: same fold order
  }

  test("image_meta parses real PNG/JPEG/GIF/BMP headers, null otherwise") {
    GraftFunctions.register(spark)
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 0x0D, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* 640 */ 0, 0, 0x01, 0xE0, /* 480 */ 8, 6, 0, 0, 0)
    val jpeg = bytes(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, /* h 480 */ 0x02, 0x80, /* w 640 */
      0x03, 0x01, 0x22, 0x00)
    val gif = bytes('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, /* 320 LE */ 0xF0, 0x00, /* 240 LE */ 0xF7, 0x00, 0x00)
    val bmp = bytes('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, 40, 0, 0, 0,
      0x20, 0x03, 0, 0, /* 800 LE */ 0x58, 0x02, 0, 0, /* 600 LE */ 1, 0)
    val junk = "not an image at all".getBytes("UTF-8")
    val df = Seq(
      ("png", png), ("jpeg", jpeg), ("gif", gif), ("bmp", bmp), ("junk", junk))
      .toDF("kind", "payload")
      .select(col("kind"), GraftFunctions.image_meta(col("payload")).as("m"))
      .select(col("kind"), col("m.format"), col("m.width"), col("m.height"))
    val got = df.collect().map(r =>
      (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(got == Set(
      ("png", Some("png"), 640, 480),
      ("jpeg", Some("jpeg"), 640, 480),
      ("gif", Some("gif"), 320, 240),
      ("bmp", Some("bmp"), 800, 600),
      ("junk", None, -1, -1)), got)
  }

  test("audio_meta parses WAV fmt chunk and FLAC STREAMINFO, null otherwise") {
    GraftFunctions.register(spark)
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // 44.1kHz stereo 16-bit WAV with a junk chunk before fmt
    val wav = "RIFF".getBytes ++ bytes(36, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ bytes(2, 0, 0, 0, 0xAA, 0xBB) ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0,
        1, 0, /* pcm */ 2, 0, /* stereo */
        0x44, 0xAC, 0, 0, /* 44100 LE */
        0, 0, 0, 0, 0, 0, /* byte rate + align */
        16, 0 /* bits */)
    // FLAC STREAMINFO: rate 48000 = 0xBB80 -> bytes 18..20 hold
    // rate<<4 | (channels-1)<<1 | (bits-1)>>4 bitfields
    val flac = "fLaC".getBytes ++ bytes(0, 0, 0, 34) ++
      bytes(0x10, 0x00, 0x10, 0x00, 0, 0, 0, 0, 0, 0) ++
      bytes(0x0B, 0xB8, 0x02, 0xF0) ++ // 48000<<4=0x0BB802... ch=2,bits=16
      bytes(0, 0, 0, 0, 0, 0, 0, 0)
    val ogg = "OggS".getBytes ++ new Array[Byte](20)
    val junk = "definitely not audio".getBytes("UTF-8")
    val df = Seq(("wav", wav), ("flac", flac), ("ogg", ogg), ("junk", junk))
      .toDF("kind", "payload")
      .select(col("kind"), GraftFunctions.audio_meta(col("payload")).as("m"))
      .select(col("kind"), col("m.format"), col("m.sample_rate"), col("m.channels"), col("m.bits"))
    val got = df.collect().map { r =>
      (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))
    }.toSet
    assert(got.contains(("wav", Some("wav"), 44100, 2, 16)), got)
    assert(got.contains(("ogg", Some("ogg"), -1, -1, -1)), got)
    assert(got.contains(("junk", None, -1, -1, -1)), got)
    val flacRow = got.find(_._1 == "flac").get
    assert(flacRow._2 == Some("flac") && flacRow._3 == 48000 && flacRow._4 == 2
      && flacRow._5 == 16, flacRow)
  }

  test("video_meta parses MP4 mvhd v0/v1, AVI avih, EBML doctype; null otherwise") {
    GraftFunctions.register(spark)
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(v: Long): Array[Byte] =
      bytes(((v >> 24) & 0xFF).toInt, ((v >> 16) & 0xFF).toInt,
        ((v >> 8) & 0xFF).toInt, (v & 0xFF).toInt)
    def le32(v: Long): Array[Byte] =
      bytes((v & 0xFF).toInt, ((v >> 8) & 0xFF).toInt,
        ((v >> 16) & 0xFF).toInt, ((v >> 24) & 0xFF).toInt)
    val ftyp = be32(16) ++ "ftypisom".getBytes ++ be32(0)
    // v0 mvhd: timescale 600, duration 7200 ticks -> 12000 ms
    val mp4v0 = ftyp ++ be32(36) ++ "moov".getBytes ++
      be32(28) ++ "mvhd".getBytes ++ new Array[Byte](12) ++ be32(600) ++ be32(7200)
    // v1 mvhd: 64-bit times, timescale 1000, duration 98765 -> 98765 ms
    val mp4v1 = ftyp ++ be32(48) ++ "moov".getBytes ++
      be32(40) ++ "mvhd".getBytes ++ bytes(1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(1000) ++ be32(0) ++ be32(98765)
    // AVI: 40000 us/frame * 250 frames -> 10000 ms, 1280x720
    val avi = "RIFF".getBytes ++ le32(0) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le32(0) ++ "hdrl".getBytes ++
      "avih".getBytes ++ le32(40) ++
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(250) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(1280) ++ le32(720)
    val webm = bytes(0x1A, 0x45, 0xDF, 0xA3) ++ new Array[Byte](8) ++
      bytes(0x42, 0x82, 0x84) ++ "webm".getBytes
    val mkv = bytes(0x1A, 0x45, 0xDF, 0xA3) ++ new Array[Byte](8) ++
      bytes(0x42, 0x82, 0x88) ++ "matroska".getBytes
    val junk = "definitely not a video".getBytes("UTF-8")
    val got = Seq(("mp4v0", mp4v0), ("mp4v1", mp4v1), ("avi", avi),
        ("webm", webm), ("mkv", mkv), ("junk", junk))
      .toDF("kind", "payload")
      .select(col("kind"), GraftFunctions.video_meta(col("payload")).as("m"))
      .select(col("kind"), col("m.format"), col("m.duration_ms"),
        col("m.width"), col("m.height"))
      .collect().map { r =>
        (r.getString(0), Option(r.getString(1)),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1 else r.getInt(4))
      }.toSet
    assert(got == Set(
      ("mp4v0", Some("mp4"), 12000L, -1, -1),
      ("mp4v1", Some("mp4"), 98765L, -1, -1),
      ("avi", Some("avi"), 10000L, 1280, 720),
      ("webm", Some("webm"), -1L, -1, -1),
      ("mkv", Some("mkv"), -1L, -1, -1),
      ("junk", None, -1L, -1, -1)), got)
  }

  test("expressions hold under codegen and interpreted paths equally") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(64)(i => s"text $i " * (i + 1)).toDF("s")
      .select(GraftFunctions.rolling_hash(col("s")).as("h"),
        GraftFunctions.simhash64(split(col("s"), " ")).as("sh"))
    val withCodegen = df.collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(df.collect().toSeq == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
