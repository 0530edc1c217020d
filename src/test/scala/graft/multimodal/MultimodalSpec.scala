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

  test("decode runs partition-parallel without shuffle") {
    val ds = MediaPipeline.mediaDataset(spark, dir).repartition(8)
    import spark.implicits._
    val decoded = ds.mapPartitions(MediaDecoder.decodeBatch)
    assert(decoded.rdd.getNumPartitions == 8)
    assert(decoded.count() == 500)
  }
}
