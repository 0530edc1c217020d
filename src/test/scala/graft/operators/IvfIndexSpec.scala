package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Contracts for the persisted IVF index maintenance lifecycle
  * (writeIndex / appendIndex / topK / compactIndex) — the ANN recall
  * bound itself is gate-covered by sim_ivf_ann / sim_ivf_stream.
  */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm2",
        graft.functions.GraftFunctions.dot_product(col("v"), col("v")))
  }

  private def queries(e: DataFrame): DataFrame = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm2").as("qn"))

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted

  test("build + append serves exactly the frozen-quantizer inline search") {
    val e = corpus
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_lc").toString
    IvfIndex.writeIndex(e.filter(col("vec_id") % 2 === 0), idx, nlist = 16, iters = 2)
    IvfIndex.appendIndex(e.filter(col("vec_id") % 2 =!= 0), idx, batchId = 0L)
    val frozen = IvfIndex.readCentroids(spark, idx)
    val inline = rows(IvfIndex.searchAssigned(
      IvfIndex.assign(e, "v", frozen), frozen, queries(e), nprobe = 4, k = 5))
    assert(inline.nonEmpty)
    assert(rows(IvfIndex.topK(spark, idx, queries(e), nprobe = 4, k = 5)) == inline,
      "the persisted lifecycle must be lossless GIVEN the frozen quantizer")
  }

  test("redelivered / crash-window appends replace their partitions") {
    val e = corpus
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_rd").toString
    IvfIndex.writeIndex(e.filter(col("vec_id") % 2 === 0), idx, nlist = 16, iters = 2)
    val batch = e.filter(col("vec_id") % 2 =!= 0)
    IvfIndex.appendIndex(batch, idx, batchId = 0L)
    val once = rows(IvfIndex.topK(spark, idx, queries(e), 4, 5))
    // full redelivery under the same id: a no-op by layout
    IvfIndex.appendIndex(batch, idx, batchId = 0L)
    assert(rows(IvfIndex.topK(spark, idx, queries(e), 4, 5)) == once)
    // crash window: the batch partition vanishes mid-write; the
    // strictly-earlier serve hides it, redelivery completes it
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/corpus/batch=0"), true)
    val frozen = IvfIndex.readCentroids(spark, idx)
    val committedOnly = rows(IvfIndex.searchAssigned(
      IvfIndex.assign(e.filter(col("vec_id") % 2 === 0), "v", frozen),
      frozen, queries(e), 4, 5))
    assert(rows(IvfIndex.topK(spark, idx, queries(e), 4, 5,
      maxBatchExclusive = Some(0L))) == committedOnly,
      "maxBatchExclusive must equal a fresh search over committed batches")
    IvfIndex.appendIndex(batch, idx, batchId = 0L)
    assert(rows(IvfIndex.topK(spark, idx, queries(e), 4, 5)) == once)
  }

  test("compaction changes no serve; the watermark carries the uncommitted tail") {
    val e = corpus
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_cpt").toString
    IvfIndex.writeIndex(e.filter(col("vec_id") % 3 === 0), idx, nlist = 16, iters = 2)
    IvfIndex.appendIndex(e.filter(col("vec_id") % 3 === 1), idx, batchId = 0L)
    IvfIndex.appendIndex(e.filter(col("vec_id") % 3 === 2), idx, batchId = 1L)
    val full = rows(IvfIndex.topK(spark, idx, queries(e), 4, 5))
    val cut = rows(IvfIndex.topK(spark, idx, queries(e), 4, 5,
      maxBatchExclusive = Some(1L)))
    // clean-stop fold: everything into batch=-1
    val cptAll = java.nio.file.Files.createTempDirectory("graft_ivf_cpt_all").toString
    IvfIndex.compactIndex(spark, idx, cptAll)
    def batchDirs(root: String): Set[String] =
      new java.io.File(s"$root/corpus").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
    assert(batchDirs(cptAll) == Set("batch=-1"))
    assert(rows(IvfIndex.topK(spark, cptAll, queries(e), 4, 5)) == full)
    // watermarked fold: batch 1 carries under its own id; whole and
    // strictly-earlier serves both unchanged
    val cptW = java.nio.file.Files.createTempDirectory("graft_ivf_cpt_w").toString
    IvfIndex.compactIndex(spark, idx, cptW, throughBatch = 0L)
    assert(batchDirs(cptW) == Set("batch=-1", "batch=1"))
    assert(rows(IvfIndex.topK(spark, cptW, queries(e), 4, 5)) == full)
    assert(rows(IvfIndex.topK(spark, cptW, queries(e), 4, 5,
      maxBatchExclusive = Some(1L))) == cut)
  }

  test("streamed ingest serves identically to one batch-append of the same docs") {
    val e = corpus
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_str").toString
    IvfIndex.writeIndex(e.filter(col("vec_id") % 2 === 0), s"$root/a", nlist = 16, iters = 2)
    IvfIndex.writeIndex(e.filter(col("vec_id") % 2 === 0), s"$root/b", nlist = 16, iters = 2)
    graft.streaming.IvfIndexStream.runToCompletion(
      spark, e.filter(col("vec_id") % 2 =!= 0), k = 3,
      indexPath = s"$root/a", checkpoint = s"$root/ckpt")
    IvfIndex.appendIndex(e.filter(col("vec_id") % 2 =!= 0), s"$root/b", batchId = 9L)
    assert(rows(IvfIndex.topK(spark, s"$root/a", queries(e), 4, 5))
      == rows(IvfIndex.topK(spark, s"$root/b", queries(e), 4, 5)),
      "micro-batched stream ingest must equal a single append of the same vectors")
  }
}
