package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Contracts for the shared `batch=<id>` lifecycle mechanics all four
  * persisted indexes (ppjoin / LSH / BM25 / IVF) build on: serve-side
  * listing falls back (`None`) on off-contract names, the compaction
  * tail FAILS FAST on file-bearing off-contract dirs (a silent string
  * flip of the inferred partition column would drop committed rows),
  * and the strictly-earlier serve cut tolerates legacy layouts.
  */
class IndexLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("idxlc").toString
    d
  }

  private def writeBatch(root: String, id: Long, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map(i => (id * 100 + i, s"v$i"))
      .toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/batch=$id")
  }

  test("batchDirIds: ids, serve cut, missing dir, off-contract => None") {
    val root = tmp()
    writeBatch(root, -1, 3); writeBatch(root, 0, 2); writeBatch(root, 1, 2)
    assert(IndexLifecycle.batchDirIds(spark, root) === Some(Set(-1L, 0L, 1L)))
    assert(IndexLifecycle.batchDirIds(spark, root, Some(1L)) === Some(Set(-1L, 0L)))
    assert(IndexLifecycle.batchDirIds(spark, s"$root/nope") === Some(Set.empty[Long]))
    fs(new org.apache.hadoop.fs.Path(root))
      .mkdirs(new org.apache.hadoop.fs.Path(s"$root/batch=1.bak"))
    assert(IndexLifecycle.batchDirIds(spark, root).isEmpty,
      "any off-contract batch= name must void the listing (even empty — " +
        "the caller's consistency checks compare dir SETS)")
  }

  test("tailIds: watermark tail sorted; empty off-contract dir skipped") {
    val root = tmp()
    writeBatch(root, -1, 3); writeBatch(root, 0, 2)
    writeBatch(root, 2, 2); writeBatch(root, 1, 2)
    assert(IndexLifecycle.tailIds(spark, root, 0L) === Seq(1L, 2L))
    assert(IndexLifecycle.tailIds(spark, root, Long.MaxValue) === Seq.empty)
    assert(IndexLifecycle.tailIds(spark, s"$root/nope", 0L) === Seq.empty)
    // an EMPTY off-contract dir is a harmless tooling leftover: partition
    // discovery skips it, so the fold can't lose rows — tail unchanged
    fs(new org.apache.hadoop.fs.Path(root))
      .mkdirs(new org.apache.hadoop.fs.Path(s"$root/batch=1.bak"))
    assert(IndexLifecycle.tailIds(spark, root, 0L) === Seq(1L, 2L))
  }

  test("tailIds: file-bearing off-contract dir fails fast (silent-drop guard)") {
    import spark.implicits._
    val root = tmp()
    writeBatch(root, -1, 3); writeBatch(root, 0, 2)
    Seq((999L, "stray")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/batch=0.bak")
    // the hazard being guarded: the inferred partition column flips to
    // string and a numeric fold filter null-casts every row away
    val inferred = spark.read.parquet(root)
    assert(inferred.schema("batch").dataType ===
      org.apache.spark.sql.types.StringType)
    val ex = intercept[IllegalArgumentException] {
      IndexLifecycle.tailIds(spark, root, 0L)
    }
    assert(ex.getMessage.contains("batch=0.bak"))
  }

  test("compactIndex fails fast on a file-bearing off-contract batch dir " +
      "(Bm25Index + IvfIndex, before any target write)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val bm = tmp()
    Bm25Index.writeIndex(docs, s"$bm/idx")
    Seq(("x", 1L)).toDF("term", "df").coalesce(1)
      .write.mode("overwrite").parquet(s"$bm/idx/df/batch=7.tmp")
    intercept[IllegalArgumentException] {
      Bm25Index.compactIndex(spark, s"$bm/idx", s"$bm/idx2")
    }
    assert(!fs(new org.apache.hadoop.fs.Path(s"$bm/idx2"))
      .exists(new org.apache.hadoop.fs.Path(s"$bm/idx2")),
      "fail-fast must precede any target write")

    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 1.0), (2L, Seq(0.0, 1.0), 1.0),
      (3L, Seq(1.0, 1.0), 2.0), (4L, Seq(0.5, 0.5), 0.5))
      .toDF("vec_id", "v", "norm2")
    val ivf = tmp()
    IvfIndex.writeIndex(vecs, s"$ivf/idx", nlist = 2, iters = 1)
    Seq((9L, Seq(9.0, 9.0), 162.0)).toDF("vec_id", "v", "norm2").coalesce(1)
      .write.mode("overwrite").parquet(s"$ivf/idx/corpus/batch=3.old")
    intercept[IllegalArgumentException] {
      IvfIndex.compactIndex(spark, s"$ivf/idx", s"$ivf/idx2")
    }
    assert(!fs(new org.apache.hadoop.fs.Path(s"$ivf/idx2"))
      .exists(new org.apache.hadoop.fs.Path(s"$ivf/idx2")),
      "fail-fast must precede any target write")
  }

  test("cutBatches: strictly-earlier filter; legacy frame without the column serves whole") {
    import spark.implicits._
    val df = Seq((1L, -1L), (2L, 0L), (3L, 1L)).toDF("k", "batch")
    assert(IndexLifecycle.cutBatches(df, Some(1L)).select(col("k"))
      .collect().map(_.getLong(0)).sorted === Array(1L, 2L))
    assert(IndexLifecycle.cutBatches(df, None).count() === 3)
    val legacy = Seq(1L, 2L).toDF("k")
    assert(IndexLifecycle.cutBatches(legacy, Some(0L)).count() === 2)
  }
}
