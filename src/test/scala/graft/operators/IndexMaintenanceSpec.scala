package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The auto-maintenance policy layer: each index's `maintain` compacts
  * ONLY when the committed batch-dir count exceeds
  * `spark.graft.index.compactMinBatches` (a long-running ingest calls
  * it per micro-batch; not-due = one directory listing), and the
  * catalog's `maintain` bin-packs small files past its own threshold
  * and expires snapshots at the retention horizon. Serve decisions must
  * be unchanged through a triggered maintenance — the compaction
  * equivalence itself is pinned per index by the compactIndex specs;
  * here the POLICY is under test.
  */
class IndexMaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def withTrigger[T](n: Int)(body: => T): T = {
    spark.conf.set("spark.graft.index.compactMinBatches", n.toString)
    try body
    finally spark.conf.unset("spark.graft.index.compactMinBatches")
  }

  private def docs = graft.Tables.table(spark, dir, "documents")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 120)

  private def batchDirs(root: String): Set[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet

  test("LSH maintain: fires past the threshold, no-op below, serve unchanged") {
    withTrigger(3) {
      val root = java.nio.file.Files.createTempDirectory("graft_mt_lsh").toString
      val idx = s"$root/idx"
      NearDupLsh.writeIndex(docs.filter(col("doc_id") % 5 === 0), idx)
      (0 until 2).foreach(i => NearDupLsh.writeIndexBatch(
        docs.filter(col("doc_id") % 5 === i + 1), idx, batchId = i.toLong))
      // 3 committed dirs (bootstrap + 2): not over the threshold
      assert(!NearDupLsh.maintain(spark, idx, s"$root/idx2"))
      assert(!new java.io.File(s"$root/idx2").exists,
        "not-due maintenance must not touch the target")
      NearDupLsh.writeIndexBatch(
        docs.filter(col("doc_id") % 5 === 3), idx, batchId = 2L)
      val batch = docs.filter(col("doc_id") % 5 === 4)
      def serve(p: String): Set[(Long, Long)] =
        NearDupLsh.pairsAgainstIndexAt(spark, batch, p, 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = serve(idx)
      assert(NearDupLsh.maintain(spark, idx, s"$root/idx2"), "4 dirs > 3: due")
      assert(batchDirs(s"$root/idx2") == Set("batch=-1"))
      assert(serve(s"$root/idx2") == before,
        "a triggered maintenance must not change a serve decision")
      // freshly compacted index: one dir, not due again
      assert(!NearDupLsh.maintain(spark, s"$root/idx2", s"$root/idx3"))
    }
  }

  test("BM25 maintain: threshold on postings dirs, ranking unchanged") {
    withTrigger(2) {
      val root = java.nio.file.Files.createTempDirectory("graft_mt_bm").toString
      val idx = s"$root/idx"
      Bm25Index.writeIndex(docs.filter(col("doc_id") % 4 === 0), idx)
      Bm25Index.appendIndex(docs.filter(col("doc_id") % 4 === 1), idx, 0L)
      assert(!Bm25Index.maintain(spark, idx, s"$root/idx2"))
      Bm25Index.appendIndex(docs.filter(col("doc_id") % 4 === 2), idx, 1L)
      val qs = Seq(1L -> "customer", 1L -> "join", 2L -> "batch")
      def serve(p: String) = Bm25Index.topK(spark, p, qs, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val before = serve(idx)
      assert(Bm25Index.maintain(spark, idx, s"$root/idx2"))
      assert(batchDirs(s"$root/idx2/postings") == Set("batch=-1"))
      assert(serve(s"$root/idx2") == before)
      assert(!Bm25Index.maintain(spark, s"$root/idx2", s"$root/idx3"))
    }
  }

  test("IVF maintain: threshold on corpus dirs, ANN serve unchanged") {
    withTrigger(2) {
      val e = graft.Tables.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm2",
          graft.functions.GraftFunctions.dot_product(col("v"), col("v")))
      val root = java.nio.file.Files.createTempDirectory("graft_mt_ivf").toString
      val idx = s"$root/idx"
      IvfIndex.writeIndex(e.filter(col("vec_id") % 3 === 0), idx, nlist = 8, iters = 1)
      IvfIndex.appendIndex(e.filter(col("vec_id") % 3 === 1), idx, 0L)
      assert(!IvfIndex.maintain(spark, idx, s"$root/idx2"))
      IvfIndex.appendIndex(e.filter(col("vec_id") % 3 === 2), idx, 1L)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm2").as("qn"))
      def serve(p: String) = IvfIndex.topK(spark, p, q, nprobe = 3, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val before = serve(idx)
      assert(IvfIndex.maintain(spark, idx, s"$root/idx2"))
      assert(batchDirs(s"$root/idx2/corpus") == Set("batch=-1"))
      assert(serve(s"$root/idx2") == before)
      assert(!IvfIndex.maintain(spark, s"$root/idx2", s"$root/idx3"))
    }
  }

  test("ppjoin maintain: threshold on sets dirs, exact serve unchanged") {
    withTrigger(2) {
      val root = java.nio.file.Files.createTempDirectory("graft_mt_pp").toString
      val idx = s"$root/idx"
      val standing = docs.filter(col("doc_id") % 10 =!= 7)
      PrefixFilterJoin.writeIndex(standing.filter(col("doc_id") % 3 === 0), idx, 4, 5)
      PrefixFilterJoin.appendIndex(standing.filter(col("doc_id") % 3 === 1), idx, 0L)
      assert(!PrefixFilterJoin.maintain(spark, idx, s"$root/idx2"))
      PrefixFilterJoin.appendIndex(standing.filter(col("doc_id") % 3 === 2), idx, 1L)
      val batch = docs.filter(col("doc_id") % 10 === 7)
      def serve(p: String): Set[(Long, Long)] =
        PrefixFilterJoin.pairsAgainstIndex(spark, batch, p, 4, 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = serve(idx)
      assert(PrefixFilterJoin.maintain(spark, idx, s"$root/idx2"))
      assert(batchDirs(s"$root/idx2/sets") == Set("batch=-1"))
      assert(serve(s"$root/idx2") == before)
      assert(!PrefixFilterJoin.maintain(spark, s"$root/idx2", s"$root/idx3"))
    }
  }

  test("watermarked maintain carries the uncommitted tail") {
    withTrigger(1) {
      val root = java.nio.file.Files.createTempDirectory("graft_mt_wm").toString
      val idx = s"$root/idx"
      NearDupLsh.writeIndex(docs.filter(col("doc_id") % 3 === 0), idx)
      NearDupLsh.writeIndexBatch(docs.filter(col("doc_id") % 3 === 1), idx, 0L)
      NearDupLsh.writeIndexBatch(docs.filter(col("doc_id") % 3 === 2), idx, 1L)
      // only batches <= 0 count toward the trigger AND fold; batch 1
      // (uncommitted) carries under its own id
      assert(NearDupLsh.maintain(spark, idx, s"$root/idx2", throughBatch = 0L))
      assert(batchDirs(s"$root/idx2") == Set("batch=-1", "batch=1"))
    }
  }

  test("catalog maintain: compacts past the file threshold, expires history") {
    val root = java.nio.file.Files.createTempDirectory("graft_mt_cat").toString
    spark.conf.set("spark.sql.catalog.mtcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mtcat.root", root)
    spark.conf.set("spark.graft.catalog.maintainMaxFiles", "4")
    spark.conf.set("spark.graft.catalog.maintainSmallBytes", "10000")
    spark.conf.set("spark.graft.catalog.snapshotRetentionMs", "0")
    try {
      import spark.implicits._
      spark.sql("CREATE TABLE mtcat.ns.m1 (id BIGINT, s STRING)")
      (0 until 6).foreach(i => Seq((i.toLong, s"v$i")).toDF("id", "s")
        .coalesce(1).writeTo("mtcat.ns.m1").append())
      val dirPath = java.nio.file.Paths.get(root, "ns", "m1")
      val beforeRows = spark.table("mtcat.ns.m1").orderBy("id").collect().toSeq
      val (b, a, expired) = graft.sources.GraftCatalog.maintain(
        spark, dirPath, spark.table("mtcat.ns.m1").schema)
      assert(b == 6 && a < b, s"expected a compaction, got $b -> $a")
      assert(expired > 0, "retention 0 must expire pre-maintenance snapshots")
      assert(spark.table("mtcat.ns.m1").orderBy("id").collect().toSeq == beforeRows,
        "maintenance must not change the table's content")
      // steady state: below the threshold, compaction is a no-op
      val (b2, a2, _) = graft.sources.GraftCatalog.maintain(
        spark, dirPath, spark.table("mtcat.ns.m1").schema)
      assert(b2 == a2)
    } finally {
      Seq("spark.graft.catalog.maintainMaxFiles",
        "spark.graft.catalog.maintainSmallBytes",
        "spark.graft.catalog.snapshotRetentionMs").foreach(spark.conf.unset)
    }
  }
}
