package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming CDC merge: three micro-batches of U/I/D changes applied
  * through foreachBatch, each committing one catalog snapshot. The final
  * state must equal folding the same changes in batch, and every
  * intermediate state must remain time-travel readable — the streaming
  * path adds NO semantics beyond batch MERGE, only incremental arrival.
  */
class CdcMergeStreamSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.cdcm", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.cdcm.root",
      Files.createTempDirectory("graft_cdcm").toString)
    s
  }

  test("three streamed micro-batches equal the batch fold; snapshots accumulate") {
    val sp = spark
    import sp.implicits._
    spark.sql("CREATE TABLE cdcm.ns.acct (id BIGINT, bal DOUBLE)")
    spark.sql("INSERT INTO cdcm.ns.acct VALUES (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)")

    val feed = MemoryStream[(Long, Double, String)](sp)
    val q = CdcMergeStream.start(
      "cdcm.ns.acct",
      feed.toDF().toDF("id", "bal", "op"),
      keyCols = Seq("id"),
      checkpoint = Files.createTempDirectory("graft_cdcm_ckpt").toString)

    def state(sql: String): Set[(Long, Double)] =
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    try {
      feed.addData((2L, 25.0, "U"), (5L, 50.0, "I")) // batch 1: update + insert
      q.processAllAvailable()
      assert(state("SELECT id, bal FROM cdcm.ns.acct") ==
        Set((1L, 10.0), (2L, 25.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))

      feed.addData((3L, 0.0, "D")) // batch 2: delete
      q.processAllAvailable()
      assert(state("SELECT id, bal FROM cdcm.ns.acct") ==
        Set((1L, 10.0), (2L, 25.0), (4L, 40.0), (5L, 50.0)))

      feed.addData((1L, 11.0, "U"), (4L, 0.0, "D"), (6L, 60.0, "I")) // batch 3
      q.processAllAvailable()
    } finally q.stop()

    val finalState = state("SELECT id, bal FROM cdcm.ns.acct")
    assert(finalState == Set((1L, 11.0), (2L, 25.0), (5L, 50.0), (6L, 60.0)))

    // every pre-batch state stays readable: snapshot 1 is the seed insert,
    // snapshots 2..4 are the three streamed merges
    assert(state("SELECT id, bal FROM cdcm.ns.acct VERSION AS OF 1") ==
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)))
    assert(state("SELECT id, bal FROM cdcm.ns.acct VERSION AS OF 2") ==
      Set((1L, 10.0), (2L, 25.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
    assert(state("SELECT id, bal FROM cdcm.ns.acct VERSION AS OF 3") ==
      Set((1L, 10.0), (2L, 25.0), (4L, 40.0), (5L, 50.0)))
    assert(state("SELECT id, bal FROM cdcm.ns.acct VERSION AS OF 4") == finalState)
  }

  test("a duplicate key within one micro-batch fails the batch loudly") {
    val sp = spark
    import sp.implicits._
    spark.sql("CREATE TABLE cdcm.ns.dup (id BIGINT, bal DOUBLE)")
    spark.sql("INSERT INTO cdcm.ns.dup VALUES (1, 1.0)")

    val feed = MemoryStream[(Long, Double, String)](sp)
    val q = CdcMergeStream.start(
      "cdcm.ns.dup",
      feed.toDF().toDF("id", "bal", "op"),
      keyCols = Seq("id"),
      checkpoint = Files.createTempDirectory("graft_cdcm_ckpt2").toString)
    try {
      feed.addData((1L, 2.0, "U"), (1L, 0.0, "D"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(ex.getMessage.contains("multiple rows per key") ||
        Option(ex.getCause).exists(_.getMessage.contains("multiple rows per key")))
      // the failed batch committed nothing — the table still serves the seed
      assert(spark.sql("SELECT id, bal FROM cdcm.ns.dup").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 1.0)))
    } finally q.stop()
  }
}
