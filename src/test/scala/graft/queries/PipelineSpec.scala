package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftQuery, SparkTestSession, Tables}
import graft.operators.BloomAntiJoin

/** Wave-4 assertions beyond the oracle gate: bloom anti-join exactness
  * and selectivity, packing invariants, and mixing-rate bounds.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    GraftQuery.all.find(_.name == name).get.fn(spark, dir)

  test("bloom anti-join is row-identical to the plain left_anti join") {
    val docs = Tables.table(spark, dir, "documents").withColumn("fp", md5(col("text")))
    val blocklist = docs.filter(col("doc_id") % 7 === 0).select(col("fp").as("bfp"))
    val viaBloom = BloomAntiJoin
      .antiJoin(docs, col("fp"), blocklist, col("bfp"), 1000L, 65536L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = docs
      .join(blocklist, col("fp") === col("bfp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain)
    assert(plain.nonEmpty)
  }

  test("bloom pre-filter keeps candidate volume near the true hit count") {
    val docs = Tables.table(spark, dir, "documents").withColumn("fp", md5(col("text")))
    val blocklist = docs.filter(col("doc_id") % 7 === 0).select(col("fp").as("bfp"))
    val bloom = lit(blocklist
      .agg(graft.functions.GraftFunctions.bloom_filter_agg(col("bfp"), 1000L, 65536L))
      .head().getAs[Array[Byte]](0))
    val candidates = docs
      .filter(graft.functions.GraftFunctions.bloom_might_contain(bloom, col("fp")))
      .count()
    val trueHits = docs.join(blocklist, col("fp") === col("bfp"), "left_semi").count()
    val total = docs.count()
    // no false negatives; false positives bounded well below the corpus
    assert(candidates >= trueHits)
    assert(candidates - trueHits < total / 10,
      s"candidates=$candidates trueHits=$trueHits total=$total")
  }

  test("empty blocklist blocks nothing") {
    val docs = Tables.table(spark, dir, "documents").withColumn("fp", md5(col("text")))
    val empty = docs.filter(lit(false)).select(col("fp").as("bfp"))
    assert(BloomAntiJoin.antiJoin(docs, col("fp"), empty, col("bfp")).count() ==
      docs.count())
  }

  test("sequence packing tiles the corpus exactly: offsets are contiguous " +
    "and window spans match token counts") {
    val rows = q("pipe_seq_packing")
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "start_tok", "first_win", "last_win", "n_windows")
      .collect()
    var expectedStart = 0L
    rows.foreach { r =>
      val (nTok, start) = (r.getLong(1), r.getLong(2))
      assert(start == expectedStart, s"doc ${r.getLong(0)}: gap in packing")
      expectedStart = start + nTok
      assert(r.getLong(3) == start / 256)
      assert(r.getLong(4) == (start + nTok - 1) / 256)
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1)
    }
    assert(rows.nonEmpty)
  }

  test("gopher stats bound their fractions and flag the repetitive docs") {
    val rows = q("txt_gopher_quality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val distinctFrac = r.getDouble(2)
      val dupBigram = r.getDouble(3)
      val topWord = r.getDouble(5)
      assert(distinctFrac > 0 && distinctFrac <= 1)
      assert(dupBigram >= 0 && dupBigram < 1)
      assert(topWord > 0 && topWord <= 1)
      assert(r.getBoolean(6) == (distinctFrac >= 0.3 && topWord <= 0.2))
    }
  }

  test("source mixing keeps roughly its configured per-group rates") {
    val docs = Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = GraftQuery.all.find(_.name == "pipe_mix_sources").get
      .fn(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate by source number mod 4: ~5/10/20/40% with small-sample slack
    val expected = Map(0 -> 0.047, 1 -> 0.098, 2 -> 0.2, 3 -> 0.4)
    kept.foreach { case (src, n) =>
      val g = src.drop(3).toInt % 4
      val rate = n.toDouble / perSource(src)
      assert(rate > 0 && rate < expected(g) * 3 + 0.1, s"$src rate=$rate")
    }
    assert(kept.nonEmpty)
  }

  test("intra-doc dedup output has no repeated tokens and preserves order") {
    val rows = q("dd_intradoc_dedup").collect()
    rows.foreach { r =>
      val toks = r.getString(1).split(" ")
      assert(toks.toSet.size == toks.length, s"doc ${r.getLong(0)} repeats")
    }
    // order preservation: first token of dedup == first token of source
    val firstTok = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").getItem(0).as("t0"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(r.getString(1).split(" ").head == firstTok(r.getLong(0)))
    }
  }

  test("global shuffle covers every doc once, with contiguous per-shard " +
    "positions and a run-stable order") {
    val rows = q("pipe_global_shuffle")
      .select("shard", "pos", "doc_id").collect()
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getLong(2)).toSet.size == nDocs)
    rows.groupBy(_.getString(0)).foreach { case (shard, rs) =>
      val ps = rs.map(_.getLong(1)).sorted
      assert(ps.toSeq == (1L to rs.length.toLong),
        s"shard $shard positions not 1..n")
    }
    // determinism: a second evaluation yields the identical assignment
    val again = q("pipe_global_shuffle").select("shard", "pos", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("dup weights: every cluster's weights sum to exactly 1.0") {
    val rows = q("pipe_dup_weight").collect()
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(rows.length == nDocs)
    rows.groupBy(_.getString(1)).foreach { case (fp, rs) =>
      // 1/n summed n times is exact in IEEE for the cluster sizes here
      val s = rs.map(_.getDouble(2)).sum
      assert(math.abs(s - 1.0d) < 1e-9, s"fp $fp weight sum $s")
    }
  }
}
