package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** MinHash+LSH near-duplicate mining over any (doc_id, text) frame — the
  * reusable operator behind the `dd_minhash_lsh` query and the
  * ScaleSmoke harness.
  *
  * Pipeline: 3-gram shingles → k=32 native MinHash signature → b=8/r=4
  * banding → band-bucket self-join over NARROW keys → exact Jaccard
  * rescoring (sorted hashed shingles, merge-walk expression) only on
  * candidates. The only shuffles are on (band, band_hash) int pairs and
  * the candidate ids; document payloads never fan out.
  */
object NearDupLsh {

  val Bands = 8
  val RowsPerBand: Int = graft.functions.MinHashSig.K / Bands

  /** Word-3-gram shingle array of a text column. */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 3,
      transform(
        sequence(lit(1), size(toks) - lit(2)),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + lit(1)), element_at(toks, i + lit(2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Incremental flavor: near-dup pairs between a NEW batch and an
    * existing corpus — the daily-crawl shape, where only (new × corpus)
    * candidates are ever generated and old-old pairs cost nothing. Both
    * sides' ids must be disjoint. Returns (new_id, old_id, jaccard).
    * At production scale the corpus side reads its signatures from a
    * PERSISTED index (signatures are append-only artifacts — the same
    * lifecycle as IvfIndex), and the new batch's bands broadcast: the
    * corpus never reshuffles for an incremental batch.
    */
  def pairsAgainst(newDocs: DataFrame, corpus: DataFrame, threshold: Double): DataFrame = {
    val spark = newDocs.sparkSession
    GraftFunctions.register(spark)
    def prep(df: DataFrame) = {
      val p = df.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          GraftFunctions.ngram_hashes(split(col("text"), " ")).as("sh"))
        .withColumn("sig", GraftFunctions.minhash_sig(col("sh")))
        .cache()
      p.count() // materialize once; two plan branches read each side
      p
    }
    val pn = prep(newDocs)
    val pc = prep(corpus)
    def bands(df: DataFrame, idAs: String) = df.select(
      col("doc_id").as(idAs),
      posexplode(array((0 until Bands).map { j =>
        hash((j * RowsPerBand until (j + 1) * RowsPerBand)
          .map(i => col("sig")(i)): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val candidates = bands(pn, "new_id")
      .join(bands(pc, "old_id"), Seq("band", "band_hash"))
      .select(col("new_id"), col("old_id"))
      .dropDuplicates("new_id", "old_id")
      .repartition(spark.sparkContext.defaultParallelism,
        col("new_id"), col("old_id"))
    candidates
      .join(pn.select(col("doc_id").as("new_id"), col("sh").as("sh_a")), Seq("new_id"))
      .join(pc.select(col("doc_id").as("old_id"), col("sh").as("sh_b")), Seq("old_id"))
      .select(col("new_id"), col("old_id"),
        GraftFunctions.sorted_set_jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-dup pairs (doc_a < doc_b, jaccard >= threshold). `docs` needs
    * columns (doc_id, text).
    */
  def pairs(docs: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    val prepared = docs
      .repartition(spark.sparkContext.defaultParallelism)
      // ngram_hashes avoids materializing shingle strings: tokens hash
      // once, windows combine hashes (sorted distinct, jaccard-ready);
      // minhash_sig runs directly over the pre-hashed set
      .select(col("doc_id"),
        GraftFunctions.ngram_hashes(split(col("text"), " ")).as("sh"))
      .withColumn("sig", GraftFunctions.minhash_sig(col("sh")))
      .cache()
    // materialize once: the final job scans `prepared` from four plan
    // branches (band self-join sides + both rescore sides); without this
    // they race the cache and recompute the signatures up to 4x
    prepared.count()
    val bands = prepared.select(
      col("doc_id"),
      posexplode(array((0 until Bands).map { j =>
        hash((j * RowsPerBand until (j + 1) * RowsPerBand)
          .map(i => col("sig")(i)): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val l = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val r = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    val candidates = l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .repartition(spark.sparkContext.defaultParallelism * 2,
        col("doc_a"), col("doc_b"))
    val aSide = prepared.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val bSide = prepared.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    candidates
      .join(aSide, Seq("doc_a"))
      .join(bSide, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        GraftFunctions.sorted_set_jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
