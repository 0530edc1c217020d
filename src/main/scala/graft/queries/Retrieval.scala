package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{GraftQuery, Tables}

/** Full-text retrieval over the `documents` table: BM25 scoring and
  * top-k ranking for a fixed multi-query batch.
  *
  * Scoring is Robertson/Spärck Jones BM25 (k1 = 1.2, b = 0.75) with the
  * log-free rational IDF variant (N − df + 0.5)/(df + 0.5) — monotone in
  * df exactly like the ln form, but built purely from IEEE
  * add/multiply/divide so every per-term contribution is bit-identical
  * across engines (ln's last-ulp spread between libm implementations is
  * the classic cross-engine trap; txt_tfidf makes the same trade). The
  * per-document score sums term contributions through DECIMAL(38,6), so
  * the total is independent of addition order — partial aggregation and
  * AQE re-planning can never change a rank.
  *
  * Scale shape: the posting explode filters to the query's terms BEFORE
  * any shuffle, so data motion is proportional to matching postings, not
  * corpus size; corpus-level constants (N, Σdl) and the per-term df table
  * are broadcast. At 100 TB this is the standard scatter-gather sharded
  * retrieval plan: each input split scores its own documents against the
  * (tiny) query set and only (query, doc, score) tuples move.
  */
object Retrieval {

  private val dec6 = DecimalType(38, 6)

  // fixed query batch over the corpus vocabulary
  private val queryTerms: Seq[(Long, String)] = Seq(
    1L -> "customer", 1L -> "join",
    2L -> "window", 2L -> "sort",
    3L -> "spark", 3L -> "merge", 3L -> "filter")

  def defs: Seq[GraftQuery] = Seq(

    GraftQuery(
      "txt_bm25_topk",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.table(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          split(col("text"), " ").as("toks"))
          .select(col("doc_id"), size(col("toks")).as("dl"),
            explode(col("toks")).as("term"))
        val qdf = queryTerms.toDF("query_id", "term")
        val terms = queryTerms.map(_._2).distinct
        // prune to query terms before the first shuffle
        val hits = toks.filter(col("term").isInCollection(terms))
        val tf = hits.groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = hits.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val stats = docs.agg(count(lit(1)).as("n"),
          sum(size(split(col("text"), " "))).as("dl_sum"))
        // identical parse trees here and in the oracle SQL: every
        // intermediate is one exactly-rounded IEEE op on identical inputs
        val avgdl = col("dl_sum").cast(DoubleType) / col("n").cast(DoubleType)
        val idf = (col("n").cast(DoubleType) - col("df").cast(DoubleType) + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5))
        val tfd = col("tf").cast(DoubleType)
        val norm = tfd + lit(1.2) * (lit(1.0) - lit(0.75) +
          lit(0.75) * (col("dl").cast(DoubleType) / avgdl))
        val contrib = idf * ((tfd * lit(2.2)) / norm)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)
        tf.join(broadcast(qdf), Seq("term"))
          .join(broadcast(dfreq), Seq("term"))
          .crossJoin(broadcast(stats))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(contrib.cast(dec6)).cast(DoubleType).as("score"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
      },
      Some(
        "WITH q(query_id, term) AS (VALUES " +
          queryTerms.map { case (id, t) => s"($id, '$t')" }.mkString(", ") + "), " +
          "toks AS (SELECT doc_id, len(string_split(text, ' ')) AS dl, " +
          "unnest(string_split(text, ' ')) AS term FROM documents), " +
          "hits AS (SELECT * FROM toks WHERE term IN (SELECT term FROM q)), " +
          "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM hits GROUP BY 1, 2, 3), " +
          "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1), " +
          "stats AS (SELECT count(*) AS n, SUM(len(string_split(text, ' '))) AS dl_sum " +
          "FROM documents), " +
          "scored AS (SELECT q.query_id, tf.doc_id, CAST(SUM(CAST(" +
          "((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * " +
          "((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + " +
          "0.75 * (CAST(dl AS DOUBLE) / (CAST(dl_sum AS DOUBLE) / CAST(n AS DOUBLE)))))) " +
          "AS DECIMAL(38,6))) AS DOUBLE) AS score " +
          "FROM tf JOIN q ON tf.term = q.term JOIN dfreq ON tf.term = dfreq.term " +
          "CROSS JOIN stats GROUP BY q.query_id, tf.doc_id) " +
          "SELECT query_id, doc_id, score, rank FROM (SELECT *, row_number() OVER " +
          "(PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank FROM scored) " +
          "WHERE rank <= 5")))
}
