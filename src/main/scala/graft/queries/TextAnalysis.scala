package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions

/** Text-analysis operators for an LLM-data pipeline, over the `documents`
  * table: token stats, quality scoring, language-ID heuristic, document
  * fingerprinting, shingle extraction.
  *
  * Everything is per-row narrow work built from codegen'd builtins and
  * higher-order array functions — no UDFs, no shuffles, no explode (the
  * shingle set is computed inside a single `transform`/`array_distinct`
  * expression). At 100 TB this family is embarrassingly parallel and
  * scales linearly with input splits.
  */
object TextAnalysis {

  private def tokens: Column = split(col("text"), " ")

  def defs: Seq[GraftQuery] = Seq(

    // TF-IDF top terms per document — the corpus-weighted term scoring
    // step of a text pipeline. Uses the log-free rational IDF variant
    // tf·(N+1)/(df+1): monotone in df like ln-IDF but pure IEEE
    // multiply/divide, so scores are bit-identical across engines (ln's
    // last-ulp differences between libm implementations are the classic
    // cross-engine trap). Two shuffles (term freq, doc freq) + one
    // broadcast of the corpus size; ranking ties break on the term.
    GraftQuery(
      "txt_tfidf",
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val toks = docs.select(col("doc_id"), explode(tokens).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = toks.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)
        tf.join(dfreq, "term")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            (col("tf").cast("double") * (col("n") + 1).cast("double") /
              (col("df") + 1).cast("double")).as("score"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
      },
      Some("WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2), " +
        "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1), " +
        "n AS (SELECT count(*) AS n FROM documents), " +
        "scored AS (SELECT doc_id, term, " +
        "CAST(tf AS DOUBLE) * CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE) AS score " +
        "FROM tf JOIN dfreq USING (term) CROSS JOIN n) " +
        "SELECT doc_id, term, score, rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score DESC, term ASC) AS rank FROM scored) WHERE rank <= 3")),

    // Token counting: whitespace tokenizer + char lengths.
    GraftQuery(
      "txt_token_stats",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct_tokens")),
      Some("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens " +
        "FROM documents")),

    // BPE-style pre-tokenization: the GPT-2-ish split into letter runs,
    // digit runs, and punctuation runs (regexp, not whitespace) — the
    // token-count estimator a data pipeline runs before real BPE.
    GraftQuery(
      "txt_bpe_tokens",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0)))
              .cast("long").as("n_bpe_tokens"),
            size(array_distinct(
              regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))))
              .cast("long").as("n_distinct_bpe_tokens")),
      Some("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT) " +
        "AS n_bpe_tokens, " +
        "CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+'))) AS BIGINT) " +
        "AS n_distinct_bpe_tokens FROM documents")),

    // REAL merge-table BPE (not the pre-tokenization estimator above):
    // greedy-by-rank encode under the frozen 48-merge vocab artifact
    // (BpeVocab.Default — trained by BpeTokenizer.trainMerges on this
    // fixture, lineage pinned by BpeSpec), as a native codegen'd
    // expression. The oracle REPLAYS the merge sequence in plain SQL:
    // each pre-token's characters are wrapped RS·c·US and the 48 merges
    // apply as chained replace() calls in rank order — exactly the
    // greedy encode under the replayability invariant (see BpeEncode's
    // scaladoc for the proof sketch), so the fingerprint cell pins
    // every token STRING, not just counts.
    GraftQuery(
      "txt_bpe_encode",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        def toks = graft.functions.GraftFunctions
          .bpe_encode(col("text"), graft.functions.BpeVocab.Default)
        Tables.table(s, dir, "documents").select(
          col("doc_id"),
          size(toks).cast("long").as("n_bpe_real_tokens"),
          md5(concat_ws("", transform(toks,
            t => concat(lit("\u001E"), t, lit("\u001F")))))
            .as("bpe_fingerprint"))
      },
      Some("SELECT doc_id, " +
        graft.functions.BpeEncode.oracleCountSql(
          graft.functions.BpeVocab.Default, "text") +
        " AS n_bpe_real_tokens, " +
        graft.functions.BpeEncode.oracleFingerprintSql(
          graft.functions.BpeVocab.Default, "text") +
        " AS bpe_fingerprint FROM documents")),

    // The PRODUCTION-SCALE vocab: same greedy encode, under the frozen
    // 1,536-merge table (BpeVocab.Big — trainMergesScalable over the
    // five-column fixture corpus, constant corpus scans, lineage pinned
    // by BpeSpec). The chained-replace oracle can't replay a table this
    // size (one nested replace() per merge blows DuckDB's expression-
    // depth ceiling), so the oracle iterates a RECURSIVE CTE over ranks
    // — still an exact full-token-stream replay, fingerprint included,
    // by the same replayability invariant.
    GraftQuery(
      "txt_bpe_encode_big",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        def toks = graft.functions.GraftFunctions
          .bpe_encode(col("text"), graft.functions.BpeVocab.Big)
        Tables.table(s, dir, "documents").select(
          col("doc_id"),
          size(toks).cast("long").as("n_bpe_big_tokens"),
          md5(concat_ws("", transform(toks,
            t => concat(lit("\u001E"), t, lit("\u001F")))))
            .as("bpe_big_fingerprint"))
      },
      Some(graft.functions.BpeEncode.oracleRecursiveSql(
        graft.functions.BpeVocab.Big, "documents", "doc_id", "text",
        "n_bpe_big_tokens", "bpe_big_fingerprint"))),

    // Quality scoring: stopword ratio, mean token length, composite score.
    // All-double arithmetic on identical operands — bit-stable vs DuckDB.
    GraftQuery(
      "txt_quality_score",
      (s, dir) => {
        val nTokens = size(tokens).cast("long")
        val nStop = size(filter(tokens, w => w.isin("the", "a"))).cast("long")
        val avgTokLen = (length(col("text")).cast("long") - nTokens + lit(1L))
          .cast("double") / nTokens.cast("double")
        val stopRatio = nStop.cast("double") / nTokens.cast("double")
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            nStop.as("n_stopwords"),
            stopRatio.as("stopword_ratio"),
            avgTokLen.as("avg_token_len"),
            (stopRatio * lit(0.5d) + least(avgTokLen, lit(10.0d)) / lit(10.0d) * lit(0.5d))
              .as("quality_score"))
      },
      Some("SELECT doc_id, " +
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS n_stopwords, " +
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) " +
        " / CAST(len(string_split(text,' ')) AS DOUBLE) AS stopword_ratio, " +
        "CAST(CAST(length(text) AS BIGINT) - len(string_split(text,' ')) + 1 AS DOUBLE) " +
        " / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len, " +
        "(CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) " +
        "   / CAST(len(string_split(text,' ')) AS DOUBLE)) * 0.5 " +
        " + least(CAST(CAST(length(text) AS BIGINT) - len(string_split(text,' ')) + 1 AS DOUBLE) " +
        "   / CAST(len(string_split(text,' ')) AS DOUBLE), CAST(10 AS DOUBLE)) / 10 * 0.5 " +
        " AS quality_score FROM documents")),

    // Language-ID: stopword-profile scores + deterministic argmax.
    // (A real model would go here; the operator shape — per-row profile
    // scoring with tie-broken argmax — is what the engine provides.)
    GraftQuery(
      "txt_langid",
      (s, dir) => {
        val sEn = size(filter(tokens, w => w.isin("the", "a", "of"))).cast("long")
        val sEs = size(filter(tokens, w => w.isin("el", "la", "de"))).cast("long")
        val sDe = size(filter(tokens, w => w.isin("der", "die", "und"))).cast("long")
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            sEn.as("score_en"), sEs.as("score_es"), sDe.as("score_de"),
            when(sEn >= sEs && sEn >= sDe, "en")
              .when(sEs >= sDe, "es")
              .otherwise("de")
              .as("predicted_lang"))
      },
      Some("WITH scored AS (SELECT doc_id, lang, " +
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of'))) AS BIGINT) AS score_en, " +
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de'))) AS BIGINT) AS score_es, " +
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','und'))) AS BIGINT) AS score_de " +
        "FROM documents) " +
        "SELECT doc_id, lang, score_en, score_es, score_de, " +
        "CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en' " +
        "WHEN score_es >= score_de THEN 'es' ELSE 'de' END AS predicted_lang FROM scored")),

    // Normalized md5 document fingerprint (SQL-expressible flavor).
    GraftQuery(
      "txt_md5_fingerprint",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(col("doc_id"), md5(lower(trim(col("text")))).as("fingerprint")),
      Some("SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents")),

    // Rolling-hash fingerprint via the native Catalyst expression
    // (graft.functions.RollingHash, codegen'd). The oracle replays the
    // exact recurrence — h = h*31 + signed_utf8_byte seeded with the
    // same prime — in DuckDB HUGEINT arithmetic with floored mod 2^64
    // (Java long multiplication wraps; HUGEINT doesn't, so every fold
    // step reduces), then maps the result back to the signed range.
    GraftQuery(
      "txt_rolling_fingerprint",
      (s, dir) => {
        GraftFunctions.register(s)
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            GraftFunctions.rolling_hash(col("text")).as("fingerprint"))
      },
      Some {
        val m = "18446744073709551616::HUGEINT"
        val byteAt = "CAST(('0x' || substr(hex(encode(text)), (i-1)*2+1, 2)) AS INT)"
        "SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT " +
          s"THEN h - $m ELSE h END AS BIGINT) AS fingerprint FROM (" +
          "SELECT doc_id, list_reduce(" +
          "list_prepend(1125899906842597::HUGEINT, " +
          "list_transform(range(1, octet_length(encode(text)) + 1), " +
          s"i -> CAST($byteAt AS HUGEINT) - CASE WHEN $byteAt >= 128 THEN 256 ELSE 0 END)), " +
          s"(acc, x) -> ((acc * 31 + x) % $m + $m) % $m) AS h FROM documents)"
      }),

    // Composed corpus-cleaning pipeline — the end-to-end shape of a
    // training-data prep job: quality gate (token count + stopword
    // ratio) -> language filter -> exact dedup keep-first -> per-doc
    // stats of the surviving corpus. One narrow pass + one 16-byte-hash
    // shuffle, regardless of corpus size.
    GraftQuery(
      "pipe_corpus_clean",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val nTokens = size(toks).cast("long")
        val nStop = size(filter(toks, w => w.isin("the", "a"))).cast("long")
        val stopRatio = nStop.cast("double") / nTokens.cast("double")
        Tables.table(s, dir, "documents")
          .filter(col("lang").isin("en", "es", "de", "fr"))
          .withColumn("n_tokens", nTokens)
          .withColumn("stop_ratio", stopRatio)
          .filter(col("n_tokens") >= 20 && col("n_tokens") <= 200 &&
            col("stop_ratio") >= 0.01d)
          .groupBy(md5(lower(trim(col("text")))).as("fingerprint"))
          .agg(
            min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_copies"),
            min(col("n_tokens")).as("n_tokens"))
      },
      Some("WITH scored AS (SELECT doc_id, text, lang, " +
        "CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) " +
        " / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_ratio " +
        "FROM documents WHERE lang IN ('en','es','de','fr')) " +
        "SELECT md5(lower(trim(text))) AS fingerprint, min(doc_id) AS keep_id, " +
        "count(*) AS n_copies, min(n_tokens) AS n_tokens FROM scored " +
        "WHERE n_tokens BETWEEN 20 AND 200 AND stop_ratio >= 0.01 " +
        "GROUP BY 1"),
      bench = true),

    // Word-3-gram distinct shingle count per doc, computed inside one
    // higher-order expression: no explode, no per-doc shuffle.
    GraftQuery(
      "txt_shingle_stats",
      (s, dir) => {
        val toks = tokens
        // Spark sequence(1, 0) is DESCENDING [1,0] (DuckDB's is empty) —
        // guard short docs explicitly.
        val shingles = when(size(toks) >= 3,
          transform(
            sequence(lit(1), size(toks) - lit(2)),
            i => concat_ws(" ",
              element_at(toks, i), element_at(toks, i + lit(1)), element_at(toks, i + lit(2)))))
          .otherwise(array().cast("array<string>"))
        Tables.table(s, dir, "documents")
          .select(
            col("doc_id"),
            greatest(size(toks) - lit(2), lit(0)).cast("long").as("n_shingles"),
            size(array_distinct(shingles)).cast("long").as("n_distinct_shingles"))
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) " +
        "SELECT doc_id, CAST(greatest(len(tokens) - 2, 0) AS BIGINT) AS n_shingles, " +
        "CAST(len(list_distinct(list_transform(generate_series(1, greatest(len(tokens) - 2, 0)), " +
        "i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]))) AS BIGINT) " +
        "AS n_distinct_shingles FROM t")),

    // PII redaction: emails and phone-shaped numbers replaced by typed
    // tokens, with per-doc redaction counts — the scrubbing pass every
    // training corpus needs before release. Deterministic PII is planted
    // from doc_id so the redaction provably fires; patterns are chosen
    // to mean the same thing in Java regex (Spark, codegen'd
    // regexp_replace — narrow per-row work, no shuffle) and RE2
    // (DuckDB). At 100 TB this stays embarrassingly parallel.
    GraftQuery(
      "txt_pii_redact",
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "555-[0-9]{4}"
        val planted = Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            concat(
              substring(col("text"), 1, 40),
              lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or call 555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
              lit(".")).as("text"))
        planted.select(
          col("doc_id"),
          regexp_replace(
            regexp_replace(col("text"), emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]").as("clean_text"),
          regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"))
      },
      Some("WITH planted AS (SELECT doc_id, " +
        "substring(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' " +
        "AS text FROM documents) " +
        "SELECT doc_id, " +
        "regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', " +
        "'[EMAIL]', 'g'), '555-[0-9]{4}', '[PHONE]', 'g') AS clean_text, " +
        "CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS n_phones " +
        "FROM planted")),

    // Inverted index build: term -> document frequency + ordered posting
    // list (the retrieval-side twin of txt_tfidf). Per-doc distinct
    // terms are narrow array work; the ONE shuffle is on the term key,
    // and map-side combine shrinks it (partial collect_lists merge).
    // At 100 TB the posting list per hot term outgrows a single row —
    // the scale path range-partitions by (term, doc_id bucket) so each
    // partial list stays bounded, then concatenates buckets in order;
    // df itself never needs the list (count of the exploded pairs).
    GraftQuery(
      "txt_inverted_index",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("term"))
          .groupBy(col("term"))
          .agg(
            count(lit(1)).as("df"),
            array_join(
              transform(sort_array(collect_list(col("doc_id"))),
                _.cast("string")), ",").as("postings")),
      Some("WITH pairs AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term " +
        "FROM documents) " +
        "SELECT term, count(*) AS df, " +
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings " +
        "FROM pairs GROUP BY term")),

    // Unigram language-model quality score: per-document average corpus
    // probability of its tokens — the cheap LM-based filter that ranks
    // natural prose above keyboard mash / boilerplate (the perplexity
    // filter family, without the log: the score is a single division of
    // two exact integer sums, so it is bit-identical cross-engine where
    // a sum of per-token log-probs would be order- and libm-dependent).
    // Dataflow: token counts (one shuffle, map-side combined), join the
    // tokens back to their counts, per-doc integer mass; the count table
    // is vocabulary-sized so at 100 TB it broadcasts (or bloom-prunes
    // the hapax tail first); the corpus total rides a 1-row broadcast.
    GraftQuery(
      "txt_unigram_score",
      (s, dir) => {
        val toks = Tables.table(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        val total = tf.agg(sum(col("tf")).as("corpus_total"))
        toks.join(tf, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), sum(col("tf")).as("mass"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("n_toks"),
            (col("mass").cast("double") /
              (col("n_toks") * col("corpus_total")).cast("double"))
              .as("avg_unigram_p"))
      },
      Some("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok), " +
        "tot AS (SELECT CAST(sum(tf) AS BIGINT) AS corpus_total FROM tf), " +
        "d AS (SELECT t.doc_id, count(*) AS n_toks, CAST(sum(f.tf) AS BIGINT) AS mass " +
        "FROM toks t JOIN tf f USING (tok) GROUP BY t.doc_id) " +
        "SELECT doc_id, n_toks, " +
        "CAST(mass AS DOUBLE) / CAST(n_toks * corpus_total AS DOUBLE) AS avg_unigram_p " +
        "FROM d, tot")),

    // Intra-document repetition ratio (a Gopher repetition signal):
    // fraction of a document's 3-gram windows that are repeats of an
    // earlier window — boilerplate and template spam score high, prose
    // low. Pure per-row array work (no shuffle at all: explode happens
    // inside a lateral view and re-groups on the same doc_id — AQE keeps
    // it partition-local); one exact integer division at the end.
    GraftQuery(
      "txt_repetition_ratio",
      (s, dir) => {
        val k = 3
        val toks = split(col("text"), " ")
        val grams = when(size(toks) >= k, sequence(lit(1), size(toks) - (k - 1)))
          .otherwise(array().cast("array<int>"))
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            transform(grams, i => array_join(slice(toks, i, lit(k)), " ")).as("w"))
          .select(col("doc_id"), size(col("w")).cast("long").as("n_grams"),
            size(array_distinct(col("w"))).cast("long").as("n_distinct"))
          .withColumn("rep_ratio",
            when(col("n_grams") > 0,
              (col("n_grams") - col("n_distinct")).cast("double") /
                col("n_grams").cast("double")).otherwise(lit(0.0d)))
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "w AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN " +
        "[array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)] " +
        "ELSE [] END AS grams FROM t) " +
        "SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams, " +
        "CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct, " +
        "CASE WHEN len(grams) > 0 THEN " +
        "CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE) " +
        "ELSE 0.0 END AS rep_ratio FROM w")),

    // Character-diversity score (Gini–Simpson over the character
    // distribution): 1 − Σ cᵢ²/n² per document — keyboard mash and
    // single-char runs score near 0 diversity without the cross-engine
    // libm hazard of an entropy log. All integer sums (cᵢ, n exact),
    // one IEEE division + subtraction at the end — bit-identical on
    // both engines. The (doc, char) aggregate map-side combines to at
    // most |alphabet| rows per doc before its one shuffle; both
    // aggregations key on doc_id so AQE coalesces them into one
    // exchange.
    GraftQuery(
      "txt_char_diversity",
      (s, dir) => {
        val perChar = Tables.table(s, dir, "documents")
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .groupBy(col("doc_id"), col("ch"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt") * col("cnt")).as("sum_sq"))
        Tables.table(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
          .join(perChar, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chars"),
            coalesce(col("sum_sq"), lit(0L)).as("sum_sq"))
          .withColumn("diversity",
            when(col("n_chars") > 0,
              lit(1.0d) - col("sum_sq").cast("double") /
                (col("n_chars") * col("n_chars")).cast("double"))
              .otherwise(lit(0.0d)))
      },
      Some("WITH c AS (SELECT doc_id, len(text) AS n_chars, " +
        "CASE WHEN len(text) > 0 THEN " +
        "(SELECT CAST(sum(cnt * cnt) AS BIGINT) FROM " +
        "(SELECT count(*) AS cnt FROM unnest(string_split(text, '')) AS u(ch) GROUP BY ch)) " +
        "ELSE 0 END AS sum_sq FROM documents) " +
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, sum_sq, " +
        "CASE WHEN n_chars > 0 THEN 1.0 - CAST(sum_sq AS DOUBLE) / CAST(n_chars * n_chars AS DOUBLE) " +
        "ELSE 0.0 END AS diversity FROM c")))
}
