package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table byte-pair encoding (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL'16 — the public
  * BPE algorithm; this is a Spark-native expression, not a port of any
  * tokenizer library). Input: raw text. Output: the flattened
  * array<string> of BPE tokens across the text's pre-tokens.
  *
  * Pre-tokenization is the engine's standard scheme (txt_bpe_tokens'
  * regex `[a-z]+|[0-9]+|[^a-z0-9 ]+`, implemented as a class-run
  * scanner): letter runs, digit runs, and other-non-space runs; spaces
  * separate and vanish. Each pre-token then starts as its character
  * sequence and greedily merges the LOWEST-RANK adjacent pair present
  * (all leftmost-non-overlapping occurrences at once) until no ranked
  * pair remains — the standard greedy-by-rank BPE encode.
  *
  * REPLAYABILITY INVARIANT (enforced at construction): every merge's
  * created symbol string must be distinct from all single characters
  * and from every symbol referenced or created by EARLIER merges. Under
  * it, greedy-by-rank is provably equal to applying the merge rules
  * once each in rank order (leftmost-non-overlapping per rule): a merge
  * can then only create pairs of strictly higher rank, so the greedy
  * frontier never revisits a passed rank. That equivalence is what lets
  * a plain-SQL oracle replay the encode as a chain of string
  * `replace()` calls over a marker-wrapped symbol string (see
  * [[BpeEncode.oracleReplaySql]]) — and it is the invariant
  * [[graft.operators.BpeTokenizer.trainMerges]] maintains by skipping
  * candidate merges whose concat collides with an existing symbol.
  * Tables trained elsewhere are validated here, fail-fast.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  BpeEncode.validateReplayable(merges)

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.rankMap(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.encode($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

/** The trainer's pair-counting companion of [[BpeEncode]]: adjacent
  * symbol-pair keys (`left·US·right`) of every pre-token encoded under
  * the merge table so far — pairs never cross pre-token boundaries.
  */
case class BpePairs(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  BpeEncode.validateReplayable(merges)

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.rankMap(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_pairs requires string, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BpeEncode.pairKeys(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.pairKeys($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)

  override def prettyName: String = "bpe_pairs"
}

object BpeEncode {

  /** Symbol wrap markers for the SQL-replayable representation: each
    * symbol is stored as RS·sym·US, so a merge rule's string pattern
    * (RS·l·US·RS·r·US → RS·lr·US) can neither match across symbol
    * boundaries nor overlap an adjacent application — `replace()`'s
    * leftmost-non-overlapping scan IS BPE's leftmost-first merge.
    */
  val RS = '\u001E' // record separator: symbol start
  val US = '\u001F' // unit separator: symbol end

  def validateReplayable(merges: Seq[(String, String)]): Unit = {
    // an EMPTY table is valid: encode degenerates to the per-pre-token
    // character split — the trainer's iteration-0 state
    val seen = new scala.collection.mutable.HashSet[String]
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty, s"empty symbol in merge $i")
      require(!(l + r).exists(c => c == RS || c == US),
        s"merge $i contains a reserved marker character")
      val concat = l + r
      require(concat.length >= 2 && !seen.contains(concat) &&
        !merges.take(i).exists { case (pl, pr) => pl == concat || pr == concat },
        s"merge $i creates symbol '$concat' colliding with an earlier " +
          "symbol — greedy-by-rank would diverge from rank-order replay; " +
          "retrain with BpeTokenizer.trainMerges (which skips such candidates)")
      seen += concat
    }
  }

  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + US + r, Integer.valueOf(i))
    }
    m
  }

  private def cls(c: Char): Int =
    if (c >= 'a' && c <= 'z') 1
    else if (c >= '0' && c <= '9') 2
    else if (c == ' ') 0
    else 3

  /** The engine's standard pre-tokenization as a scanner: maximal
    * same-class runs (letters / digits / other-non-space), spaces
    * dropped — char-for-char what `[a-z]+|[0-9]+|[^a-z0-9 ]+` extracts
    * over the engine's ASCII document fixtures (on non-BMP input the
    * scanner classifies UTF-16 code units where RE2 classifies runes;
    * both land such text in the class-3 run, but splits could differ —
    * the oracle-parity contract is the ASCII alphabet).
    */
  def preTokenize(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val k = cls(text.charAt(i))
      if (k == 0) i += 1
      else {
        val start = i
        while (i < n && cls(text.charAt(i)) == k) i += 1
        out += text.substring(start, i)
      }
    }
    out.toSeq
  }

  /** Greedy-by-rank BPE of one pre-token (symbols start as chars). */
  def encodeWord(word: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    while (syms.length > 1) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var bl: String = null; var br: String = null
      i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + US + syms(i + 1))
        if (r != null && r.intValue < best) {
          best = r.intValue; bl = syms(i); br = syms(i + 1)
        }
        i += 1
      }
      if (bl == null) return syms
      // merge all leftmost-non-overlapping occurrences
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
          out += bl + br; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
    }
    syms
  }

  def encode(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    preTokenize(text.toString).foreach { w =>
      encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray)
  }

  /** Adjacent symbol-pair keys (`left·US·right`) of every pre-token
    * encoded under `ranks` — the trainer's per-iteration counting input.
    * Pairs never cross pre-token boundaries.
    */
  def pairKeys(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    preTokenize(text.toString).foreach { w =>
      val syms = encodeWord(w, ranks)
      var i = 0
      while (i < syms.length - 1) {
        out += UTF8String.fromString(syms(i) + US + syms(i + 1))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Merge-table wire form for the function-registry literal argument:
    * pairs as `left·US·right`, joined by RS (symbols can contain
    * neither — validated). Empty table ⟺ empty string.
    */
  def encodeMergesArg(merges: Seq[(String, String)]): String = {
    validateReplayable(merges)
    merges.map { case (l, r) => l + US + r }.mkString(String.valueOf(RS))
  }

  def decodeMergesArg(arg: String): Seq[(String, String)] =
    if (arg.isEmpty) Nil
    else arg.split(RS).toSeq.map { p =>
      val i = p.indexOf(US)
      (p.substring(0, i), p.substring(i + 1))
    }

  /** DuckDB SQL fragment replaying the encode of one pre-token bound to
    * `word`: wrap each character as RS·c·US, then apply the merges as
    * chained `replace()` calls in rank order — exactly the greedy
    * encode under the replayability invariant. The result is the
    * marker-wrapped symbol string; count tokens by counting RS markers.
    */
  def oracleReplaySql(merges: Seq[(String, String)], word: String): String = {
    // (?s): RE2's dot skips newlines by default, but a class-3
    // pre-token can contain one — an unwrapped char would silently
    // desync both the count (missing RS) and the fingerprint
    val wrapped =
      s"regexp_replace($word, '(?s)(.)', chr(30) || '\\1' || chr(31), 'g')"
    merges.foldLeft(wrapped) { case (acc, (l, r)) =>
      def lit(s: String) = "'" + s.replace("'", "''") + "'"
      s"replace($acc, chr(30) || ${lit(l)} || chr(31) || chr(30) || ${lit(r)} " +
        s"|| chr(31), chr(30) || ${lit(l + r)} || chr(31))"
    }
  }

  /** DuckDB SQL: the list of replayed (marker-wrapped) symbol strings,
    * one per pre-token of `textCol` — the shared scaffold of the count
    * and fingerprint oracles.
    */
  def oracleWordsSql(merges: Seq[(String, String)], textCol: String): String =
    s"list_transform(regexp_extract_all($textCol, " +
      s"'[a-z]+|[0-9]+|[^a-z0-9 ]+'), w -> ${oracleReplaySql(merges, "w")})"

  /** DuckDB SQL: BPE token count of a full `text` column — replay each
    * pre-token, count RS markers (one per token).
    */
  def oracleCountSql(merges: Seq[(String, String)], textCol: String): String =
    s"CAST(coalesce(list_sum(list_transform(" +
      s"${oracleWordsSql(merges, textCol)}, " +
      "s -> length(s) - length(replace(s, chr(30), '')))), 0) AS BIGINT)"

  /** DuckDB SQL: md5 fingerprint of the full marker-wrapped token
    * stream — pins every token STRING, not just the counts.
    */
  def oracleFingerprintSql(merges: Seq[(String, String)], textCol: String): String =
    s"md5(coalesce(list_aggregate(${oracleWordsSql(merges, textCol)}, " +
      "'string_agg', ''), ''))"

  /** COMPLETE DuckDB statement replaying a LARGE merge table: the
    * chained-replace oracle above nests one `replace()` per merge and
    * dies on the parser's expression-depth ceiling (~1000) long before a
    * real vocab; this one iterates a recursive CTE — depth O(1), one
    * `replace()` application per (distinct pre-token × rank) — and
    * replays over DISTINCT pre-tokens only, joining the replayed symbol
    * strings back to the per-document pre-token sequence by position.
    * Emits `($idCol, $countAlias, $fpAlias)` — cell-identical to the
    * engine's greedy encode by the replayability invariant (the same
    * proof the 48-merge oracle stands on; only the replay's execution
    * shape changed).
    */
  def oracleRecursiveSql(merges: Seq[(String, String)], table: String,
      idCol: String, textCol: String,
      countAlias: String, fpAlias: String): String = {
    require(merges.nonEmpty, "recursive replay oracle needs >= 1 merge")
    validateReplayable(merges)
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val vals = merges.zipWithIndex
      .map { case ((l, r), i) => s"($i, ${lit(l)}, ${lit(r)})" }
      .mkString(", ")
    val n = merges.size
    val pre = "'[a-z]+|[0-9]+|[^a-z0-9 ]+'"
    s"""WITH RECURSIVE
m(rank, l, r) AS (SELECT * FROM (VALUES $vals) t(rank, l, r)),
w(w) AS (SELECT DISTINCT unnest(regexp_extract_all($textCol, $pre)) FROM $table),
rep(w, s, k) AS (
  SELECT w, regexp_replace(w, '(?s)(.)', chr(30) || '\\1' || chr(31), 'g'), 0 FROM w
  UNION ALL
  SELECT rep.w,
         replace(rep.s, chr(30) || m.l || chr(31) || chr(30) || m.r || chr(31),
                 chr(30) || m.l || m.r || chr(31)),
         rep.k + 1
  FROM rep JOIN m ON m.rank = rep.k
  WHERE rep.k < $n),
fin AS (SELECT w, s FROM rep WHERE k = $n),
toks AS (
  SELECT $idCol, unnest(regexp_extract_all($textCol, $pre)) AS w,
         generate_subscripts(regexp_extract_all($textCol, $pre), 1) AS ord
  FROM $table),
agg AS (
  SELECT t.$idCol,
         CAST(sum(length(f.s) - length(replace(f.s, chr(30), ''))) AS BIGINT) AS n_toks,
         md5(string_agg(f.s, '' ORDER BY t.ord)) AS fp
  FROM toks t JOIN fin f ON f.w = t.w GROUP BY t.$idCol)
SELECT d.$idCol, coalesce(a.n_toks, 0) AS $countAlias,
       coalesce(a.fp, md5('')) AS $fpAlias
FROM $table d LEFT JOIN agg a USING ($idCol)"""
  }
}
