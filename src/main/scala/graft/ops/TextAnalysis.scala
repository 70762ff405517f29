package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * The hot paths are native codegen'd Catalyst expressions
  * (graft.functions.TextExprs): one pass over the string, inside whole-stage
  * codegen, no per-token array allocation. The Spark higher-order-function
  * forms kept below (suffix `Hof`) are CodegenFallback — round 1 measured
  * them 1–2 orders of magnitude slower (q_lang_id 74.6 s vs <1 s for 5k
  * docs) — and now serve only as spec-level cross-checks of the native
  * expressions. At 100 TB the scan stays a map-only pipelined stage with
  * column pruning (only `text` is read).
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  def tokens(text: Column): Column = split(text, " ")

  /** Token/char/stopword stats + ratios (exact integer arithmetic, one final
    * double division — oracle-parity safe). */
  def withTokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val nTok = TextExprs.token_count(col(textCol))
    val nStop = TextExprs.token_set_count(col(textCol), Stopwords)
    df.withColumn("n_tokens", nTok)
      .withColumn("n_chars_seen", length(col(textCol)))
      .withColumn("n_stopwords", nStop)
      .withColumn("stopword_ratio", nStop.cast("double") / nTok.cast("double"))
      // avg token length: (chars - separators) / tokens, all exact ints
      .withColumn("avg_token_len",
        (length(col(textCol)).cast("double") - nTok.cast("double") + lit(1).cast("double"))
          / nTok.cast("double"))
  }

  /** Stopword-profile language-ID heuristic: score each language by hits of
    * its marker words; argmax wins (deterministic tie-break by list order). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def withLangId(df: DataFrame, textCol: String = "text", out: String = "lang_pred"): DataFrame =
    df.withColumn(out, TextExprs.lang_id(col(textCol), LangMarkers))

  /** HOF reference form of withLangId — spec cross-check only (slow). */
  def withLangIdHof(df: DataFrame, textCol: String = "text", out: String = "lang_pred"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = LangMarkers.foldLeft(df) { case (acc, (lang, markers)) =>
      acc.withColumn(s"__s_$lang", size(filter(toks, t => t.isin(markers.map(lit): _*))))
    }
    // fold builds last-wins, so iterate reversed: the FIRST maximal language wins
    val best = LangMarkers.map(_._1).reverse.foldLeft(lit("und")) { (acc, lang) =>
      when(col(s"__s_$lang") === greatest(LangMarkers.map(l => col(s"__s_${l._1}")): _*) &&
        col(s"__s_$lang") > 0, lit(lang)).otherwise(acc)
    }
    scored.withColumn(out, best).drop(LangMarkers.map(l => s"__s_${l._1}"): _*)
  }

  /** Composite document-quality gate (the C4/Gopher-style rule stack, kept
    * integer-exact): one point each for sane token count, sane stopword
    * ratio, and confident language id; keep docs scoring >= minScore.
    * All comparisons are on exact ints (the ratio check is cross-multiplied
    * to integers) so the filter is bit-stable across engines. */
  def qualityFiltered(df: DataFrame, textCol: String = "text", minScore: Int = 2): DataFrame = {
    val nTok = TextExprs.token_count(col(textCol))
    val nStop = TextExprs.token_set_count(col(textCol), Stopwords)
    val lang = TextExprs.lang_id(col(textCol), LangMarkers)
    // 0.01 <= nStop/nTok <= 0.6  ⇔  nStop*100 >= nTok && nStop*10 <= nTok*6
    val score =
      when(nTok.between(5, 5000), 1).otherwise(0) +
      when(nStop * 100 >= nTok && nStop * 10 <= nTok * 6, 1).otherwise(0) +
      when(lang === "en", 1).otherwise(0)
    df.withColumn("quality_score", score)
      .withColumn("n_tokens", nTok)
      .filter(col("quality_score") >= minScore)
  }

  /** Deterministic document fingerprint: order-sensitive polynomial hash over
    * token hashes (a rolling-hash analog) — cross-engine reproducible (no
    * murmur dependence). Native one-pass codegen'd expression. */
  def fingerprint(text: Column): Column = TextExprs.doc_fingerprint(text)

  /** HOF reference form of [[fingerprint]] — spec cross-check only. */
  def fingerprintHof(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(131L) + graft.functions.TokHash.tok_hash(t), lit(1000003L)))

  def withFingerprint(df: DataFrame, textCol: String = "text", out: String = "fingerprint"): DataFrame =
    df.withColumn(out, fingerprint(col(textCol)))
}
