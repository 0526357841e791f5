package graft.operators.textual

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a documents table. All expressions are
  * codegen'd builtins evaluated per-row in the scan stage — no shuffle
  * except where an aggregation is the point (n-gram frequency). The exact
  * same character classes / stopword lists are mirrored in the DuckDB
  * oracles, so keep them explicit and locale-free. */
object TextStats {

  /** English-ish stopword list shared with the quality score and the
    * language-ID profiles. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private def countMatches(c: Column, regex: String): Column =
    length(c) - length(regexp_replace(c, regex, ""))

  /** Token counting: raw chars, whitespace tokens, BPE-ish regex tokens
    * (letter runs | digit runs | single non-alnum-non-space). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(split(trim(col(textCol)), "\\s+")).as("n_ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
        .as("n_bpe_tokens"))

  /** Quality scoring: alpha/digit/space/punct ratios, stopword ratio,
    * mean token length → weighted score in [0,1]. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bind toks once: HOF lambdas are interpreted and would otherwise
    // re-tokenize per filter evaluation (see SetSimJoin.shingleSets)
    val bound = docs.select(col(idCol), col(textCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val t = col(textCol)
    val toks = col("__toks")
    val nTok = size(toks)
    val nStop = size(filter(toks,
      x => StopwordsEn.map(s => x === lit(s)).reduce(_ || _)))
    val len = length(t).cast("double")
    val nAlpha = countMatches(t, "[A-Za-z]")
    val nDigit = countMatches(t, "[0-9]")
    val nSpace = countMatches(t, " ")
    val punctRatio = (len - nAlpha - nDigit - nSpace) / len
    val stopRatio = nStop.cast("double") / nTok
    val score =
      lit(0.4) * stopRatio +
      lit(0.3) * least(lit(1.0), nTok.cast("double") / 100) +
      lit(0.3) * (lit(1.0) - punctRatio)
    bound.select(
      col(idCol).as("doc_id"),
      nTok.as("n_tokens"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(nDigit.cast("double") / len, 6).as("digit_ratio"),
      round(score, 6).as("quality_score"))
  }

  /** Stopword-profile language ID: score each language by the count of
    * profile-word hits among the tokens; argmax with a fixed priority
    * order (en, de, fr, es, zh) for ties. Deterministic heuristic — the
    * honest baseline before a model-based classifier. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> StopwordsEn,
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "de", "y", "es", "una"),
    "zh" -> Seq.empty)

  def langId(docs: DataFrame, idCol: String, textCol: String,
      actualLangCol: String): DataFrame = {
    val bound = docs.select(col(idCol), col(actualLangCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> (if (words.isEmpty) lit(0)
               else size(filter(toks, x => words.map(s => x === lit(s)).reduce(_ || _))))
    }
    // argmax by score with declaration-order priority: fold right so
    // earlier languages win ties
    val best = scores.foldRight((lit("zh"), lit(-1).cast("int"))) {
      case ((lang, sc), (bLang, bSc)) =>
        (when(sc >= bSc, lit(lang)).otherwise(bLang),
         when(sc >= bSc, sc).otherwise(bSc))
    }
    bound.select(
      col(idCol).as("doc_id"),
      best._1.as("pred_lang"),
      col(actualLangCol).as("lang"),
      (best._1 === col(actualLangCol)).as("is_match"))
  }

  /** Corpus word-n-gram frequency with map-side combine; `minCount`
    * bounds the output (and `log`s nothing silently — the threshold is
    * part of the contract). */
  def ngramFreq(docs: DataFrame, textCol: String, n: Int, minCount: Long): DataFrame =
    docs.select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(TextFunctions.shinglesAll(col("__toks"), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
}
