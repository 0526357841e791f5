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

  /** PII detection patterns — explicit, locale-free, and RE2-compatible
    * (no backreferences/lookaround) so the DuckDB oracle evaluates the
    * IDENTICAL regexes. Deliberately conservative: emails, international-
    * ish phone digit runs, dotted-quad IPs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{7,15}"
  val Ipv4Re  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

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

  /** Top-k TF-IDF terms per document: tf from the per-doc term counts,
    * idf = ln(N/df) from the corpus document frequencies. Two shuffles
    * (doc-term agg, term df agg) + a broadcast of the tiny df table; the
    * scalar N rides along as a cross-joined 1-row frame. Ranking on the
    * rounded score with a term tiebreak keeps results engine-portable. */
  def tfidfTop(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(col("__toks")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("dfreq")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rk"))
  }

  /** Token-window chunking (LLM preprocessing): windows of `window`
    * tokens with `stride` steps; the last window may be partial. Pure
    * per-row array work — no shuffle, chunk explosion bounded by
    * len/stride. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0)
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"(size(__toks) - 1) div $stride")),
          i => concat_ws(" ", slice(col("__toks"), i * stride + 1, lit(window)))))
          .as(Seq("chunk_idx", "chunk_text")))
  }

  /** Token-distribution entropy + repetition ratio per document — the
    * Gopher/C4-style quality signals that catch boilerplate and
    * degenerate repetition in training corpora. Shannon entropy over the
    * token frequency distribution is computed in ONE aggregation pass via
    * H = log2(n) − (Σ c·log2 c)/n (no second join for the totals), and
    * repetition = 1 − distinct/total. All codegen builtins. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log2(col("c"))).as("__clog"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log2(col("n_tokens")) - col("__clog") / col("n_tokens"), 4)
          .as("entropy"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("repetition"))

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.2): fraction of
    * the document covered by its most frequent unigram / bigram, and the
    * fraction of duplicated 5-grams — the signals that kill boilerplate,
    * keyword stuffing, and degenerate generation loops. Three bounded
    * per-doc aggregations (gram sizes need different explode widths)
    * joined on doc_id; each is a map-side-combined groupBy, so total cost
    * is O(tokens), never O(pairs). `keep` applies the filter rule. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
      maxTopUnigram: Double = 0.14, maxTopBigram: Double = 0.08,
      maxDup5gram: Double = 0.30): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
    def gramStats(n: Int, agg: DataFrame => DataFrame): DataFrame = {
      val grams =
        if (n == 1) base.select(col("doc_id"), explode(col("__toks")).as("g"))
        else base.select(col("doc_id"),
          explode(TextFunctions.shinglesAll(col("__toks"), n)).as("g"))
      agg(grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c")))
    }
    val uni = gramStats(1, _.groupBy("doc_id")
      .agg(sum("c").as("__n1"), max("c").as("__top1")))
    val bi = gramStats(2, _.groupBy("doc_id")
      .agg(sum("c").as("__n2"), max("c").as("__top2")))
    val five = gramStats(5, _.groupBy("doc_id")
      .agg(sum("c").as("__n5"), count(lit(1)).as("__d5")))
    val top1 = round(col("__top1").cast("double") / col("__n1"), 6)
    // short docs produce no bigrams/5-grams: no repetition evidence → 0
    val top2 = coalesce(round(col("__top2").cast("double") / col("__n2"), 6), lit(0.0))
    val dup5 = coalesce(
      round(lit(1.0) - col("__d5").cast("double") / col("__n5"), 6), lit(0.0))
    uni.join(bi, Seq("doc_id"), "left").join(five, Seq("doc_id"), "left")
      .select(col("doc_id"),
        top1.as("top_unigram_frac"),
        top2.as("top_bigram_frac"),
        dup5.as("dup_5gram_frac"),
        (top1 <= maxTopUnigram && top2 <= maxTopBigram && dup5 <= maxDup5gram)
          .as("keep"))
  }

  /** Corpus word-n-gram frequency with map-side combine; `minCount`
    * bounds the output (and `log`s nothing silently — the threshold is
    * part of the contract). */
  /** PII scrubbing (the redaction pass every published LLM data pipeline
    * runs before training): count and mask emails, phone numbers, and
    * IPv4 addresses. One codegen'd projection — three regexp counts plus
    * a chained regexp_replace; no shuffle, no UDF. The scrubbed text is
    * emitted as an md5 so downstream equality checks stay metadata-sized.
    * Masks use C4/Dolma-style fixed tags. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
    docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).as("n_ips"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** C4-style line filtering (Raffel et al. 2020 §2.2 heuristics, the
    * line-level stage of C4/Dolma cleaning): a line is kept iff it has at
    * least `minWords` words and contains no banned fragment (code braces,
    * boilerplate phrases). Per-document: line counts and the keep
    * decision at `keepFrac`. Array ops on the split text — per-row, no
    * explode, no shuffle. */
  def lineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, banned: Seq[String] = Seq("lorem ipsum", "{"),
      keepFrac: Double = 0.5): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => {
      val words = size(split(trim(l), "\\s+")) >= minWords
      banned.map(b => !contains(lower(l), lit(b))).foldLeft(words)(_ && _)
    })
    docs.select(
      col(idCol).as("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      round(size(kept).cast("double") / size(lines), 6).as("kept_frac"),
      (size(kept).cast("double") / size(lines) >= keepFrac).as("keep"))
  }

  def ngramFreq(docs: DataFrame, textCol: String, n: Int, minCount: Long): DataFrame =
    docs.select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(TextFunctions.shinglesAll(col("__toks"), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)

  /** EXACT duplicated-span detection (the oracle-able core of Lee et
    * al. 2022's exact-substring dedup): every character position whose
    * length-`n` gram appears in MORE THAN ONE document is a duplicated
    * position — a position-level map of verbatim cross-document text
    * (boilerplate, licenses, mirrored articles) that winnowing (tx8)
    * only samples. Fixed-length grams instead of maximal substrings is
    * what makes the computation a pair of keyed aggregations: explode
    * positions → count distinct docs per gram (THE shuffle, keyed by
    * gram — at 100 TB this is the shard-by-hash(gram) job, ~n bytes per
    * position) → join back → per-doc counts. A maximal-substring span
    * is a run of flagged positions, recoverable downstream without
    * another global pass. Emits (doc_id, n_positions, n_dup_positions);
    * docs shorter than `n` carry no positions and are excluded (same
    * WHERE on both engines). */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    duplicatedSpansFrom(docs, idCol, textCol, n,
      crossDocFlagged(docs, idCol, textCol, n))

  /** The FLAGGED cross-document duplicated gram starts (doc_id, p) —
    * the shared artifact of the exact-substring family: the map
    * ([[duplicatedSpansFrom]]) and the cleaner ([[spanCleanFrom]]) both
    * derive from it, so a pipeline computing both pays the gram shuffle
    * ONCE (cache the returned frame). */
  def crossDocFlagged(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = graft.operators.IndexScope.scoped { sc =>
    require(n >= 2, "span grams need n >= 2")
    val grams = sc.index(gramHashes(docs, idCol, textCol, n))
    val dup = grams.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") > 1).select("gh")
    grams.join(dup, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("p"))
  }

  /** [[duplicatedSpans]] from a precomputed flagged frame: per-doc
    * totals come straight from the text length (a projection — the
    * gram table is never re-built). */
  def duplicatedSpansFrom(docs: DataFrame, idCol: String, textCol: String,
      n: Int, flagged: DataFrame): DataFrame =
    docs.where(length(col(textCol)) >= n)
      .select(col(idCol).as("doc_id"),
        (length(col(textCol)) - (n - 1)).cast("long").as("n_positions"))
      .join(flagged.groupBy("doc_id")
        .agg(count(lit(1)).as("__nd")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_positions"),
        coalesce(col("__nd"), lit(0L)).cast("long").as("n_dup_positions"))

  /** Every gram position, keyed by the gram's 64-bit hash instead of its
    * raw `n` characters: THE shuffle of exact-substring dedup then
    * carries 8 bytes per position instead of `n` (~5× lighter at n=40,
    * the difference between a 4 PB and an 0.8 PB shuffle at 100 TB).
    * Cross-doc equality is all the downstream count-distinct needs, and
    * a 64-bit collision (≈ P²/2⁶⁵ for P positions — quantifiable, ~1e-6
    * even at 10⁷ positions) can only FLAG an extra position, never hide
    * one. */
  private[graft] def gramHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = docs
    .where(length(col(textCol)) >= n)
    .select(col(idCol).as("doc_id"),
      explode(sequence(lit(1), length(col(textCol)) - (n - 1))).as("p"),
      col(textCol).as("__t"))
    .select(col("doc_id"), col("p"),
      xxhash64(expr(s"substring(__t, p, $n)")).as("gh"))

  /** SPAN-LEVEL CORPUS CLEANING — the consuming end of
    * [[duplicatedSpans]]'s map (Lee et al. 2022 exact-substring dedup,
    * completed): flagged gram starts merge into MAXIMAL duplicated
    * spans, the spans are cut, and each document is re-assembled from
    * its surviving segments. Per doc: the cleaned text, the number of
    * maximal spans cut, and the characters removed. Docs shorter than
    * `n` (no gram positions) pass through unchanged — the output is the
    * whole corpus, cleaned.
    *
    * Shape: one gram-hash-keyed shuffle (shared with the map), one
    * bounded `collect_list` of flagged starts per doc (≤ doc length),
    * then PER-ROW higher-order functions do the interval merge and the
    * segment reassembly — no second global pass, no per-character
    * explode, codegen-free aggregate lambdas only where row-local. */
  def spanClean(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    cutFlaggedSpans(docs, idCol, textCol,
      crossDocFlagged(docs, idCol, textCol, n), n)

  /** [[spanClean]] from a precomputed flagged frame. */
  def spanCleanFrom(docs: DataFrame, idCol: String, textCol: String,
      n: Int, flagged: DataFrame): DataFrame =
    cutFlaggedSpans(docs, idCol, textCol, flagged, n)

  /** WITHIN-document exact self-dedup — the same span machinery, but a
    * position is flagged when its n-gram occurred EARLIER in the SAME
    * document (keep-first): the char-exact cure for boilerplate
    * repetition inside one doc, where [[spanClean]] handles
    * cross-document duplication and dd11's segment dedup works at
    * paragraph granularity. One (doc, gram-hash) keyed aggregation
    * finds each gram's first occurrence; later occurrences' runs merge
    * into maximal spans and are cut. */
  def selfClean(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = graft.operators.IndexScope.scoped { sc =>
    require(n >= 2, "span grams need n >= 2")
    val grams = sc.index(gramHashes(docs, idCol, textCol, n))
    val first = grams.groupBy("doc_id", "gh").agg(min(col("p")).as("__fp"))
    val flagged = grams.join(first, Seq("doc_id", "gh"))
      .where(col("p") > col("__fp"))
      .select(col("doc_id"), col("p"))
    cutFlaggedSpans(docs, idCol, textCol, flagged, n)
  }

  /** GOPHER QUALITY RULES (Rae et al. 2021, Appendix A) — the named
    * rule set production pre-training filters actually run, distinct
    * from [[quality]]'s generic score: word-count bounds, mean word
    * length bounds, symbol-to-word ratio (# / ellipsis), bullet-line
    * and ellipsis-line fractions, alphabetic-word fraction, and the
    * required-stopword presence count, plus the conjunction `pass`.
    * Every metric is a per-row array/regex projection — no shuffle, no
    * UDF; thresholds are the paper's. */
  def gopher(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val lines = split(col(textCol), "\n")
    val bound = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"),
      words.as("__w"), lines.as("__l"))
    val nWords = size(col("__w"))
    val meanLen = expr("aggregate(__w, 0L, (a, w) -> a + length(w))")
      .cast("double") / nWords
    val symbols = countMatches(col("__t"), "#") +
      countMatches(col("__t"), "\\.\\.\\.") + countMatches(col("__t"), "…")
    val symbolRatio = symbols.cast("double") / nWords
    val bulletFrac = expr(
      "size(filter(__l, l -> substring(trim(l), 1, 1) IN ('-', '*', '•')))")
      .cast("double") / size(col("__l"))
    val ellipsisFrac = expr(
      "size(filter(__l, l -> right(trim(l), 3) = '...' OR right(trim(l), 1) = '…'))")
      .cast("double") / size(col("__l"))
    val alphaFrac = expr("size(filter(__w, w -> w rlike '[A-Za-z]'))")
      .cast("double") / nWords
    val reqStops = expr("size(filter(" +
      "array('the','be','to','of','and','that','have','with'), " +
      "s -> array_contains(transform(__w, w -> lower(w)), s)))")
    bound.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      reqStops.cast("long").as("n_req_stops"),
      (nWords >= 50 && nWords <= 100000 &&
        meanLen >= 3 && meanLen <= 10 &&
        symbolRatio <= 0.1 &&
        bulletFrac <= 0.1 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && reqStops >= 2).as("pass"))
  }

  /** TEXT CANONICALIZATION for dedup keys (the normalize-before-hash
    * step every production dedup runs — CCNet/C4 lowercase+strip):
    * casefold, map common accented letters to their base (a fixed
    * translate table — full NFKC needs ICU, absent here by design),
    * replace everything outside [a-z0-9 space] with a space (punctuation
    * separates, never concatenates words), collapse runs, trim. Emits
    * the canonical text, its md5 fingerprint (the engine-portable dedup
    * key dd2 uses), and the token count. One codegen projection — no
    * shuffle, no UDF. */
  def normalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val accentsFrom = "áàâäãåéèêëíìîïóòôöõúùûüçñýÿ"
    val accentsTo = "aaaaaaeeeeiiiiooooouuuucnyy"
    val canon = trim(regexp_replace(
      regexp_replace(
        translate(lower(col(textCol)), accentsFrom, accentsTo),
        "[^a-z0-9 ]", " "),
      " +", " "))
    docs.select(col(idCol).as("doc_id"),
      canon.as("norm_text"),
      md5(canon).as("fingerprint"),
      when(canon === "", lit(0))
        .otherwise(size(split(canon, " "))).cast("long").as("n_tokens"))
  }

  /** Shared span-cutting tail of [[spanClean]]/[[selfClean]]: flagged
    * (doc_id, p) gram starts merge into maximal spans per doc (each
    * start covers [p, p+n-1], touching spans merge — a contiguous run
    * of duplicated characters is ONE cut), the spans are cut, and each
    * document reassembles from its kept segments. Row-local HOF
    * aggregates, no per-character explode. */
  private def cutFlaggedSpans(docs: DataFrame, idCol: String,
      textCol: String, flagged: DataFrame, n: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val perDoc = flagged
      .groupBy("doc_id").agg(sort_array(collect_list(col("p"))).as("ps"))
    val spans = expr(s"""
      aggregate(coalesce(ps, cast(array() as array<int>)),
        cast(array() as array<struct<s: int, e: int>>),
        (acc, p) -> CASE
          WHEN size(acc) > 0 AND p <= element_at(acc, -1).e + 1
          THEN concat(slice(acc, 1, size(acc) - 1),
            array(named_struct('s', element_at(acc, -1).s,
              'e', greatest(element_at(acc, -1).e, p + ${n - 1}))))
          ELSE concat(acc, array(named_struct('s', p, 'e', p + ${n - 1})))
          END)""")
    // one forward pass over the spans stitches the kept segments
    val clean = expr("""
      aggregate(__spans,
        named_struct('last', 0, 'acc', ''),
        (st, sp) -> named_struct('last', sp.e,
          'acc', concat(st.acc, substring(__t, st.last + 1, sp.s - st.last - 1))),
        st -> concat(st.acc, substring(__t, st.last + 1, length(__t) - st.last)))""")
    base.join(perDoc, Seq("doc_id"), "left")
      .withColumn("__spans", spans)
      .select(col("doc_id"),
        clean.as("clean_text"),
        size(col("__spans")).cast("long").as("n_cut_spans"),
        expr("aggregate(__spans, 0, (a, sp) -> a + sp.e - sp.s + 1)")
          .cast("long").as("n_dup_chars"))
  }
}
