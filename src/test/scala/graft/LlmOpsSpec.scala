package graft

import graft.operators.{Packing, Sampling}
import graft.operators.dedup.SegmentDedup
import graft.operators.textual.{Contamination, TextStats}
import org.apache.spark.sql.functions._

/** Specs for the round-4 LLM-pipeline operators: segment dedup, repetition
  * filters, contamination check, sequence packing, stratified sampling. */
class LlmOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("SegmentDedup drops corpus-wide duplicate segments keep-first") {
    // seg size 3: doc 0 = [a b c][d e f]; doc 1 repeats [a b c] then fresh;
    // doc 2 is entirely doc 0's segments → nothing kept
    val d = docs(
      0L -> "a b c d e f",
      1L -> "a b c x y z",
      2L -> "a b c d e f")
    val r = SegmentDedup.dedupSegments(d, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 2L, 0L)))
  }

  test("SegmentDedup drops within-doc repeats and md5s the reassembly") {
    val d = docs(7L -> "p q r p q r")
    val row = SegmentDedup.dedupSegments(d, "doc_id", "text", segTokens = 3).head()
    assert(row.getAs[Long]("n_segs") == 2 && row.getAs[Long]("n_kept") == 1)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("p q r".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("kept_md5") == expected)
  }

  test("repetition flags degenerate docs and keeps diverse ones") {
    val d = docs(
      1L -> "spam spam spam spam spam spam",
      2L -> "one two three four five six seven eight nine ten")
    val r = TextStats.repetition(d, "doc_id", "text",
        maxTopUnigram = 0.14, maxTopBigram = 0.2, maxDup5gram = 0.3)
      .orderBy("doc_id").collect()
    assert(!r(0).getAs[Boolean]("keep"), "degenerate doc must fail the filter")
    assert(r(0).getAs[Double]("top_unigram_frac") == 1.0)
    assert(r(0).getAs[Double]("dup_5gram_frac") > 0.0)
    assert(r(1).getAs[Boolean]("keep"), "diverse doc must pass the filter")
    assert(r(1).getAs[Double]("top_unigram_frac") == 0.1)
    assert(r(1).getAs[Double]("dup_5gram_frac") == 0.0)
  }

  test("contamination flags docs sharing an n-gram with the benchmark") {
    val bench = docs(100L -> "alpha beta gamma delta")
    val corpus = docs(
      1L -> "zzz alpha beta gamma delta yyy",  // contains the bench 4-gram
      2L -> "one two three four five six")
    val r = Contamination.check(corpus, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("flagged") && r(0).getAs[Long]("n_contaminated") == 1L)
    assert(!r(1).getAs[Boolean]("flagged") && r(1).getAs[Long]("n_contaminated") == 0L)
  }

  test("contamination counts DISTINCT grams per doc (GPT-3-style rule)") {
    val bench = docs(100L -> "alpha beta gamma delta")
    // the benchmark 4-gram occurs TWICE in doc 1; a repeated clean 4-gram
    // ('one two three four' ×2 via overlap-free repetition) in doc 2
    val corpus = docs(
      1L -> "alpha beta gamma delta xx alpha beta gamma delta",
      2L -> "one two three four zz one two three four")
    val r = Contamination.check(corpus, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    // doc 1: 6 distinct grams of its 6 positions... positions 1-6 give
    // grams: [abgd], [bgd,xx], [gd,xx,a], [d,xx,ab], [xx,abg], repeated
    // [abgd] — 5 distinct; exactly 1 contaminated (not 2), frac 1/5
    assert(r(0).getAs[Long]("n_grams") == 5L)
    assert(r(0).getAs[Long]("n_contaminated") == 1L)
    assert(r(0).getAs[Double]("contaminated_frac") == 0.2)
    // doc 2: 9 tokens → 6 positions, the wrap-around repeat of
    // 'one two three four' counts once → 5 distinct; nothing contaminated
    assert(r(1).getAs[Long]("n_grams") == 5L)
    assert(!r(1).getAs[Boolean]("flagged"))
  }

  test("spanClean cuts maximal cross-doc spans, reassembles the rest, " +
      "and passes short or unique docs through untouched") {
    val boiler = "X" * 10 // shared 10-char block
    val d = docs(
      (1L, "aaaa" + boiler + "bbbb"), // shared block mid-doc
      (2L, boiler + "cccc"),          // shared block at start
      (3L, "unique text here!"),      // no cross-doc gram
      (4L, "short"))                  // shorter than n: no positions
    val out = TextStats.spanClean(d, "doc_id", "text", n = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // every position of the 10-char block (and only it) is flagged in
    // docs 1 and 2: the maximal span covers exactly the block
    assert(out(1L) == (("aaaabbbb", 1L, 10L)))
    assert(out(2L) == (("cccc", 1L, 10L)))
    assert(out(3L) == (("unique text here!", 0L, 0L)))
    assert(out(4L) == (("short", 0L, 0L)))
  }

  test("spanClean: a fully duplicated doc cleans to empty; touching " +
      "flagged runs count as one span") {
    val t = "Z" * 12
    val d = docs((1L, t), (2L, t), (3L, "pad" + t + "pad"))
    val out = TextStats.spanClean(d, "doc_id", "text", n = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("", 1L, 12L)))
    assert(out(2L) == (("", 1L, 12L)))
    assert(out(3L) == (("padpad", 1L, 12L)))
  }

  test("suffixRanks: global lexicographic suffix order with prefix-first " +
      "and identical-suffix tie rules, exact vs brute force") {
    import graft.operators.textual.SuffixArray
    val d = docs((1L, "banana"), (2L, "ana"), (3L, "b"))
    val got = SuffixArray.suffixRanks(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // brute force: all suffixes sorted (string, doc, p)
    val suffixes = Seq((1L, "banana"), (2L, "ana"), (3L, "b")).flatMap {
      case (id, t) => (1 to t.length).map(p => (t.substring(p - 1), id, p))
    }.sorted
    val want = suffixes.zipWithIndex.map { case ((_, id, p), i) =>
      (id, p) -> (i + 1).toLong }.toMap
    assert(got == want)
    // the tie rule is exercised: "ana" (doc 1 p 4) == "ana" (doc 2 p 1)
    assert(got((1L, 4)) + 1 == got((2L, 1)))
    // prefix-first: "an" (doc 2 suffix at p=... none) — "a" < "ana" <
    // "anana": doc2 p3 "a" before doc1 p6 "a"? equal strings tie by doc:
    assert(got((1L, 6)) < got((2L, 3)))
  }

  test("lcpArray: max cross-doc lcp is the longest duplicated substring; " +
      "values match brute force") {
    import graft.operators.textual.SuffixArray
    val d = docs((1L, "xbananay"), (2L, "zbanan"), (3L, "qq"))
    val rows = SuffixArray.lcpArray(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    // brute force: sort suffixes, lcp with predecessor
    val sufs = Seq((1L, "xbananay"), (2L, "zbanan"), (3L, "qq")).flatMap {
      case (id, t) => (1 to t.length).map(p => (t.substring(p - 1), id, p))
    }.sorted
    def lcpOf(a: String, b: String): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.length.toLong
    sufs.zipWithIndex.foreach { case ((suf, id, p), i) =>
      val want =
        if (i == 0) (0L, false)
        else (lcpOf(suf, sufs(i - 1)._1), sufs(i - 1)._2 == id)
      assert(rows((id, p)) == want, s"suffix ($id,$p) '$suf'")
    }
    // the longest CROSS-doc duplicated substring is "banan" (len 5)
    val maxCross = rows.values.collect { case (l, false) => l }.max
    assert(maxCross == 5L, s"longest cross-doc duplicate length $maxCross")
  }

  test("selfClean cuts later in-doc repeats keep-first; cross-doc " +
      "duplication alone is untouched") {
    val rep = "R" * 10
    val d = docs(
      (1L, "aa" + rep + "bb" + rep + "cc"), // repeat within doc 1
      (2L, rep + "solo"),                   // shares rep with doc 1 only
      (3L, "no repeats here at all"))
    val out = TextStats.selfClean(d, "doc_id", "text", n = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: the SECOND block's gram positions are flagged
    // (the run covers the 10 chars of the second block)
    assert(out(1L) == (("aa" + rep + "bb" + "cc", 1L, 10L)), out(1L).toString)
    // doc 2 repeats nothing within itself — untouched despite the
    // cross-doc duplicate (that is spanClean's job, not selfClean's)
    assert(out(2L) == ((rep + "solo", 0L, 0L)))
    assert(out(3L) == (("no repeats here at all", 0L, 0L)))
  }

  test("normalize: casefold + accent fold + punctuation separation; " +
      "variants of one sentence share a fingerprint") {
    val d = docs(
      (1L, "Héllo,   Wörld! 42"),
      (2L, "hello world 42"),
      (3L, "HELLO--WORLD...42"),
      (4L, "different text"),
      (5L, "!!!"))
    val out = TextStats.normalize(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L)._1 == "hello world 42")
    assert(out(2L)._1 == "hello world 42" && out(3L)._1 == "hello world 42")
    // ö is outside the accent table -> stripped as punctuation? No:
    // ö IS in the table (maps to o); é maps to e — 1,2,3 all equal
    assert(out(1L)._2 == out(2L)._2 && out(2L)._2 == out(3L)._2,
      "canonical variants must share a dedup fingerprint")
    assert(out(4L)._2 != out(1L)._2)
    assert(out(1L)._3 == 3L)
    assert(out(5L) == (("", out(5L)._2, 0L)), "all-punctuation doc -> empty")
  }

  test("gopher rules: each rule fires on a crafted violator, a clean " +
      "prose doc passes") {
    val prose = (("the quick brown fox jumps over and over with great " +
      "delight because that is what foxes have to be doing ") * 3).trim
    val d = docs(
      (1L, prose),                                   // clean: passes
      (2L, "short text with the and of"),            // < 50 words
      (3L, prose + " ###### # # # # # # # # # # # # # # # # # # #"), // symbols
      (4L, (1 to 60).map(_ => "- bullet line").mkString("\n")), // bullets
      (5L, prose.replaceAll("[a-z]+", "12345")))     // no alpha words
    val out = TextStats.gopher(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    assert(out(1L), "clean prose must pass")
    assert(!out(2L) && !out(3L) && !out(4L) && !out(5L),
      s"violators passed: $out")
  }

  test("piiScrub counts and masks emails, phones, and IPs") {
    import graft.operators.textual.TextStats
    val d = Seq(
      (1L, "mail a@b.co and bob.smith+tag@corp.example.org twice"),
      (2L, "call +15551234567 or visit 192.168.0.1 now"),
      (3L, "clean text with no identifiers at all")).toDF("doc_id", "text")
    val r = TextStats.piiScrub(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_emails") == 2 && r(0).getAs[Int]("n_phones") == 0)
    assert(r(1).getAs[Int]("n_phones") == 1 && r(1).getAs[Int]("n_ips") == 1)
    assert(r(2).getAs[Int]("n_emails") + r(2).getAs[Int]("n_phones") +
      r(2).getAs[Int]("n_ips") == 0)
    // masking really replaces: digest of doc 2 equals digest of the
    // hand-masked twin
    val masked = Seq((2L, "call [PHONE] or visit [IP] now")).toDF("doc_id", "text")
    val want = TextStats.piiScrub(masked, "doc_id", "text")
      .select("scrubbed_md5").head().getString(0)
    assert(r(1).getAs[String]("scrubbed_md5") == want)
  }

  test("lineFilter drops short/boilerplate/code lines, keeps prose") {
    import graft.operators.textual.TextStats
    val text = Seq(
      "this is a perfectly reasonable prose line to keep",
      "tiny",
      "another line with lorem ipsum inside it somewhere",
      "if (x) { return y; } code line with braces kept long",
      "and one more good closing sentence with enough words").mkString("\n")
    val r = TextStats.lineFilter(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(r.getAs[Int]("n_lines") == 5 && r.getAs[Int]("n_kept") == 2)
    assert(!r.getAs[Boolean]("keep")) // 2/5 < 0.5
  }

  test("packBins: bin boundaries follow the running token total") {
    // identity order → docs pack in id order. Capacity 10, sizes 4,4,4,4:
    // concat offsets 0,4,8,12 → bins 0,0,0,1 with in-bin offsets 0,4,8,2
    val d = Seq((1L, "s", 4L), (2L, "s", 4L), (3L, "s", 4L), (4L, "s", 4L))
      .toDF("id", "shard", "n")
    val r = Packing.packBins(d, "id", "shard", "n", capacity = 10, order = identity)
      .orderBy("id").select("bin_idx", "offset_tokens").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 0L), (0L, 4L), (0L, 8L), (1L, 2L)))
  }

  test("packBins is stable under repartitioning") {
    val d = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
    val a = Packing.packBins(d, "doc_id", "lang", "n", 512)
      .select("doc_id", "bin_idx").as[(Long, Long)].collect().toMap
    val b = Packing.packBins(d.repartition(13), "doc_id", "lang", "n", 512)
      .select("doc_id", "bin_idx").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("weightedMix: upsampled keys repeat, downsampled keys thin, exact integer rule") {
    val d = (1L to 1000L).map(i => (i, if (i % 2 == 0) "hi" else "lo"))
      .toDF("id", "key")
    val r = Sampling.weightedMix(d, "id", "key",
      ppmWeights = Map("hi" -> 2500000L, "lo" -> 300000L))
      .groupBy("key").agg(count(lit(1)).as("n"),
        max("copy_idx").as("maxc"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, m) => k -> (n, m) }.toMap
    // hi: every row gets 2 copies + ~half a third → n in [1000, 1500]
    val (nHi, maxHi) = r("hi")
    assert(maxHi == 3 && nHi > 1000 && nHi < 1500, s"hi=$nHi/$maxHi")
    // lo: ~30% of rows, single copies
    val (nLo, maxLo) = r("lo")
    assert(maxLo == 1 && nLo > 100 && nLo < 200, s"lo=$nLo/$maxLo")
    // deterministic under repartitioning
    val a = Sampling.weightedMix(d, "id", "key", Map("hi" -> 2500000L, "lo" -> 300000L))
      .select("id", "copy_idx").as[(Long, Long)].collect().toSet
    val b = Sampling.weightedMix(d.repartition(7), "id", "key",
        Map("hi" -> 2500000L, "lo" -> 300000L))
      .select("id", "copy_idx").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("tokenBudget: bucketed prefix sum equals the single-window " +
      "reference, budget is a hard cap, stable under repartitioning") {
    import org.apache.spark.sql.expressions.Window
    val d = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b", (i % 17) + 1))
      .toDF("id", "src", "n_tok")
    val budgets = Seq(("a", 300L), ("b", 500L)).toDF("src", "budget")
    val got = Sampling.tokenBudget(d, "id", "src", "n_tok", budgets)
      .select(col("id"), col("cum_tokens")).as[(Long, Long)].collect().toMap
    // reference: one window per source over the same admission order
    val w = Window.partitionBy("src")
      .orderBy(Sampling.knuthBucket(col("id"), 64),
        Sampling.knuthBucket(col("id"), 1000000), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = d.withColumn("cum", sum("n_tok").over(w))
      .join(budgets, "src").where(col("cum") <= col("budget"))
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == ref)
    // kept tokens never exceed the budget; the cut actually bit
    val tot = Sampling.tokenBudget(d, "id", "src", "n_tok", budgets)
      .groupBy("src").agg(sum("n_tok").as("t")).as[(String, Long)]
      .collect().toMap
    assert(tot("a") <= 300L && tot("b") <= 500L)
    val full = d.groupBy("src").agg(sum("n_tok").as("t"))
      .as[(String, Long)].collect().toMap
    assert(full("a") > 300L && full("b") > 500L,
      "fixture must exceed its budgets or the cap is untested")
    // membership is a pure function of (id, counts, budgets)
    val again = Sampling.tokenBudget(d.repartition(7), "id", "src", "n_tok",
        budgets)
      .select(col("id"), col("cum_tokens")).as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("shardByTokens: matches the single-window reference, shards are " +
      "contiguous full runs, stable under repartitioning") {
    import org.apache.spark.sql.expressions.Window
    val d = (1L to 400L).map(i => (i, (i % 23) + 1)).toDF("id", "n_tok")
    val B = 150L
    val got = Sampling.shardByTokens(d, "id", "n_tok", shardTokens = B)
      .select(col("id"), col("n_tok"), col("cum_tokens"), col("shard_id"))
      .as[(Long, Long, Long, Long)].collect()
    // reference: one global window over the same admission order
    val w = Window.orderBy(Sampling.knuthBucket(col("id"), 64),
        Sampling.knuthBucket(col("id"), 1000000), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = d.withColumn("cum", sum("n_tok").over(w))
      .withColumn("sid", expr(s"(cum - n_tok) div $B"))
      .select(col("id"), col("n_tok"), col("cum"), col("sid"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSet == ref.toSet)
    // shard ids dense from 0; each document starts inside its shard's
    // token span, so shards are contiguous runs of the shuffle order
    val byShard = got.groupBy(_._4).toSeq.sortBy(_._1)
    assert(byShard.size > 1, "fixture must span several shards")
    assert(byShard.map(_._1) == (0L until byShard.size.toLong),
      "shard ids must be dense from 0")
    got.foreach { case (id, n, cum, sid) =>
      val start = cum - n
      assert(start >= sid * B && start < (sid + 1) * B,
        s"doc $id starts at $start outside shard $sid")
    }
    val again = Sampling.shardByTokens(d.repartition(7), "id", "n_tok", B)
      .select(col("id"), col("n_tok"), col("cum_tokens"), col("shard_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(again.toSet == got.toSet)
  }

  test("QualityClassifier recovers a planted linear rule, deterministic, " +
      "loud on single-class slices") {
    import graft.operators.textual.QualityClassifier
    val rows = (1L to 400L).map { i =>
      val a = (i % 20) / 20.0
      val b = ((i * 7) % 20) / 20.0
      (i, a, b, a - b >= 0.0)
    }
    val df = rows.toDF("id", "a", "b", "y")
    val m = QualityClassifier.train(
      df.where(col("id") % 2 === 0), "id", Seq("a", "b"), "y")
    val acc = QualityClassifier.accuracy(
      QualityClassifier.score(df.where(col("id") % 2 =!= 0), m), "y")
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // learned direction matches the rule a - b >= 0
    assert(m.weights(0) > 0 && m.weights(1) < 0, m.weights.toSeq)
    // deterministic retrain
    val m2 = QualityClassifier.train(
      df.where(col("id") % 2 === 0), "id", Seq("a", "b"), "y")
    assert(m.weights.toSeq == m2.weights.toSeq && m.bias == m2.bias)
    // a single-class train slice cannot silently "learn"
    intercept[IllegalArgumentException] {
      QualityClassifier.train(df.where(col("y")), "id", Seq("a", "b"), "y")
    }
  }

  test("stratifiedSample keeps small strata whole and bounds large ones") {
    val d = (1L to 2000L).map(i => (i, if (i <= 30) "small" else "big"))
      .toDF("id", "stratum")
    val r = Sampling.stratifiedSample(d, "id", "stratum", target = 100)
      .groupBy("stratum").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(r("small") == 30, "under-target stratum must be kept whole")
    // hash threshold is rate-accurate, not exact-count: allow 35% slack
    assert(r("big") > 65 && r("big") < 135, s"big stratum sampled ${r("big")}")
  }

  test("BM25: tf saturation, rarity weighting, length normalization") {
    import graft.operators.textual.Bm25
    val d = docs(
      (0L, "cat cat cat dog"),   // tf(cat)=3, dl=4
      (1L, "cat dog dog dog"),   // tf(cat)=1, dl=4
      (2L, "cat fish"),          // tf(cat)=1, dl=2 (shorter doc)
      (3L, "fish fish fish fish"))
    val out = Bm25.scoreTerms(d, "doc_id", "text", Seq("cat", "fish"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // higher tf outranks lower tf at equal length
    assert(out(("cat", 0L))._3 < out(("cat", 1L))._3)
    // shorter doc outranks equal-tf longer doc (length normalization)
    assert(out(("cat", 2L))._3 < out(("cat", 1L))._3)
    // rarer term (fish: df 2 of 4) scores higher than common (cat: df 3)
    // at comparable tf/dl — compare doc 2's single occurrence of each
    assert(out(("fish", 2L))._2 > out(("cat", 2L))._2)
    // absent (term, doc) pairs never emit
    assert(!out.contains(("fish", 0L)) && !out.contains(("cat", 3L)))
  }

  test("RRF: both-sides docs outrank one-sided at equal ranks; exact values") {
    import graft.operators.similarity.Hybrid
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Hybrid.rrf(a, b, k = 10).collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    // doc 10: 1/61 + 1/62; doc 12: 1/61; doc 11: 1/62 — exact to 6 dp
    assert(out(10L)._1 == BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(10L)._2 == 1 && out(12L)._2 == 2 && out(11L)._2 == 3)
  }
}
