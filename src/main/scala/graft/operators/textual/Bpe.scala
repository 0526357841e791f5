package graft.operators.textual

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Byte-pair-encoding tokenizer — the trainable artifact behind REAL
  * token counts (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the public BPE).
  * Until now every budget/packing consumer (tx6/tx16/tx26/q41) counted
  * whitespace tokens; a real run budgets by its actual subword
  * vocabulary. The artifact pattern mirrors [[Perplexity]]:
  * TRAIN on a bounded sample (driver-side — the sample is metadata-sized
  * next to a 100 TB corpus, and training is inherently iterative),
  * PERSIST the merge list as a transactional table, LOAD + broadcast
  * (KB-sized) and APPLY distributedly.
  *
  * Scheme: standard word-internal BPE. Words are whitespace tokens; a
  * word starts as its character sequence with `</w>` appended to the
  * final character; training greedily merges the most frequent adjacent
  * symbol pair (ties broken lexicographically — DETERMINISTIC, so two
  * trainings of the same sample produce byte-identical vocabularies).
  * Encoding applies merges lowest-rank-first (the canonical apply);
  * decode concatenates and turns `</w>` back into spaces, so
  * decode(encode(t)) == whitespace-normalized t — the round-trip
  * identity the gates pin.
  *
  * Reference analogue: the reference truncates text fields by raw
  * length (core/formatters.py caps); a training pipeline budgets by
  * tokenizer counts, which is this operator's job. */
object Bpe {

  private val EndW = "</w>"

  final case class Vocab(merges: Seq[(String, String)]) {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Canonical BPE apply: repeatedly merge the present pair with the
      * LOWEST rank until none of the word's adjacent pairs is in the
      * vocabulary. Leftmost-first within a rank (single pass rebuild). */
    def encodeWord(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      var syms: Vector[String] =
        if (w.length == 1) Vector(w + EndW)
        else w.dropRight(1).map(_.toString).toVector :+ (w.last.toString + EndW)
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, r) = merges(best)
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              out += (l + r); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }

    def encode(text: String): Seq[String] = words(text).flatMap(encodeWord)

    def countTokens(text: String): Long = {
      // counting needs no token materialization
      var n = 0L
      words(text).foreach(w => n += encodeWord(w).length)
      n
    }

    def decode(tokens: Seq[String]): String =
      tokens.mkString("").replace(EndW, " ").trim
  }

  def words(text: String): Seq[String] =
    Option(text).getOrElse("").trim.split("\\s+")
      .filter(_.nonEmpty).toIndexedSeq

  /** Whitespace-normalized form — the exact string decode(encode(t))
    * reconstructs (BPE is defined over words; inter-word whitespace is
    * not part of the vocabulary). */
  def normalize(text: String): String = words(text).mkString(" ")

  /** Train `numMerges` merges on the sample. Deterministic: the most
    * frequent pair wins each round, ties broken by the pair's lexical
    * order, so the artifact is reproducible from the sample alone. */
  def train(texts: Seq[String], numMerges: Int): Vocab = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(t => words(t).foreach(w =>
      wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)))
    // each distinct word as its evolving symbol sequence
    var table: Vector[(Vector[String], Long)] = wordFreq.iterator.map {
      case (w, f) =>
        val syms =
          if (w.length == 1) Vector(w + EndW)
          else w.dropRight(1).map(_.toString).toVector :+
            (w.last.toString + EndW)
        (syms, f)
    }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairs = new scala.collection.mutable.HashMap[(String, String), Long]()
      table.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val (l, r) = pairs.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((l, r))
        table = table.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += (l + r); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), f)
          }
        }
        round += 1
      }
    }
    Vocab(merges.result())
  }

  /** Persist the vocabulary as a transactional table: (rank, left,
    * right) — the artifact a 100 TB run trains once and every pipeline
    * stage loads (the [[Perplexity.save]] pattern). */
  def save(spark: SparkSession, vocab: Vocab, path: String): Unit = {
    import spark.implicits._
    graft.sources.ManifestTable.overwrite(
      vocab.merges.zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right"), path)
    ()
  }

  def load(spark: SparkSession, path: String): Vocab = {
    val rows = graft.sources.ManifestTable.read(spark, path)
      .select("rank", "left", "right").collect()
      .sortBy(_.getInt(0))
    Vocab(rows.map(r => (r.getString(1), r.getString(2))).toIndexedSeq)
  }

  /** Distributed token counting: broadcast the KB-sized vocabulary,
    * count per row. Returns `df` plus `countCol`. */
  def withTokenCounts(df: DataFrame, textCol: String, countCol: String,
      vocab: Vocab): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    val count = org.apache.spark.sql.functions.udf(
      (t: String) => bc.value.countTokens(t))
    df.withColumn(countCol, count(org.apache.spark.sql.functions.col(textCol)))
  }
}
