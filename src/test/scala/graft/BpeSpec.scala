package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.textual.Bpe

/** The trainable BPE tokenizer artifact: deterministic training,
  * canonical lowest-rank-first apply, round-trip identity over
  * whitespace-normalized text, table-persisted vocabulary. */
class BpeSpec extends SparkSpecBase {

  private val corpus = Seq(
    "the cat sat on the mat",
    "the bat and the cat",
    "that hat is the cat hat",
    "mats and hats and bats")

  test("training is deterministic and merges the most frequent pair " +
      "first (ties lexicographic)") {
    val v1 = Bpe.train(corpus, 32)
    val v2 = Bpe.train(corpus, 32)
    assert(v1.merges == v2.merges, "same sample, same artifact - bytes equal")
    assert(v1.merges.nonEmpty)
    // (a, t</w>) heads the list: cat x2, sat, mat, bat, hat x2, that
    // = 8 word-final 'at's - the most frequent adjacent pair here
    assert(v1.merges.head == ("a", "t</w>"), s"got ${v1.merges.head}")
    // merges exhaust gracefully: asking for more than exist caps out
    val all = Bpe.train(corpus, 10000)
    assert(all.merges.size < 10000)
    assert(Bpe.train(corpus, 0).merges.isEmpty)
  }

  test("round trip: decode(encode(t)) == whitespace-normalized t, for " +
      "hostile shapes too") {
    val v = Bpe.train(corpus, 24)
    val cases = corpus ++ Seq(
      "  leading and   internal\tand trailing   ",
      "unseen vocabulary zyxwv qqq",
      "a", "", "   ", "one",
      "ünïcødé wörds and emoji 😀 mix")
    cases.foreach { t =>
      assert(v.decode(v.encode(t)) == Bpe.normalize(t),
        s"round trip failed for '$t'")
    }
    // token counts: words <= n_bpe <= non-ws chars (+</w> is fused,
    // never a token of its own)
    corpus.foreach { t =>
      val n = v.countTokens(t)
      val w = Bpe.words(t).size.toLong
      val c = t.count(!_.isWhitespace).toLong
      assert(n >= w && n <= c, s"'$t': words $w <= $n <= chars $c")
      assert(n == v.encode(t).size.toLong)
    }
    // the vocabulary compresses: trained text encodes to fewer tokens
    // than characters
    assert(v.countTokens(corpus.head) <
      corpus.head.count(!_.isWhitespace))
  }

  test("apply is lowest-rank-first (canonical BPE), not longest-match") {
    // merges: (a,b) rank0, (x,a) rank1. For "xab": rank0 fires first ->
    // [x, ab]; a longest/leftmost-first scheme would produce [xa, b]
    val v = Bpe.Vocab(Seq(("a", "b"), ("x", "a")))
    assert(v.encodeWord("xabz") == Seq("x", "ab", "z</w>"))
  }

  test("the artifact persists as a table and loads back byte-identical; " +
      "distributed counting equals driver counting") {
    val v = Bpe.train(corpus, 24)
    val path = Files.createTempDirectory("graft-bpe-").toString + "/vocab"
    Bpe.save(spark, v, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded.merges == v.merges, "save/load must round-trip the ranks")
    import spark.implicits._
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val counted = Bpe.withTokenCounts(df, "text", "n_bpe", loaded)
      .orderBy("id").collect()
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(counted(i).getAs[Long]("n_bpe") == v.countTokens(t))
    }
  }
}
