package graft

import graft.operators.textual.Perplexity
import org.apache.spark.sql.functions._

/** Interpolated-bigram LM perplexity filter (Perplexity.scoreFilter):
  * hand-computed probabilities on a tiny corpus, OOV handling, the
  * <2-token exclusion, and determinism. */
class PerplexitySpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // train slice = even ids; doc 0 "a b a b a" gives bigram counts
  // c(a b)=2, c(b a)=2 → rates 1.0; unigrams a:3 b:2, N=5, V=2
  private val corpus = docs(
    0L -> "a b a b a",
    1L -> "a b",
    3L -> "c c",
    5L -> "z")

  private def run() = Perplexity.scoreFilter(
    corpus, "doc_id", "text", trainPred = col("doc_id") % 2 === 0, maxPpl = 2.0)

  test("hand-computed perplexities: in-model, mixed, and OOV docs") {
    val r = run().orderBy("doc_id")
      .select("doc_id", "n_bigrams", "ppl", "keep")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    // doc 5 has one token -> no bigram evidence -> excluded
    assert(r.map(_._1) == Seq(0L, 1L, 3L))
    assert(r.map(_._2) == Seq(4L, 1L, 1L))
    // doc 1 "a b": p = 0.75*1.0 + 0.25*((2+1)/(5+2+1)) = 0.84375
    //   → ppl = 2^(−log2 0.84375) = 1/0.84375 = 1.1852 (4 dp)
    assert(r(1)._3 == 1.1852 && r(1)._4)
    // doc 3 "c c" fully OOV: p = 0.25 * 1/8 = 2^-5 exactly → ppl = 32
    assert(r(2)._3 == 32.0 && !r(2)._4)
    // doc 0 is the train doc itself — scored too (CCnet scores the
    // reference corpus), and better-than-average fit: below doc 3
    assert(r(0)._3 < r(2)._3 && r(0)._4)
  }

  test("an empty train slice fails loudly, not with null scores") {
    val e = intercept[IllegalArgumentException] {
      Perplexity.scoreFilter(corpus, "doc_id", "text",
        trainPred = col("doc_id") < 0, maxPpl = 2.0).count()
    }
    assert(e.getMessage.contains("train slice is empty"))
  }

  test("deterministic across runs") {
    val a = run().orderBy("doc_id").collect().toSeq
    val b = run().orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("saved model loads in a fresh session and scores identically") {
    val model = Perplexity.train(corpus, "doc_id", "text",
      trainPred = col("doc_id") === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ppl-").toString
    Perplexity.save(model, dir)
    val s2 = spark.newSession()
    val loaded = Perplexity.load(s2, dir)
    assert(loaded.denom == model.denom)
    val inline = Perplexity
      .score(corpus, "doc_id", "text", model, maxPpl = 2.0)
      .orderBy("doc_id").collect().toSeq
    val viaArtifact = Perplexity
      .score(corpus.as("c"), "doc_id", "text", loaded, maxPpl = 2.0)
      .orderBy("doc_id").collect().toSeq
    assert(viaArtifact == inline)
    // a missing/corrupt artifact fails loudly, not with null scores
    intercept[Throwable] {
      Perplexity.load(s2, dir + "/rate") // wrong path: rate has no meta
    }
  }
}
