package graft

import graft.operators.Linkage
import graft.operators.dedup.UrlDedup
import org.apache.spark.sql.functions._

/** Fellegi-Sunter linkage scoring and URL canonicalization dedup. */
class LinkageSpec extends SparkSpecBase {
  import spark.implicits._

  test("linkPairs scores agreement/disagreement and thresholds") {
    val a = Seq((1, "blk", "alice", 10.0), (2, "blk", "bob", 20.0))
      .toDF("id", "blk", "name", "v")
    val b = Seq((11, "blk", "ALICE", 10.4), (12, "blk", "carol", 99.0))
      .toDF("id", "blk", "name", "v")
    val rules = Seq(
      Linkage.eqLowerRule("name", 1000L, -400L),
      Linkage.withinRule("v", 0.5, 600L, -200L))
    val all = Linkage.linkPairs(a, b, Seq("blk"), "id", "id", rules,
        threshold = Long.MinValue)
      .as[(Int, Int, Long)].collect().sortBy(p => (p._1, p._2)).toSeq
    // (1,11): name agrees case-insensitively, |10-10.4|<=0.5 → 1600
    // (1,12): both disagree → -600; (2,11): -600; (2,12): -600
    assert(all == Seq((1, 11, 1600L), (1, 12, -600L),
      (2, 11, -600L), (2, 12, -600L)))
    val linked = Linkage.linkPairs(a, b, Seq("blk"), "id", "id", rules, 1000L)
      .as[(Int, Int, Long)].collect().toSeq
    assert(linked == Seq((1, 11, 1600L)))
  }

  test("null fields score as disagreement, never null out the sum") {
    val a = Seq((1, "k", "x")).toDF("id", "blk", "seg")
    val b = Seq((2, "k", null: String)).toDF("id", "blk", "seg")
    val out = Linkage.linkPairs(a, b, Seq("blk"), "id", "id",
      Seq(Linkage.eqRule("seg", 300L, -300L)), Long.MinValue)
      .as[(Int, Int, Long)].collect().toSeq
    assert(out == Seq((1, 2, -300L)))
  }

  test("blocking bounds the candidate set: cross-block pairs never form") {
    val a = Seq((1, "b1", "same"), (2, "b2", "same")).toDF("id", "blk", "name")
    val b = Seq((3, "b2", "same")).toDF("id", "blk", "name")
    val out = Linkage.linkPairs(a, b, Seq("blk"), "id", "id",
      Seq(Linkage.eqRule("name", 100L, -100L)), Long.MinValue)
      .as[(Int, Int, Long)].collect().toSeq
    // id=1 agrees on name but sits in another block: no pair
    assert(out == Seq((2, 3, 100L)))
    intercept[IllegalArgumentException] {
      Linkage.linkPairs(a, b, Nil, "id", "id",
        Seq(Linkage.eqRule("name", 1L, -1L)), 0L)
    }
  }

  test("URL canonicalization folds scheme/case/www/tracking/fragment/slash") {
    val urls = Seq(
      "https://site1.example.com/p/1",
      "http://SITE1.EXAMPLE.COM/p/1/",
      "https://www.site1.example.com/p/1?utm_source=x",
      "https://site1.example.com/p/1#frag",
      "https://site1.example.com/p/1?a=1&utm_campaign=z&b=2",
      "https://other.com/q",
      "https://site1.example.com/p/1?utm_source=x&a=1&b=2",
      "https://site1.example.com/p/1?utm_a=1&utm_b=2&a=1").toDF("u")
    val out = urls.select(UrlDedup.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(out.take(4).toSet == Set("https://site1.example.com/p/1"))
    // a tracking param BETWEEN real params: separators repaired
    assert(out(4) == "https://site1.example.com/p/1?a=1&b=2")
    assert(out(5) == "https://other.com/q")
    // tracking param FIRST, real params after: '?' is restored onto the
    // first surviving separator, never left dangling or malformed
    assert(out(6) == "https://site1.example.com/p/1?a=1&b=2")
    // several consecutive tracking params, all first
    assert(out(7) == "https://site1.example.com/p/1?a=1")
  }

  test("literal '&' in the path and literal '?' in the query survive") {
    val urls = Seq(
      // '&' in the PATH (no query at all): must pass through untouched,
      // never be mistaken for a separator and rewritten to '?'
      "https://x.com/a&b",
      // multiple literal '&' in the path
      "https://x.com/a&b&c/d",
      // second literal '?' INSIDE the query: split happens at the first
      // '?' only; the rest of the query is opaque
      "https://x.com/p?keep=1?z=2",
      // tracking param mixed into the hard shapes
      "https://x.com/a&b?keep=1?z=2&utm_source=a",
      // query that is ONLY tracking params, on an '&'-path: the '?'
      // disappears, the path '&' stays
      "https://x.com/a&b?utm_source=a",
      // empty query ('?' with nothing after): dangling '?' dropped
      "https://x.com/p?").toDF("u")
    val out = urls.select(UrlDedup.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(out(0) == "https://x.com/a&b")
    assert(out(1) == "https://x.com/a&b&c/d")
    assert(out(2) == "https://x.com/p?keep=1?z=2")
    assert(out(3) == "https://x.com/a&b?keep=1?z=2")
    assert(out(4) == "https://x.com/a&b")
    assert(out(5) == "https://x.com/p")
  }

  test("dedupByUrl keeps the smallest id per canonical URL") {
    val df = Seq(
      (7, "https://a.com/x"), (3, "http://A.COM/x/"),
      (9, "https://www.a.com/x#top"), (5, "https://b.com/y"))
      .toDF("doc_id", "url")
    val out = UrlDedup.dedupByUrl(df, "doc_id", "url")
      .as[(String, Int, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("https://a.com/x", 3, 3L), ("https://b.com/y", 5, 1L)))
  }
}
