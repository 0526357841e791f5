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

  test("EM on exact expected pattern counts recovers planted lambda/m/u") {
    // plant Fellegi-Sunter parameters, hand EM the EXACT expected count
    // of every agreement pattern (no sampling noise): the estimator must
    // walk back to the generating parameters. K=3 binary fields is
    // identifiable (Fellegi-Sunter 1969 closed form exists at K=3).
    val lambda = 0.05
    val m = Vector(0.95, 0.90, 0.80)
    val u = Vector(0.02, 0.30, 0.15)
    val n = 10000000L
    val patterns = (0 until 8).map { p =>
      val g = Vector((p >> 2) & 1, (p >> 1) & 1, p & 1)
      def prod(probs: Vector[Double]) =
        g.zip(probs).map { case (b, q) => if (b == 1) q else 1 - q }.product
      (g, math.round(n * (lambda * prod(m) + (1 - lambda) * prod(u))))
    }
    val est = graft.operators.Linkage.emOnPatterns(patterns,
      Seq("f1", "f2", "f3"), scale = 1000, lambdaInit = 0.1,
      maxIters = 500, tol = 1e-13)
    assert(math.abs(est.lambda - lambda) < 0.005, s"lambda=${est.lambda}")
    est.fields.zipWithIndex.foreach { case (f, i) =>
      assert(math.abs(f.m - m(i)) < 0.01, s"m($i)=${f.m}")
      assert(math.abs(f.u - u(i)) < 0.01, s"u($i)=${f.u}")
    }
    // weights follow the log2 ratios at the planted values, e.g. field 1:
    // log2(.95/.02) ≈ 5.57 bits agree, log2(.05/.98) ≈ -4.29 disagree
    val f1 = est.fields.head
    assert(f1.agreeWeight > 5000 && f1.agreeWeight < 6200, f1.toString)
    assert(f1.disagreeWeight < -3800 && f1.disagreeWeight > -4800, f1.toString)
  }

  test("estimateWeights end-to-end: unsupervised weights link the planted diagonal") {
    import graft.operators.Linkage
    import org.apache.spark.sql.functions.{abs => cAbs, col, lower}
    // 400 records in 8 blocks; b = perturbed copy of a (the planted
    // matches are the diagonal). Name survives perturbation, balance
    // jitters within tolerance, segment is dropped for every 5th record.
    val a = spark.range(0, 400).selectExpr("id AS k", "id % 8 AS blk",
      "concat('person-', id) AS name", "CAST(id * 7 % 997 AS DOUBLE) AS bal",
      "concat('seg', id % 4) AS seg")
    val b = spark.range(0, 400).selectExpr("id AS k", "id % 8 AS blk",
      "concat('PERSON-', id) AS name",
      "CAST(id * 7 % 997 AS DOUBLE) + 0.4 AS bal",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('seg', id % 4) END AS seg")
    val fields = Seq(
      Linkage.EmField("name", (l, r) => lower(l) === lower(r)),
      Linkage.EmField("bal", (l, r) => cAbs(l - r) <= 1.0),
      Linkage.EmField("seg", (l, r) => l === r))
    val est = Linkage.estimateWeights(a, b, Seq("blk"), fields)
    // the planted structure: matches always agree on name+bal (m ≈ 1),
    // non-matches essentially never do (u ≈ 0); λ = 1/50 (50 rows/block)
    assert(est.lambda > 0.01 && est.lambda < 0.04, s"lambda=${est.lambda}")
    val byName = est.fields.map(f => f.name -> f).toMap
    assert(byName("name").m > 0.95 && byName("name").u < 0.05)
    assert(byName("bal").m > 0.95 && byName("bal").u < 0.1)
    // estimated rules at the posterior-1/2 threshold recover exactly the
    // 400 planted pairs
    val links = Linkage.linkPairs(a, b, Seq("blk"), "k", "k",
      est.rules(fields), est.threshold)
    import spark.implicits._
    val got = links.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == (0L until 400L).map(i => (i, i)).toSet,
      s"linked ${got.size} pairs, diagonal misses: ${(0L until 400L).map(i => (i, i)).toSet.diff(got).take(5)}")
  }
}
