package graft

import graft.operators.dedup.{Dedup, MinHashLSH, SetSimJoin, SimHash, Winnowing}

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "The quick brown fox, jumps over the lazy dog!"), // fingerprint-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (3L, "completely different words entirely here now today"),
    (4L, "the quick brown fox jumps over the lazy cat")    // near-dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(r(0L) == 2L) // docs 0 and 2
    assert(r(1L) == 1L)
  }

  test("fingerprint dedup also folds punctuation/case variants") {
    val r = Dedup.fingerprint(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(r(0L) == 3L) // docs 0, 1, 2 share a fingerprint
  }

  test("exact jaccard join finds near-dup pairs above threshold only") {
    val pairs = SetSimJoin.jaccardJoin(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    // 0,1,2 identical after normalization; 4 near-dup; 3 unrelated
    assert(pairs.contains((0L, 2L)) && pairs.contains((0L, 1L)) && pairs.contains((0L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash-LSH verified output equals the exact jaccard join on real docs") {
    val d = Tables(spark, sf0001, "documents")
    val exact = SetSimJoin.jaccardJoin(d, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = MinHashLSH.nearDupPairs(d, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("tuneBands: recall-constrained band selection recovers known configs") {
    // t=0.8 at 128 perms → the suite's hand-picked (32, 4); lower
    // thresholds need longer bands' complement — more, shorter bands
    assert(MinHashLSH.tuneBands(0.8) == (32, 4))
    assert(MinHashLSH.tuneBands(0.5) == (64, 2))
    // the split always spends the whole budget
    val (b, r) = MinHashLSH.tuneBands(0.73, numPerms = 96)
    assert(b * r == 96)
    // infeasible bound falls back to the minimum-miss split
    assert(MinHashLSH.tuneBands(0.5, numPerms = 2) == (2, 1))
  }

  test("cluster assignment: transitive closure with min-id labels") {
    // chain 1-2, 2-3 plus isolated pair 7-9: clusters {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val c = graft.operators.dedup.DedupClusters.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("softWeights: ppm weights neutralize duplicated mass, singletons keep 1e6") {
    // clusters {1,2,3} (size 3) and {7,9} (size 2); 5 and 6 are singletons
    val docs = Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val w = graft.operators.dedup.DedupClusters.softWeights(docs, "doc_id", pairs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w == Map(
      1L -> (3L, 333333L), 2L -> (3L, 333333L), 3L -> (3L, 333333L),
      5L -> (1L, 1000000L), 6L -> (1L, 1000000L),
      7L -> (2L, 500000L), 9L -> (2L, 500000L)))
    // every document is retained — soft dedup never drops
    assert(w.size == 7)
  }

  test("cluster assignment: 50-node chain converges in O(log n) star rounds") {
    // a path graph is the worst case for plain min-label propagation
    // (O(diameter) = 49 rounds); large-star/small-star must close it in
    // O(log n) — give it 8 rounds and require convergence
    val pairs = (0L until 49L).map(i => (i + 1L, i)).toDF("doc_a", "doc_b")
    val (assign, converged) =
      graft.operators.dedup.DedupClusters.clustersConverged(pairs, maxIterations = 8)
    assert(converged)
    val c = assign.as[(Long, Long)].collect()
    assert(c.length == 50 && c.forall(_._2 == 0L))
  }

  test("cluster assignment: two chains plus a star, random edge order") {
    val edges = Seq((5L, 3L), (3L, 8L), (20L, 21L), (21L, 22L), (22L, 23L),
      (100L, 50L), (100L, 60L), (100L, 70L))
    val c = graft.operators.dedup.DedupClusters
      .clusters(scala.util.Random.shuffle(edges).toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(c(5L) == 3L && c(8L) == 3L && c(3L) == 3L)
    assert(Seq(20L, 21L, 22L, 23L).forall(c(_) == 20L))
    assert(Seq(50L, 60L, 70L, 100L).forall(c(_) == 50L))
  }

  test("bloom anti-join equals the plain anti-join and splits before the shuffle") {
    import graft.operators.dedup.BloomDedup
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sf0001, "documents")
    val incoming = docs.where(col("doc_id") % 5 === 0)
    val existing = docs.where(col("doc_id") % 5 =!= 0)
    val bloom = BloomDedup.newDocs(incoming, existing, "doc_id", "text")
    val plain = incoming
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fingerprint"))
      .join(existing.select(graft.functions.TextFunctions
          .fingerprint(col("text")).as("fingerprint")),
        Seq("fingerprint"), "left_anti")
      .select("doc_id", "fingerprint")
    assert(bloom.count() == plain.count())
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
    // the prefilter is really in the plan (candidate split, not a rename)
    val planStr = bloom.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), planStr.take(1500))
    // empty corpus: everything is new, no sketch built
    val all = BloomDedup.newDocs(incoming, existing.limit(0), "doc_id", "text")
    assert(all.count() == incoming.count())
  }

  test("simhash: identical docs collide at hamming 0; unrelated docs don't pair") {
    val pairs = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 3, chunks = 4)
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(t => (t._1, t._2) -> t._3).toMap
    assert(m((0L, 2L)) == 0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowing: shared-substring guarantee and selection density") {
    val k = 3; val w = 4
    val shared = "quick brown foxes jump over lazy dogs daily" // 8 tokens
    val d = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"one two three four five six $shared seven"),
      (3L, "completely unrelated words nothing in common here at all today")
    ).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(d, "doc_id", "text", k, w)
      .as[(Long, Int, Long)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // SIGMOD'03 guarantee: a shared token run of length ≥ w+k-1 (here 8
    // ≥ 6) forces at least one shared fingerprint, at ANY offset
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // coverage: every window of w consecutive k-grams contains a selected
    // position, so consecutive fingerprints are never more than w apart
    fp.groupBy(_._1).foreach { case (_, rows) =>
      val ps = rows.map(_._2).sorted
      ps.sliding(2).filter(_.length == 2).foreach(p => assert(p(1) - p(0) <= w))
    }
  }
}
