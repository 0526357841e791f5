package graft

import graft.operators.similarity.{NNDescent, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class NNDescentSpec extends SparkSpecBase {
  import spark.implicits._

  /** Manifold corpus: 8 seeded cluster centers, 60 points each laid out
    * ALONG A LINE through the center — i.e. data on a low-dimensional
    * manifold, where each point's true neighbors are its chain neighbors
    * and "a neighbor of my neighbor is my neighbor" actually holds. That
    * is the regime graph-ANN methods (NN-Descent, HNSW) are built for and
    * the structure real embeddings have. The sf embeddings tables are
    * uniform RANDOM vectors (measured: 2-hop neighbor transitivity 0.16,
    * same-label 5-NN fraction at chance) — no few-round graph method can
    * reach high recall there, so recall is pinned here and
    * determinism/monotonicity on the random table. */
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(42)
    val cents = Array.fill(8, 16)(rnd.nextGaussian())
    val dirs = Array.fill(8, 16)(rnd.nextGaussian() * 0.04)
    val rows = (0 until 480).map { i =>
      val c = cents(i % 8); val d = dirs(i % 8); val t = (i / 8).toDouble
      (i.toLong, c.indices.map(j => (c(j) + t * d(j)).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def bruteGraph(df: DataFrame, k: Int): Set[(Long, Long)] =
    Similarity.knnBrute(df, df, "vec_id", "embedding", k = k)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toSet

  test("knnGraph reaches high recall on metrically clustered data") {
    val truth = bruteGraph(clustered, 5)
    val approx = NNDescent.knnGraph(clustered, "vec_id", "embedding", k = 5,
        maxRounds = 6, bucketSize = 96)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
    val recall = (approx & truth).size.toDouble / truth.size
    info(f"nn-descent recall@5 (clustered) = $recall%.3f (${truth.size} true edges)")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("knnGraph is deterministic and emits exactly k ranked edges per node") {
    val emb = Tables(spark, sf0001, "embeddings")
    def run() = NNDescent.knnGraph(emb, "vec_id", "embedding", k = 3,
      maxRounds = 3, bucketSize = 64)
    val a = run().select("src", "dst", "rank").as[(Long, Long, Int)].collect().toSet
    val b = run().select("src", "dst", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a == b, "two runs must produce the identical graph")
    val perNode = run().groupBy("src").agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .as[(Long, Long, Int)].collect()
    assert(perNode.forall(r => r._2 == 3 && r._3 == 3))
  }

  test("knnGraph releases every index/round checkpoint; only the result survives") {
    val ctx = spark.sparkContext
    val before = ctx.getPersistentRDDs.keySet
    val g = NNDescent.knnGraph(clustered, "vec_id", "embedding", k = 3,
      maxRounds = 2, bucketSize = 96)
    val leaked = ctx.getPersistentRDDs.keySet -- before
    // unit-vector index, per-round graphs, and the adopted final round are
    // all released by the scope; the re-checkpointed result is the caller's
    assert(leaked.size == 1,
      s"expected only the result checkpoint to survive, found ${leaked.size}")
    graft.operators.IndexScope.release(g)
    assert((ctx.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("GraphSearch beam search recovers near-exact top-k over the built graph") {
    import graft.operators.similarity.GraphSearch
    val truth = bruteGraph(clustered, 5)
    val graph = NNDescent.knnGraph(clustered, "vec_id", "embedding", k = 5,
      maxRounds = 6, bucketSize = 96)
    val found = GraphSearch.search(clustered, graph, clustered,
        "vec_id", "embedding", k = 5, beamWidth = 8, maxRounds = 16, entryMod = 16)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toSet
    val recall = (found & truth).size.toDouble / truth.size
    info(f"graph-search recall@5 (clustered) = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
    // ranked output shape: exactly k rows per query, rk 1..k
    val g2 = GraphSearch.search(clustered, graph, clustered,
      "vec_id", "embedding", k = 5, beamWidth = 8)
    val perQ = g2.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mr"))
      .as[(Long, Long, Int)].collect()
    assert(perQ.length == 480 && perQ.forall(r => r._2 == 5 && r._3 == 5))
    // deterministic: the walk has no randomness, two runs agree exactly
    assert(g2.select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)]
      .collect().toSet ==
      GraphSearch.search(clustered, graph, clustered, "vec_id", "embedding",
        k = 5, beamWidth = 8)
        .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)]
        .collect().toSet)
  }

  test("GraphSearch 2-hop expansion reaches 1-hop recall in half the rounds") {
    import graft.operators.similarity.GraphSearch
    val truth = bruteGraph(clustered, 5)
    val graph = NNDescent.knnGraph(clustered, "vec_id", "embedding", k = 5,
      maxRounds = 6, bucketSize = 96)
    def recallAt(hops: Int, rounds: Int): Double = {
      val found = GraphSearch.search(clustered, graph, clustered,
          "vec_id", "embedding", k = 5, beamWidth = 8, maxRounds = rounds,
          entryMod = 16, hopExpansion = hops)
        .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
        .collect().toSet
      (found & truth).size.toDouble / truth.size
    }
    val r2 = recallAt(hops = 2, rounds = 8)
    val r1 = recallAt(hops = 1, rounds = 16)
    info(f"2-hop/8-round recall = $r2%.3f vs 1-hop/16-round = $r1%.3f")
    assert(r2 >= 0.9 && r2 >= r1 - 0.02,
      f"2-hop recall $r2%.3f fell behind 1-hop $r1%.3f")
  }

  test("HNSW-style top layer: equal recall in at most half the " +
      "driver-synchronized rounds of the flat walk") {
    import graft.operators.similarity.GraphSearch
    val truth = bruteGraph(clustered, 5)
    val graph = NNDescent.knnGraph(clustered, "vec_id", "embedding", k = 5,
      maxRounds = 6, bucketSize = 96)
    def recallOf(found: DataFrame): Double = {
      val f = found.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
      (f & truth).size.toDouble / truth.size
    }
    // flat walk: sparse scatter (≈ n/64 entries), 2-hop rounds to
    // closure — the strongest flat configuration at this seeding density
    val (flat, flatRounds) = GraphSearch.searchStats(clustered, graph,
      clustered, "vec_id", "embedding", k = 5, beamWidth = 8,
      maxRounds = 32, entryMod = 64, hopExpansion = 2)
    // hierarchy: SAME seeding density (8·8 = 64) and same 2-hop base
    // walk, but the seeds first descend a coarse layer (1-in-8 sample,
    // same NN-Descent build) — and need only maxRounds=2 per phase
    val sample = GraphSearch.topLayerSample(clustered, "vec_id", mod = 8)
    val top = NNDescent.knnGraph(sample, "vec_id", "embedding", k = 5,
      maxRounds = 6, bucketSize = 96)
    val (hier, hierRounds) = GraphSearch.searchStats(clustered, graph,
      clustered, "vec_id", "embedding", k = 5, beamWidth = 8,
      maxRounds = 2, entryMod = 8, hopExpansion = 2,
      topGraph = Some(top), topSampleMod = 8)
    val (rFlat, rHier) = (recallOf(flat), recallOf(hier))
    info(f"flat: $flatRounds rounds recall $rFlat%.3f; " +
      f"hier: $hierRounds rounds recall $rHier%.3f")
    assert(rHier >= 0.9, f"hierarchical recall $rHier%.3f below gate")
    assert(rHier >= rFlat - 0.02,
      f"hierarchy lost recall: $rHier%.3f vs flat $rFlat%.3f")
    assert(hierRounds * 2 <= flatRounds,
      s"hierarchy did not halve rounds: $hierRounds vs flat $flatRounds")
  }

  test("insert links a new batch into an existing graph without a rebuild") {
    import graft.operators.similarity.GraphSearch
    val old = clustered.where(col("vec_id") % 12 =!= 0)
    val batch = clustered.where(col("vec_id") % 12 === 0)
    val g = NNDescent.knnGraph(old, "vec_id", "embedding", k = 5,
      maxRounds = 6, bucketSize = 96)
    val merged = GraphSearch.insert(old, g, batch, "vec_id", "embedding",
      k = 5, entryMod = 8)
    // shape: ≤ k ranked edges per node, every node present
    val perSrc = merged.groupBy("src").agg(count(lit(1)).as("n"))
    assert(perSrc.count() == 480)
    assert(perSrc.where(col("n") > 5).count() == 0)
    // recall of the merged graph vs the full-corpus brute truth: the
    // inserted nodes found their neighbors through the old graph, and the
    // reverse links let old nodes adopt new neighbors
    val truth = bruteGraph(clustered, 5)
    val found = merged.select(col("src"), col("dst")).as[(Long, Long)]
      .collect().toSet
    val recall = (found & truth).size.toDouble / truth.size
    info(f"post-insert graph recall@5 = $recall%.3f")
    assert(recall >= 0.85, f"recall $recall%.3f below 0.85")
    // deterministic
    val again = GraphSearch.insert(old, g, batch, "vec_id", "embedding",
      k = 5, entryMod = 8)
      .select("src", "dst", "rank").as[(Long, Long, Int)].collect().toSet
    assert(again == merged.select("src", "dst", "rank")
      .as[(Long, Long, Int)].collect().toSet)
  }

  test("GraphSearch releases its round checkpoints; only the result survives") {
    import graft.operators.similarity.GraphSearch
    val graph = NNDescent.knnGraph(clustered, "vec_id", "embedding", k = 3,
      maxRounds = 2, bucketSize = 96)
    val ctx = spark.sparkContext
    val before = ctx.getPersistentRDDs.keySet
    val r = GraphSearch.search(clustered, graph, clustered.limit(40),
      "vec_id", "embedding", k = 3, beamWidth = 4, maxRounds = 6)
    val leaked = ctx.getPersistentRDDs.keySet -- before
    assert(leaked.size == 1,
      s"expected only the result checkpoint to survive, found ${leaked.size}")
    graft.operators.IndexScope.release(r)
    assert((ctx.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("descent rounds monotonically improve even on structureless data") {
    val emb = Tables(spark, sf0001, "embeddings")
    val truth = bruteGraph(emb, 5)
    def recallOf(rounds: Int): Double = {
      val g = NNDescent.knnGraph(emb, "vec_id", "embedding", k = 5,
          maxRounds = rounds, bucketSize = 128, convergedFrac = 0.0)
        .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
      (g & truth).size.toDouble / truth.size
    }
    val r1 = recallOf(1)
    val r4 = recallOf(4)
    info(f"random-vector recall after 1 round = $r1%.3f, after 4 = $r4%.3f")
    assert(r4 > r1, "more rounds must improve the graph (cosines only replace WORSE edges)")
  }
}
