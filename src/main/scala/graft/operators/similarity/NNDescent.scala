package graft.operators.similarity

import graft.functions.VectorFunctions.{dot, toDouble}
import graft.operators.IndexScope
import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate k-NN graph construction via NN-Descent (Dong, Moses,
  * Li: "Efficient K-Nearest Neighbor Graph Construction for Generic
  * Similarity Measures", WWW 2011) — the graph-based ANN family's
  * foundation (an HNSW layer is a navigable k-NN graph), expressed
  * Spark-first: where HNSW inserts nodes ONE AT A TIME through a global
  * mutable graph (inherently sequential, driver-hostile), NN-Descent is
  * a fixpoint of set-level joins — "a neighbor of my neighbor is likely
  * my neighbor" — so every round is plain shuffle hash joins plus a
  * per-node top-k, and the data never visits the driver.
  *
  * Round = symmetrize the current graph into adjacency (h, x), cap the
  * per-node degree (hub nodes would otherwise square into the candidate
  * explosion), self-join on h to propose neighbor-pairs, score each
  * distinct pair with ONE codegen'd dot product (unit-normalized once),
  * merge into the graph keeping each node's top-k. Convergence = the
  * fraction of graph edges replaced in a round dropping under
  * `convergedFrac`; like [[graft.operators.dedup.DedupClusters]], the
  * loop runs on the driver with one materializing action per round and
  * the previous round's checkpoint released.
  *
  * Deterministic by construction: ring initialization over hash-bucketed
  * rank order, hash-ordered degree capping, id tiebreaks in every top-k —
  * two runs produce the identical graph (spec-pinned), which is what
  * makes the operator testable and its output cacheable.
  */
object NNDescent extends Logging {

  /** @param k        neighbors per node in the output graph
    * @param maxRounds NN-Descent iterations (recall typically saturates
    *                  in 3-6 rounds; each round is O(n · maxDegree²)
    *                  candidate dots, all map-side after the joins)
    * @param bucketSize ring-init bucket width (init locality only)
    * @param maxDegree adjacency cap per node during propagation
    *                  (default 2k): bounds hub fan-out so a round's
    *                  candidate count stays O(n · (2k)²) under ANY
    *                  degree skew
    * @param convergedFrac stop when < this fraction of edges changed
    * @return (src, dst, cosine, rank) — rank 1..k by descending cosine */
  def knnGraph(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      maxRounds: Int = 5, bucketSize: Int = 1024, maxDegree: Int = -1,
      convergedFrac: Double = 0.01): DataFrame = IndexScope.scoped { sc =>
    require(k > 0 && maxRounds > 0 && bucketSize > k)
    val deg = if (maxDegree > 0) maxDegree else 2 * k
    val u = sc.index(emb
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("__v"))
      .select(col("id"), col("__v"), sqrt(dot(col("__v"), col("__v"))).as("__n"))
      .select(col("id"), transform(col("__v"), x => x / col("__n")).as("v")))

    def scored(pairs: DataFrame): DataFrame = pairs
      .join(u.select(col("id").as("src"), col("v").as("__sv")), "src")
      .join(u.select(col("id").as("dst"), col("v").as("__dv")), "dst")
      .select(col("src"), col("dst"), dot(col("__sv"), col("__dv")).as("sim"))

    def topK(edges: DataFrame): DataFrame = edges
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))))
      .where(col("rank") <= k)

    // hash rings: nodes land in ~bucketSize-wide hash buckets, each node
    // pairs with the next k ranks of its bucket's ring (wrap-around via
    // modulo join). Arbitrary but DETERMINISTIC; the seed rotates the
    // whole arrangement. Ring 0 initializes the graph; ring `round`
    // contributes fresh long-range candidates every iteration — pure
    // local joins can FREEZE into mutually-closed (k+1)-cliques that
    // never see a better candidate (measured: a 480-node corpus
    // fragmented into 6-cliques and plateaued at recall 0.19), and the
    // rotating ring is the deterministic analogue of the random candidate
    // pool that graph-ANN builders inject to stay connected.
    val nBuckets = math.max(1L, u.count() / bucketSize)
    val offsets = u.sparkSession.range(1, k + 1).select(col("id").as("__j"))
    def ringPairs(seed: Int): DataFrame = {
      val ranked = u.select(col("id"),
        pmod(xxhash64(col("id"), lit(seed)), lit(1000000007L)).as("__h"))
        .withColumn("__b", pmod(xxhash64(col("id"), lit(seed + 7)), lit(nBuckets))
          .cast("long"))
        .withColumn("__r", row_number().over(
          Window.partitionBy("__b").orderBy(col("__h"), col("id"))) - 1)
        .withColumn("__sz", count(lit(1)).over(Window.partitionBy("__b")))
        .select(col("id"), col("__b"), col("__r"), col("__sz"))
      ranked.crossJoin(broadcast(offsets))
        .where(col("__sz") > 1)
        .select(col("id").as("src"), col("__b"),
          pmod(col("__r") + col("__j"), col("__sz")).as("__tr"))
        .join(ranked.select(col("id").as("dst"), col("__b"), col("__r").as("__tr")),
          Seq("__b", "__tr"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
    }

    var graph = topK(scored(ringPairs(0))).localCheckpoint()
    val total = math.max(1L, graph.count())
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      // adjacency = out ∪ in neighbors, capped per node in hash order
      val adj = graph.select(col("src").as("h"), col("dst").as("x"))
        .unionAll(graph.select(col("dst").as("h"), col("src").as("x")))
        .distinct()
        .withColumn("__dr", row_number().over(
          Window.partitionBy("h").orderBy(pmod(xxhash64(col("h"), col("x")),
            lit(1000000007L)), col("x"))))
        .where(col("__dr") <= deg)
        .select(col("h"), col("x"))
      val candidates = adj.withColumnRenamed("x", "src")
        .join(adj.withColumnRenamed("x", "dst"), "h")
        .where(col("src") < col("dst"))
        .select(col("src"), col("dst"))
        .unionAll(ringPairs(round + 1)) // anti-freeze long-range probes
        .distinct()
      val newDirected = scored(candidates)
      val merged = topK(
        graph.select("src", "dst", "sim")
          .unionAll(newDirected)
          .unionAll(newDirected.select(col("dst").as("src"),
            col("src").as("dst"), col("sim")))
          .groupBy("src", "dst").agg(max(col("sim")).as("sim")))
        .localCheckpoint(false)
      // one action per round: the anti-join counts replaced edges AND
      // materializes the new graph's checkpoint
      val changed = merged.join(graph.select("src", "dst"),
        Seq("src", "dst"), "left_anti").count()
      IndexScope.release(graph)
      graph = merged
      round += 1
      done = changed.toDouble / total < convergedFrac
      logInfo(s"nn-descent round $round: $changed/$total edges replaced")
    }
    // the final round's checkpoint would outlive the scope (the loop only
    // releases SUPERSEDED rounds); adopting it hands its blocks to the
    // scope, which pins the re-checkpointed result before releasing them
    sc.own(graph)
  }
}
