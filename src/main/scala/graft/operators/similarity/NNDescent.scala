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
    val u0 = sc.index(emb
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("__v"))
      .select(col("id"), col("__v"), sqrt(dot(col("__v"), col("__v"))).as("__n"))
      .select(col("id"), transform(col("__v"), x => x / col("__n")).as("v")))
    val n = u0.count()
    // NOT LoopScale-sized (r20, measured): like GraphSearch's walk, each
    // round's dominant cost is the per-candidate dot-product scoring —
    // row count is a bad proxy for work here, and sizing the round
    // shuffles to the candidate count starved the scoring of cores
    // (ss16's own build +0.7 s at local[32]). The id-only BSP loops
    // (DedupClusters, PageRank, Triangles) are where LoopScale applies.
    val u = u0

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
    //
    // Every loop iteration is driver-synchronized, so its wall time is
    // dominated by SEQUENTIAL STAGE COUNT, not data volume — the round
    // below is deliberately stage-lean: all rounds' ring pairs are
    // precomputed in ONE job (each round then just filters a checkpoint
    // scan instead of re-running two window functions and a join), the
    // adjacency cap is one groupBy with the degree cap and the pair
    // expansion done in array expressions (the old window + self-join
    // spent three exchanges on the same candidate set), and candidate
    // dedup rides the merge's own (src,dst) partial aggregation instead
    // of a dedicated distinct exchange (duplicate pairs cost only
    // map-side dot products, and the map-side combine collapses them
    // before any shuffle bytes move).
    val nBuckets = math.max(1L, n / bucketSize)
    val offsets = u.sparkSession.range(1, k + 1).select(col("id").as("__j"))
    val ringAll = sc.index {
      val seeds = u.sparkSession.range(0, maxRounds + 1L)
        .select(col("id").cast("int").as("__seed"))
      val ranked = u.select(col("id")).crossJoin(broadcast(seeds))
        .select(col("id"), col("__seed"),
          pmod(xxhash64(col("id"), col("__seed")), lit(1000000007L)).as("__h"),
          pmod(xxhash64(col("id"), col("__seed") + 7), lit(nBuckets))
            .cast("long").as("__b"))
        .withColumn("__r", row_number().over(
          Window.partitionBy("__seed", "__b").orderBy(col("__h"), col("id"))) - 1)
        .withColumn("__sz", count(lit(1)).over(
          Window.partitionBy("__seed", "__b")))
        .select(col("id"), col("__seed"), col("__b"), col("__r"), col("__sz"))
      ranked.crossJoin(broadcast(offsets))
        .where(col("__sz") > 1)
        .select(col("id").as("src"), col("__seed"), col("__b"),
          pmod(col("__r") + col("__j"), col("__sz")).as("__tr"))
        .join(ranked.select(col("id").as("dst"), col("__seed"), col("__b"),
          col("__r").as("__tr")), Seq("__seed", "__b", "__tr"))
        .where(col("src") =!= col("dst"))
        .select(col("__seed"), col("src"), col("dst")).distinct()
    }
    def ringPairs(seed: Int): DataFrame =
      ringAll.where(col("__seed") === seed).select(col("src"), col("dst"))

    var graph = topK(scored(ringPairs(0))).localCheckpoint()
    val total = math.max(1L, graph.count())
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      // adjacency = out ∪ in neighbors, capped per node in hash order
      // ((xxhash64(h,x), x) ascending — identical order to a row_number
      // window, in one exchange); neighbor-pairs expand from the capped
      // array map-side instead of a self-join
      val adj = graph.select(col("src").as("h"), col("dst").as("x"))
        .unionAll(graph.select(col("dst").as("h"), col("src").as("x")))
        .groupBy("h").agg(collect_set(col("x")).as("__xs"))
        .select(col("h"), slice(array_sort(transform(col("__xs"),
          x => struct(pmod(xxhash64(col("h"), x), lit(1000000007L)).as("hh"),
            x.as("x")))), 1, deg).as("__cx"))
        .select(transform(col("__cx"), s => s.getField("x")).as("__xs"))
      val candidates = adj
        .select(explode(flatten(transform(col("__xs"), x =>
          transform(filter(col("__xs"), y => x < y),
            y => struct(x.as("src"), y.as("dst")))))).as("__p"))
        .select(col("__p.src").as("src"), col("__p.dst").as("dst"))
        .unionAll(ringPairs(round + 1)) // anti-freeze long-range probes
      val newDirected = scored(candidates)
      // __old rides the merge so the convergence signal (how many kept
      // edges were not in the previous graph) falls out of the SAME
      // aggregation — no per-round anti-join pass against the old graph
      val merged = topK(
        graph.select(col("src"), col("dst"), col("sim"), lit(1).as("__old"))
          .unionAll(newDirected.withColumn("__old", lit(0)))
          .unionAll(newDirected.select(col("dst").as("src"),
            col("src").as("dst"), col("sim"), lit(0).as("__old")))
          .groupBy("src", "dst").agg(max(col("sim")).as("sim"),
            max(col("__old")).as("__old")))
        .localCheckpoint(false)
      round += 1
      // ONE action per round: the replaced-edge sum materializes the new
      // graph's checkpoint and feeds the convergence exit
      val changed = merged.agg(sum(lit(1) - col("__old"))).first().getLong(0)
      done = changed.toDouble / total < convergedFrac
      logInfo(s"nn-descent round $round: $changed/$total edges replaced")
      IndexScope.release(graph)
      graph = merged
    }
    // the final round's checkpoint would outlive the scope (the loop only
    // releases SUPERSEDED rounds); adopting it hands its blocks to the
    // scope, which pins the re-checkpointed result before releasing them.
    // The projection drops the internal __old flag (absent from round 0's
    // graph, so select by name).
    sc.own(graph)
    graph.select("src", "dst", "sim", "rank")
  }
}
