package graft.operators.similarity

import graft.functions.VectorFunctions.{dot, toDouble}
import graft.operators.IndexScope
import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time half of graph ANN: greedy best-first BEAM search over a
  * prebuilt k-NN graph (the search procedure of HNSW's base layer —
  * Malkov & Yashunin, "Efficient and robust approximate nearest neighbor
  * search using Hierarchical Navigable Small World graphs", TPAMI 2018,
  * Algorithm 2 — [[NNDescent.knnGraph]] builds the navigable graph it
  * walks).
  *
  * Classic graph search advances ONE query through a mutable
  * visited/candidate heap — inherently sequential and driver-hostile.
  * Spark-first, ALL queries advance together and a search round is a
  * constant number of bounded set operations, independent of query count:
  *
  *  1. frontier: current beams ⨝ adjacency (shuffle hash join, fan-out ≤
  *     |queries|·beamWidth·degree);
  *  2. fresh = frontier ∖ visited (left-anti join — each (query, node)
  *     pair is scored at most ONCE over the whole search);
  *  3. score fresh pairs with one codegen'd dot product each
  *     ([[graft.plans.DotProduct]], vectors unit-normalized once);
  *  4. re-select each query's top-`beamWidth` beam from its visited set.
  *
  * The loop runs on the driver with ONE materializing action per round
  * (the fresh-pair count doubles as the convergence test: an empty
  * frontier means every beam is closed under adjacency — the multi-query
  * analogue of HNSW's "no candidate improves the worst result" stop);
  * superseded rounds' checkpoints are released, the survivor is adopted
  * by the scope. Entry points are a deterministic hash-scatter of the
  * corpus (~n/entryMod nodes), the multi-start that makes greedy search
  * robust on clustered data; per query the scan fraction is
  * O(entries + rounds·beamWidth·degree) / n — the graph-ANN trade: the
  * search touches a neighborhood cone, never the corpus.
  */
object GraphSearch extends Logging {

  /** Incremental graph insert — HNSW's insert procedure (search for the
    * new point's neighbors, connect, patch reverse edges) batched for an
    * ingest pipeline: beam-[[search]] the EXISTING graph for each new
    * node's approximate k-NN among the indexed corpus (per-insert cost is
    * the search cone, independent of corpus size — the whole point of not
    * rebuilding), link BOTH directions (the reverse edges are how old
    * nodes discover that a new node displaced one of their neighbors),
    * brute-link the ingest batch internally (batch² bounded, exact), and
    * re-select every touched node's top-k.
    *
    * Returns the merged graph in [[NNDescent.knnGraph]]'s
    * (src, dst, sim, rank) shape, ready for the next search or insert. */
  def insert(corpus: DataFrame, graph: DataFrame, newNodes: DataFrame,
      idCol: String, vecCol: String, k: Int, beamWidth: Int = 8,
      maxRounds: Int = 16, entryMod: Int = 16, hopExpansion: Int = 1,
      topGraph: Option[DataFrame] = None, topSampleMod: Int = 8): DataFrame = {
    val searched = search(corpus, graph, newNodes, idCol, vecCol, k = k,
        beamWidth = beamWidth, maxRounds = maxRounds, entryMod = entryMod,
        hopExpansion = hopExpansion, topGraph = topGraph,
        topSampleMod = topSampleMod)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("cosine").as("sim"))
    val inner = Similarity.knnBrute(newNodes, newNodes, idCol, vecCol, k)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("cosine").as("sim"))
    graph.select("src", "dst", "sim")
      .unionAll(searched)
      .unionAll(searched.select(col("dst").as("src"), col("src").as("dst"),
        col("sim")))
      .unionAll(inner)
      .groupBy("src", "dst").agg(max("sim").as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))))
      .where(col("rank") <= k)
  }

  /** @param graph     (src, dst, ...) k-NN edges ([[NNDescent.knnGraph]]
    *                   output shape); symmetrized internally
    * @param k          neighbors to emit per query
    * @param beamWidth  candidates kept per query between rounds (≥ k;
    *                   the recall/scan-fraction lever, HNSW's `ef`)
    * @param maxRounds  hop budget (searches usually close in far fewer —
    *                   the frontier empties)
    * @param entryMod   1-in-entryMod nodes seed every query's search
    * @param hopExpansion 1 = walk the graph's own edges; 2 = walk the
    *                   2-hop closure (adjacency pre-squared once into the
    *                   scope). Each round then advances two hops, halving
    *                   the number of driver-synchronized rounds — the
    *                   query-time twin of NN-Descent's neighbor-of-
    *                   neighbor local join. Total scored pairs stay
    *                   comparable (same cone, bigger steps); the cost is
    *                   a degree²-bounded edge table, so keep it for
    *                   small/medium graphs or degree-capped ones.
    * @return (query_id, neighbor_id, cosine, rk) — rk 1..k by descending
    *         rounded cosine, neighbor id tiebreak ([[Similarity.knnBrute]]
    *         shape, directly comparable against exact truth) */
  def search(corpus: DataFrame, graph: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, beamWidth: Int = 8,
      maxRounds: Int = 16, entryMod: Int = 16, hopExpansion: Int = 1,
      topGraph: Option[DataFrame] = None, topSampleMod: Int = 8): DataFrame =
    searchStats(corpus, graph, queries, idCol, vecCol, k, beamWidth,
      maxRounds, entryMod, hopExpansion, topGraph, topSampleMod)._1

  /** The deterministic hash sample a coarse TOP LAYER is built over:
    * 1-in-`mod` corpus nodes. Build [[NNDescent.knnGraph]] on exactly
    * this frame and pass it as `topGraph` — search then seeds from a
    * far sparser scatter, walks the small top graph to each query's
    * neighborhood first (cheap rounds over ~n/mod nodes), and only then
    * opens the base graph: HNSW's entry hierarchy, two layers. */
  def topLayerSample(corpus: DataFrame, idCol: String,
      mod: Int = 8): DataFrame =
    corpus.where(pmod(xxhash64(col(idCol)), lit(mod.toLong)) === 0)

  /** Derive a coarse top layer from the BASE graph — no second
    * NN-Descent build (whose driver-synchronized rounds can cost more
    * than the hierarchy saves): the top layer's edges are the base
    * graph's 1- and 2-hop connections restricted to sample×sample.
    * Edge quality is all the layer needs — the walk re-scores every
    * candidate against the query, so similarity metadata is not
    * carried. */
  def deriveTopLayer(graph: DataFrame, sample: DataFrame,
      idCol: String): DataFrame = {
    val ids = sample.select(col(idCol).as("__sid"))
    val e1 = graph.select(col("src"), col("dst"))
      .unionAll(graph.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val fromS = e1.join(ids.withColumnRenamed("__sid", "src"),
      Seq("src"), "left_semi")
    val oneHop = fromS.join(ids.withColumnRenamed("__sid", "dst"),
      Seq("dst"), "left_semi")
    val twoHop = fromS.select(col("src"), col("dst").as("__mid"))
      .join(e1.select(col("src").as("__mid"), col("dst")), "__mid")
      .select(col("src"), col("dst"))
      .join(ids.withColumnRenamed("__sid", "dst"), Seq("dst"), "left_semi")
      .where(col("src") =!= col("dst"))
    oneHop.unionAll(twoHop).distinct()
  }

  /** [[search]] plus the number of driver-synchronized rounds the walk
    * actually ran — the latency floor a cluster deployment cares about
    * (each round is one materializing action). The hierarchy spec pins
    * its round-halving claim on this. */
  def searchStats(corpus: DataFrame, graph: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, beamWidth: Int = 8,
      maxRounds: Int = 16, entryMod: Int = 16, hopExpansion: Int = 1,
      topGraph: Option[DataFrame] = None,
      topSampleMod: Int = 8,
      // QUANTIZED WALK (the DiskANN memory model): candidates score
      // against SQ8-dequantized int8 codes — 8x lighter memory traffic
      // than the float64 unit table, which is what bounds a graph scan
      // at 100 TB — and only the final top-`rerank` per query re-rank
      // against exact vectors. Calibration is 2-d doubles broadcast as
      // literals (ScalarQuantization's model).
      quantized: Boolean = false,
      rerank: Int = 50): (DataFrame, Int) = {
    var rounds = 0
    val out = IndexScope.scoped { sc =>
      require(k > 0 && beamWidth >= k && maxRounds > 0 && entryMod > 0)
      require(hopExpansion == 1 || hopExpansion == 2, "hopExpansion must be 1 or 2")
      require(topSampleMod > 0)
      def unit(df: DataFrame, idAs: String, vecAs: String): DataFrame = df
        .select(col(idCol).as(idAs), toDouble(col(vecCol)).as("__v"))
        .select(col(idAs), col("__v"), sqrt(dot(col("__v"), col("__v"))).as("__n"))
        .select(col(idAs), transform(col("__v"), x => x / col("__n")).as(vecAs))
      val c = sc.index(unit(corpus, "nid", "nv"))
      val q = sc.index(unit(queries, "query_id", "qv"))
      // int8 codes + per-dimension [lo, width] calibration (quantized
      // walks only): the scan-side table the beam rounds actually read
      val codesOpt = if (!quantized) None else {
        val stats = c.select(posexplode(col("nv")).as(Seq("pos", "x")))
          .groupBy("pos").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
          .orderBy("pos").collect()
        val lo = stats.map(_.getDouble(1)).toSeq
        val w = stats.map { r =>
          val width = (r.getDouble(2) - r.getDouble(1)) / 255.0
          if (width > 0) width else 1.0
        }.toSeq
        val loC = typedLit(lo); val wC = typedLit(w)
        val codes = sc.index(c.select(col("nid"),
          transform(col("nv"), (x, i) =>
            least(greatest(round((x - element_at(loC, i + 1)) /
              element_at(wC, i + 1), 0), lit(0.0)), lit(255.0))
              .cast("int")).as("__codes")))
        Some((codes, loC, wC))
      }
      val edges1 = graph.select(col("src"), col("dst"))
        .unionAll(graph.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val edges = sc.index(
        if (hopExpansion == 1) edges1
        else edges1.unionAll(
            edges1.select(col("src"), col("dst").as("__mid"))
              .join(edges1.select(col("src").as("__mid"), col("dst")), "__mid")
              .select(col("src"), col("dst")))
          .where(col("src") =!= col("dst"))
          .distinct())

      // (query_id, nid) → + cosine, one codegen'd dot per pair; the
      // quantized walk dequantizes inside the scan (ADC — queries stay
      // float) instead of touching the full-precision table
      def score(cands: DataFrame): DataFrame = codesOpt match {
        case None => cands
          .join(c, "nid")
          .join(q, "query_id")
          .select(col("query_id"), col("nid"), dot(col("qv"), col("nv")).as("cosine"))
        case Some((codes, loC, wC)) =>
          val dequant = transform(col("__codes"), (cd, i) =>
            element_at(loC, i + 1) + cd.cast("double") * element_at(wC, i + 1))
          cands.join(codes, "nid")
            .join(q, "query_id")
            .select(col("query_id"), col("nid"),
              dot(col("qv"), dequant).as("cosine"))
      }

      // the coarse layer's edges: symmetrized AND 2-hop-squared — the
      // layer exists to cover distance fast, and it is topSampleMod×
      // smaller than the base graph, so the degree² closure stays cheap
      val topEdges = topGraph.map { tg =>
        val e1 = tg.select(col("src"), col("dst"))
          .unionAll(tg.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        sc.index(e1.unionAll(
            e1.select(col("src"), col("dst").as("__mid"))
              .join(e1.select(col("src").as("__mid"), col("dst")), "__mid")
              .select(col("src"), col("dst")))
          .where(col("src") =!= col("dst"))
          .distinct())
      }

      // deterministic hash-scattered entry points, every query starts on
      // all of them — a genuine all-pairs seeding, but of ids only: the
      // entry list is O(n/entryMod) ids and broadcast, so the product is
      // per-query metadata fan-out, never a shuffled Cartesian of data.
      // With a top layer the scatter is topSampleMod× SPARSER (and drawn
      // from the sample, so the top walk can reach it): the top rounds
      // recover the locality the thinner seeding gives up.
      val entryModEff =
        if (topEdges.isDefined) topSampleMod.toLong * entryMod else entryMod.toLong
      val entries0 = c.select(col("nid"))
        .where(pmod(xxhash64(col("nid")), lit(entryModEff)) === 0)
      // tiny-corpus guard: an over-sparse scatter that catches nothing
      // falls back to the flat entry set (one metadata-sized count)
      val entries =
        if (topEdges.isDefined && entries0.limit(1).isEmpty)
          c.select(col("nid"))
            .where(pmod(xxhash64(col("nid")), lit(entryMod)) === 0)
        else entries0
      var visited = score(
        q.select(col("query_id")).crossJoin(broadcast(entries))
          .where(col("query_id") =!= col("nid")))
        .localCheckpoint()

      def beamOf(v: DataFrame): DataFrame = v
        .withColumn("__r", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nid"))))
        .where(col("__r") <= beamWidth)
        .select(col("query_id"), col("nid"))

      var nVisited = visited.count()
      // NOT LoopScale-sized (r20, measured): unlike the id-only BSP
      // loops (connected components, PageRank), each walk round SCORES
      // its fresh candidates with per-row dot products — row count is a
      // bad proxy for work, and shrinking the round partitioning to the
      // state size starved the scoring of cores (ss8 3.80→6.76 s,
      // ss17 4.70→9.73 s at local[32] when sized by visited rows).
      // The session default keeps the compute parallel.

      // one beam-walk phase over `edgeTable`; rounds are global across
      // phases (each is one driver-synchronized action — the metric)
      def walk(edgeTable: DataFrame, budget: Int, phase: String): Unit = {
        var hop = 0
        var done = false
        while (hop < budget && !done) {
          val frontier = beamOf(visited)
            .withColumnRenamed("nid", "src")
            .join(edgeTable, "src")
            .select(col("query_id"), col("dst").as("nid"))
            .distinct()
            .where(col("query_id") =!= col("nid"))
          val fresh = score(frontier.join(
            visited.select(col("query_id"), col("nid")),
            Seq("query_id", "nid"), "left_anti"))
          val merged = visited.unionAll(fresh).localCheckpoint(false)
          // one action per round: counts the merged set (fresh = delta)
          // AND materializes its checkpoint
          val total = merged.count()
          val nFresh = total - nVisited
          nVisited = total
          IndexScope.release(visited)
          visited = merged
          hop += 1
          rounds += 1
          done = nFresh == 0
          logInfo(s"graph-search $phase round $rounds: $nFresh fresh candidates")
        }
      }
      // phase 1 (hierarchy only): descend the coarse layer TOWARD each
      // query's neighborhood — a bounded budget, not closure: the top
      // walk's job is to cover distance (2-hop steps over a sparse
      // sample ≈ 2·topSampleMod base positions per round), and the base
      // phase's own convergence recovers anything it left on the table
      topEdges.foreach(te => walk(te, math.max(2, maxRounds / 2), "top"))
      // phase 2: the base graph, entered near the target
      walk(edges, maxRounds, "base")

      sc.own(visited)
      // quantized walks re-rank the per-query top-`rerank` EXACTLY
      // before emitting — recall is then bounded by shortlist misses,
      // the same knob as the flat SQ8 scan (ss10)
      val ranked = codesOpt match {
        case None => visited
        case Some(_) =>
          val short = visited.withColumn("__ar", row_number().over(
              Window.partitionBy("query_id")
                .orderBy(col("cosine").desc, col("nid"))))
            .where(col("__ar") <= math.max(rerank, k))
            .select(col("query_id"), col("nid"))
          short.join(c, "nid").join(q, "query_id")
            .select(col("query_id"), col("nid"),
              dot(col("qv"), col("nv")).as("cosine"))
      }
      ranked
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nid"))))
        .where(col("rk") <= k)
        .select(col("query_id"), col("nid").as("neighbor_id"),
          col("cosine"), col("rk"))
    }
    (out, rounds)
  }
}
