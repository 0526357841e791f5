package graft.operators.dedup

import graft.operators.IndexScope
import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: turns the pair
  * list from [[SetSimJoin]]/[[MinHashLSH]] into cluster assignments
  * (cluster id = the minimum doc id reachable), the final step of a dedup
  * pipeline before choosing per-cluster representatives.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * rewires every edge toward the minimum id of a local neighborhood;
  * the edge set converges to a star forest (every node → its component
  * minimum) in O(log² n) rounds on ANY graph — long near-dup chains
  * included — vs O(diameter) for plain min-label propagation. Both star
  * steps are a single partition-key window aggregate (no join).
  *
  * Scale/efficiency contract (this loop runs on the driver, the data never
  * does): ONE Spark job per round — the round's edge set is lazily
  * local-checkpointed and materialized by the same action that computes
  * its convergence signature (count + bounded hash sum, ANSI-safe); the
  * previous round's checkpoint blocks are explicitly unpersisted, so
  * storage stays O(|E|) regardless of round count. The pair graph is the
  * near-dup SUBSET of the corpus (tiny relative to the input), and AQE
  * right-sizes the per-round shuffles.
  */
object DedupClusters extends Logging {

  /** Large-star: for every node u, connect all strictly-larger neighbors
    * to min(Γ(u) ∪ {u}). Implemented as one window min over the
    * symmetrized edge list — no self-join. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    sym.withColumn("m", least(min(col("v")).over(Window.partitionBy("u")), col("u")))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: orient edges high→low, connect every node of the
    * neighborhood (including u, excluding the min itself) to the min. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val withMin = oriented.withColumn("m", min(col("v")).over(Window.partitionBy("u")))
    withMin.where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionAll(withMin.select(col("u"), col("m").as("v")))
  }

  /** Order-independent edge-set signature: (row count, two independently
    * seeded bounded hash sums). The second sum squares the (already tiny)
    * probability that two DIFFERENT edge sets collide and end the loop
    * early with wrong cluster ids. pmod keeps the sums far below long
    * overflow under ANSI arithmetic. */
  private def signature(edges: DataFrame): (Long, Long, Long) = {
    val row = edges.agg(
      count(lit(1)),
      sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))),
      sum(pmod(xxhash64(lit(13), col("u"), col("v")), lit(998244353L)))).head()
    (row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      if (row.isNullAt(2)) 0L else row.getLong(2))
  }

  /** @param pairs (doc_a, doc_b) undirected edges
    * @return ((doc_id, cluster_id) for every node in `pairs`, converged) */
  def clustersConverged(pairs: DataFrame, maxIterations: Int = 25): (DataFrame, Boolean) = {
    var edges = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var sig = signature(edges)
    // star rounds partitioned by the EDGE count (×2 for symmetrization),
    // not the session default — see [[graft.operators.LoopScale]]: the
    // near-dup subset is tiny relative to the corpus, and per-core
    // near-empty window partitions make the loop anti-scale with cores
    val loop = graft.operators.LoopScale.sessionFor(
      pairs.sparkSession, sig._1 * 2)
    edges = graft.operators.LoopScale.rebind(edges, loop)
    val nodes = graft.operators.LoopScale.rebind(
      pairs.select(col("doc_a").as("id"))
        .unionAll(pairs.select(col("doc_b").as("id")))
        .distinct(), loop)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // lazy checkpoint: the signature action below is what materializes
      // it — exactly one job per round
      val next = smallStar(largeStar(edges)).distinct().localCheckpoint(false)
      val nextSig = signature(next)
      IndexScope.release(edges)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged)
      logWarning(s"connected components did not converge in $maxIterations " +
        "rounds; cluster ids may be incomplete")
    // fixed point = star forest: every edge is (member, component-min);
    // roots appear only as targets and keep their own id. The assignment
    // is materialized eagerly (it is the near-dup SUBSET — small) so the
    // loop's final edge checkpoint can be released here instead of leaking
    // into whatever stage consumes the assignments.
    val assign = graft.operators.LoopScale.rebind(nodes
      .join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id").as("doc_id"), coalesce(col("v"), col("id")).as("cluster_id"))
      .localCheckpoint(), pairs.sparkSession)
    IndexScope.release(edges)
    (assign, converged)
  }

  /** @param pairs (doc_a, doc_b) undirected edges
    * @return (doc_id, cluster_id) for every node appearing in `pairs`
    * @throws IllegalStateException when the star loop did not reach its
    *         fixed point in maxIterations rounds — the edge set is then
    *         not a star forest and the assignment could carry duplicate /
    *         non-minimal cluster ids; failing loudly beats silently
    *         corrupting a dedup. Convergence is O(log² n) rounds on any
    *         graph, so hitting this means maxIterations is mis-set. */
  def clusters(pairs: DataFrame, maxIterations: Int = 25): DataFrame = {
    val (assign, converged) = clustersConverged(pairs, maxIterations)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations rounds; " +
          "raise maxIterations (convergence is O(log^2 n) rounds)")
    assign
  }

  /** Apply dedup: keep every document that is not in any cluster plus the
    * minimum-id representative of each cluster — the "retained corpus"
    * output a training-data pipeline actually writes. The assignment table
    * is the near-dup subset; usually broadcast-sized, but the strategy is
    * left to AQE (its runtime size decides), because at web scale the
    * near-dup subset can be a large corpus fraction and a forced hint
    * would hit the broadcast limit. */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val assign = clusters(pairs).withColumnRenamed("doc_id", "__cc_id")
    docs.join(assign, docs(idCol) === assign("__cc_id"), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === docs(idCol))
      .drop("__cc_id", "cluster_id")
  }

  /** SOFT dedup: keep every document but weight it 1e6 div cluster_size
    * ppm (singletons 1e6) — hard dedup's down-weighting alternative.
    * Dropping all-but-one of a near-dup cluster ([[applyDedup]]) throws
    * away whichever copy had the best formatting/metadata and biases
    * against content that is popular BECAUSE it is good; weighting keeps
    * the corpus intact while neutralizing duplicated mass in expectation
    * (each cluster contributes ~1 document's worth to any weighted
    * sample). Integer ppm via `div` keeps the weights engine-exact. Cost
    * over [[clusters]]: one count per cluster id + a broadcast-sized
    * left join back to the corpus. */
  def softWeights(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val assign = clusters(pairs).withColumnRenamed("doc_id", "__cc_id")
    val sizes = assign.groupBy("cluster_id").agg(count(lit(1)).as("__n"))
    docs.select(col(idCol))
      .join(assign, docs(idCol) === assign("__cc_id"), "left")
      .join(sizes, Seq("cluster_id"), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(1L)).as("cluster_size"),
        expr("1000000 div coalesce(__n, 1)").as("weight_ppm"))
  }
}
