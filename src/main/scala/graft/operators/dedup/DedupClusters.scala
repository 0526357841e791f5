package graft.operators.dedup

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

  /** Order-independent edge-set signature: (row count, bounded hash sum).
    * pmod keeps the sum far below long overflow under ANSI arithmetic. */
  private def signature(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(
      count(lit(1)),
      sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L)))).head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  private def unpersistCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.graft.ColumnBridge.unpersistLocalCheckpoint(df)

  /** @param pairs (doc_a, doc_b) undirected edges
    * @return ((doc_id, cluster_id) for every node in `pairs`, converged) */
  def clustersConverged(pairs: DataFrame, maxIterations: Int = 25): (DataFrame, Boolean) = {
    val nodes = pairs.select(col("doc_a").as("id"))
      .unionAll(pairs.select(col("doc_b").as("id")))
      .distinct()
    var edges = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var sig = signature(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // lazy checkpoint: the signature action below is what materializes
      // it — exactly one job per round
      val next = smallStar(largeStar(edges)).distinct().localCheckpoint(false)
      val nextSig = signature(next)
      unpersistCheckpoint(edges)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged)
      logWarning(s"connected components did not converge in $maxIterations " +
        "rounds; cluster ids may be incomplete")
    // fixed point = star forest: every edge is (member, component-min);
    // roots appear only as targets and keep their own id
    val assign = nodes
      .join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id").as("doc_id"), coalesce(col("v"), col("id")).as("cluster_id"))
    (assign, converged)
  }

  /** @param pairs (doc_a, doc_b) undirected edges
    * @return (doc_id, cluster_id) for every node appearing in `pairs` */
  def clusters(pairs: DataFrame, maxIterations: Int = 25): DataFrame =
    clustersConverged(pairs, maxIterations)._1

  /** Apply dedup: keep every document that is not in any cluster plus the
    * minimum-id representative of each cluster — the "retained corpus"
    * output a training-data pipeline actually writes. The assignment table
    * is the near-dup subset (small) and broadcast. */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val assign = clusters(pairs).withColumnRenamed("doc_id", "__cc_id")
    docs.join(broadcast(assign), docs(idCol) === assign("__cc_id"), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === docs(idCol))
      .drop("__cc_id", "cluster_id")
  }
}
