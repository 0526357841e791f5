package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: turns the pair
  * list from [[SetSimJoin]]/[[MinHashLSH]] into cluster assignments
  * (cluster id = the minimum doc id reachable), the final step of a dedup
  * pipeline before choosing per-cluster representatives.
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes the minimum label among itself and its neighbors; converges in
  * O(diameter) rounds (near-dup clusters are small/dense, so typically
  * 2-3). Each round is one join + one aggregation, materialized with
  * localCheckpoint so the lineage stays flat; convergence is detected
  * with a changed-row count. This is the join-based variant of the
  * large-star/small-star map-reduce CC algorithm, which is the drop-in
  * upgrade if diameters grow at 100 TB.
  */
object DedupClusters {

  /** @param pairs (doc_a, doc_b) undirected edges
    * @return (doc_id, cluster_id) for every node appearing in `pairs` */
  def clusters(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // neighbor labels ∪ own label → min per node
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
      val next = neighborLabels.unionByName(labels)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.label") =!= col("o.label"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Apply dedup: keep every document that is not in any cluster plus the
    * minimum-id representative of each cluster — the "retained corpus"
    * output a training-data pipeline actually writes. */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val assign = clusters(pairs).withColumnRenamed("doc_id", "__cc_id")
    docs.join(assign, docs(idCol) === assign("__cc_id"), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === docs(idCol))
      .drop("__cc_id", "cluster_id")
  }
}
