package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous PageRank over an edge list — the graph-analytics
  * shape (BSP rounds: one equi-join + one keyed aggregation per
  * iteration) that complements the hierarchy walk of the recursive CTE.
  * At 100 TB each round is a shuffle keyed by node id; pre-partitioning
  * edges and ranks on the node key makes successive rounds reuse the
  * partitioning, and the per-round `localCheckpoint` (cluster: persist +
  * periodic checkpoint) cuts the otherwise exponentially deepening
  * lineage every iterative Spark job must cut.
  *
  * INTEGER-exact variant: ranks are maintained in units of 10⁻¹² of the
  * initial per-node mass, damping 85/100 is applied with integer
  * division, and each in-neighbor contributes `pr div out_degree`. No
  * floating point anywhere ⇒ bit-identical results on any engine with
  * integer division — which is what lets an SQL oracle check the
  * distributed computation exactly (q98). Long arithmetic holds to
  * ~9·10⁶ nodes at this unit; beyond that, widen to DECIMAL — the
  * algebra is unchanged.
  */
object PageRank {

  val Unit0: Long = 1000000000000L // initial per-node rank
  private val base = 15L * Unit0 / 100 // (1 − d) · U, exact

  /** `iters` rounds over `edges` (src, dst). The node set is
    * `distinct(src) ∪ distinct(dst)`; nodes with no out-edges simply
    * contribute nothing (standard leak simplification, deterministic).
    * Returns (node, pr). */
  def iterate(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    var pr = nodes.withColumn("pr", lit(Unit0))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(pr.join(deg, "node"), col("src") === col("node"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
        .localCheckpoint() // cut the iterative lineage each round
    }
    pr
  }
}
