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
    iterateImpl(edges, srcCol, dstCol, iters, untilStable = false)._1
  }

  /** Run until the rank vector reaches its integer FIXED POINT (the
    * div-floored arithmetic literally stops changing) or `maxIters`.
    * Returns (ranks, rounds run, converged). Detection is one extra
    * metadata-sized action per round: an order-independent signature of
    * (node, pr) — count plus two independently seeded bounded hash sums,
    * the same convergence test [[graft.operators.dedup.DedupClusters]]
    * uses for its star rounds; a signature collision between DIFFERENT
    * rank vectors needs both seeded sums to collide at once. */
  def iterateUntilStable(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, "need at least one iteration")
    iterateImpl(edges, srcCol, dstCol, maxIters, untilStable = true)
  }

  private def signature(pr: DataFrame): (Long, Long, Long) = {
    val row = pr.agg(
      count(lit(1)),
      sum(pmod(xxhash64(col("node"), col("pr")), lit(1000000007L))),
      sum(pmod(xxhash64(lit(13), col("node"), col("pr")), lit(998244353L)))).head()
    (row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      if (row.isNullAt(2)) 0L else row.getLong(2))
  }

  private def iterateImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, untilStable: Boolean): (DataFrame, Int, Boolean) = {
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    // round partitioning derived from the edge count, not the session
    // default ([[graft.operators.LoopScale]]): each BSP round is one
    // join + one aggregation over O(|E|) rows, and near-empty per-core
    // partitions make the loop anti-scale with cluster size. The count
    // is a metadata-sized job over the checkpoint just taken.
    val loop = graft.operators.LoopScale.sessionFor(
      edges.sparkSession, e.count())
    e = graft.operators.LoopScale.rebind(e, loop)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    var pr = nodes.withColumn("pr", lit(Unit0)).localCheckpoint()
    var sig = if (untilStable) signature(pr) else (0L, 0L, 0L)
    var rounds = 0
    var converged = false
    while (rounds < iters && !converged) {
      rounds += 1
      val contrib = e
        .join(pr.join(deg, "node"), col("src") === col("node"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
        .localCheckpoint() // cut the iterative lineage each round
      val prevBlocks = pr
      pr = next
      if (untilStable) {
        val nextSig = signature(pr)
        converged = nextSig == sig
        sig = nextSig
      }
      // the superseded round's checkpoint blocks are released, so
      // storage stays O(|V|) however many rounds run
      org.apache.spark.sql.graft.ColumnBridge
        .unpersistLocalCheckpoint(prevBlocks)
    }
    // only the returned rank frame outlives the call: the input pins
    // (edges, node set, degrees) are released here — without this every
    // invocation leaks O(|E|+|V|) block-manager storage for the JVM
    // lifetime (pr itself is a materialized checkpoint, independent of
    // these lineages)
    Seq(e, nodes, deg).foreach(
      org.apache.spark.sql.graft.ColumnBridge.unpersistLocalCheckpoint)
    // ranks re-bound to the CALLER's session: downstream plans keep
    // cluster-sized parallelism, not the loop's
    (graft.operators.LoopScale.rebind(pr, edges.sparkSession),
      rounds, converged)
  }
}
