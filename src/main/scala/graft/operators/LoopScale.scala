package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive shuffle partitioning for driver-synchronized (BSP)
  * loop operators — NN-Descent rounds, graph beam search, connected
  * components, PageRank.
  *
  * A BSP round's wall time is SEQUENTIAL STAGE LATENCY, not data volume:
  * each round shuffles a KB-to-MB state frame, and at the session default
  * (`spark.sql.shuffle.partitions` = cluster parallelism) every one of
  * those shuffles pays a fixed per-partition floor (task launch, store
  * setup, fetch bookkeeping) PER CORE for near-empty partitions. The loop
  * then ANTI-SCALES with cluster size — measured at 32 vs 8 cores the
  * ANN/graph family ran up to 2× slower on 4× more cores (guide §2:
  * partitions sized to the data, not the cluster).
  *
  * The fix is to derive the loop's partitioning from the loop's OWN data:
  * `rows / rowsPerPartition` clamped to [1, session default]. A
  * billion-edge graph still gets the cluster's full parallelism; a
  * 2400-node gate corpus gets 1-2 partitions. The clamp means a session
  * already sized smaller (e.g. a stream gate at 4) is never inflated.
  *
  * Mechanics: the operator clones its caller's session, sets the derived
  * partition count on the CLONE only (`newSession` shares the
  * SparkContext and builder confs; runtime SQLConf stays isolated), and
  * rebinds its internal frames into it. The caller's session — and every
  * frame the operator RETURNS, which must be rebound back by the same
  * helper — keeps the cluster-sized default.
  */
object LoopScale {

  /** Partition count for `rows` of loop state: ceil(rows/rowsPerPartition)
    * clamped to [1, the session's shuffle default]. Density is tunable via
    * `spark.graft.loop.rowsPerPartition` (default 16384 — loop-state rows
    * are id/score tuples, so a partition is then ~a few hundred KB). */
  def partitionsFor(s: SparkSession, rows: Long): Int = {
    val cur = s.conf.get("spark.sql.shuffle.partitions").toInt
    val per = s.conf.getOption("spark.graft.loop.rowsPerPartition")
      .map(_.toLong).getOrElse(16384L)
    math.max(1L, math.min(cur.toLong, (rows + per - 1) / per)).toInt
  }

  /** The parent session itself when the derived count is not smaller,
    * else a clone carrying the derived shuffle-partition count. */
  def sessionFor(parent: SparkSession, rows: Long): SparkSession = {
    val p = partitionsFor(parent, rows)
    if (p >= parent.conf.get("spark.sql.shuffle.partitions").toInt) parent
    else {
      val s2 = parent.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", p.toString)
      s2
    }
  }

  /** `df` re-bound to session `s` (no-op when already there): the frames a
    * loop iterates over execute under the loop's sized session; the frame
    * an operator returns is re-bound to the CALLER's session so downstream
    * plans keep cluster-sized parallelism. */
  def rebind(df: DataFrame, s: SparkSession): DataFrame =
    if (df.sparkSession eq s) df
    else org.apache.spark.sql.graft.ColumnBridge.ofRows(s,
      org.apache.spark.sql.graft.ColumnBridge.logicalPlan(df))
}
