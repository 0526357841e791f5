package graft.operators

import org.apache.spark.sql.DataFrame

/** Scope-based lifecycle for materialized operator state.
  *
  * Multi-pass operators (PPJoin's shingle/prefix index, MinHash's band
  * buckets, similarity's unit-vector table) must materialize their index
  * (localCheckpoint row blocks — SURVEY §5b lesson 2) or Catalyst inlines
  * the construction expressions into every downstream branch. But a
  * checkpoint without a release LEAKS: measured 3.6× inflation (17.8s vs
  * 4.9s) on dd4 when it ran after dd3 in one session, because each
  * operator's index blocks lingered and degraded the next operator. On a
  * cluster the equivalent persist() leak degrades every downstream stage
  * until OOM-pressure eviction.
  *
  * IndexScope makes the release structural: `IndexScope.scoped { sc =>
  * ... }` materializes every `sc.index(df)` frame for the duration of the
  * body, eagerly materializes the RESULT frame the body returns — so the
  * returned plan reads its own compact blocks and can never re-execute
  * index lineage — and then releases all index storage. What outlives the
  * scope is O(result), not O(index): for dedup/similarity operators the
  * result is the pair/top-k subset, orders of magnitude smaller than the
  * corpus-sized index. Cluster equivalent: persist(DISK) + unpersist, or
  * a temp table dropped after the last consumer.
  */
object IndexScope {

  final class Scope private[IndexScope] () {
    private[IndexScope] val held =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    /** Materialize `df` as index state owned by this scope: row-format
      * checkpoint blocks, released when the scope closes. */
    def index(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint()
      held += c
      c
    }

    /** Adopt an ALREADY-checkpointed frame (e.g. the surviving state of a
      * driver fixpoint loop that checkpoints each round itself) so its
      * blocks are released when the scope closes — without re-checkpointing.
      * Without this, a loop's final-round checkpoint would outlive the
      * scope for the JVM lifetime, the exact leak IndexScope exists to
      * prevent. */
    def own(df: DataFrame): DataFrame = {
      held += df
      df
    }
  }

  /** Run `body` with a fresh scope; eagerly materialize the frame it
    * returns, then release every `index()` frame's storage. */
  def scoped(body: Scope => DataFrame): DataFrame = {
    val sc = new Scope
    try body(sc).localCheckpoint() // eager: result pinned before release
    finally sc.held.foreach(release)
  }

  /** Release the checkpoint blocks of a frame this code PROVES is dead:
    * callers invoke it only after every consumer of the frame has been
    * materialized (scoped() result, or a superseded iteration state), so
    * the released lineage can never need recomputation. Spark logs a
    * blanket WARN on unpersisting any locally-checkpointed RDD because it
    * cannot know that; the warning is silenced for this (synchronous)
    * call only, restoring the logger level after. */
  /** Serializes logger mutation across concurrent releases: without it,
    * two releases could interleave read-prev/set/restore and leave the
    * package logger pinned at ERROR for the rest of the JVM. */
  private val releaseLock = new Object

  def release(df: DataFrame): Unit = releaseLock.synchronized {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    // the warning is logged under the concrete RDD subclass's logger
    // (e.g. o.a.s.rdd.MapPartitionsRDD), so silence the rdd package;
    // unrelated rdd-package warnings emitted during this (synchronous,
    // sub-millisecond) window are the accepted cost
    val name = "org.apache.spark.rdd"
    val prev = LogManager.getLogger(name).getLevel
    Configurator.setLevel(name, Level.ERROR)
    try org.apache.spark.sql.graft.ColumnBridge.unpersistLocalCheckpoint(df)
    finally Configurator.setLevel(name, prev)
  }
}
