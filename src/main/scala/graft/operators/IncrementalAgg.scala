package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance — refresh a stored
  * `GROUP BY dims → (count, sums)` aggregate from a CHANGE FEED instead
  * of rescanning the base table (the classic delta-maintenance rule for
  * distributive aggregates, and the reason a 100 TB warehouse can keep
  * rollups fresh after a merge that touched 0.1% of keys: the refresh
  * cost is proportional to the DELTA, never the table).
  *
  * Input feed shape = [[SnapshotDiff.diffWithValues]] /
  * [[graft.sources.ManifestTable.changesWithValues]]: one row per
  * added/removed/changed key with `before`/`after` structs. Each feed
  * row explodes into ≤2 signed contributions — remove `before` (for
  * removed/changed), add `after` (for added/changed) — so a changed row
  * whose DIMENSION moved naturally splits into a −1 on the old group
  * and a +1 on the new one. Contributions aggregate per dim (one
  * map-side-combined shuffle over the delta), then merge into the
  * previous aggregate by full-outer join; groups whose count reaches 0
  * drop out.
  *
  * Measures are read as DECIMAL(18,4) but the SUMS are carried at the
  * WIDENED DECIMAL(28,4) end to end — Spark's own sum-over-decimal
  * result type. Re-casting a merged sum down to (18,4) would, under
  * default non-ANSI semantics, turn an overflow into a silent NULL in
  * the maintained state at large scale. Exact, order-independent, and
  * mergeable, so `applyDelta(applyDelta(mv, f1), f2)` equals one
  * refresh over the concatenated feeds. Only distributive measures
  * (count, sum) maintain this way; algebraic ones (avg) derive from
  * them; holistic ones (exact percentile) need the base table.
  */
object IncrementalAgg {

  private val dec = DecimalType(18, 4)
  // sum(DECIMAL(18,4)) in Spark is DECIMAL(28,4); the maintained state
  // keeps that type so the incremental MV never narrows what a full
  // recompute would produce
  private val sumDec = DecimalType(28, 4)

  /** Build the MV in the maintainable shape: dims, `n` = row count,
    * `sum_<m>` = exact decimal sum per measure, and (optionally)
    * `min_<m>`/`max_<m>` carried in the column's OWN type — min/max are
    * exactly representable, never quantized, so a rewrite serving them
    * is value-identical to the base scan. */
  def materialize(base: DataFrame, dims: Seq[String],
      measures: Seq[String], minMax: Seq[String] = Seq.empty): DataFrame =
    base.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.map(m => sum(col(m).cast(dec)).as(s"sum_$m")) ++
          minMax.flatMap(m => Seq(min(col(m)).as(s"min_$m"),
            max(col(m)).as(s"max_$m"))): _*)

  /** Apply a value-carrying change feed to a materialized aggregate.
    *
    * @param mv   previous state, shaped as [[materialize]] produced it
    * @param feed `diffWithValues` output whose `before`/`after` structs
    *             contain every dim and measure column
    */
  def applyDelta(mv: DataFrame, feed: DataFrame, dims: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    // signed contributions: (−1, −measures) from the before image,
    // (+1, +measures) from the after image. ONE pass over the feed: each
    // row explodes into its ≤2 images — the old two-branch union
    // referenced (and therefore re-executed) the feed's diff-join twice
    // in one plan. Sign stays an INTEGER literal column so the decimal
    // multiply's result type is unchanged.
    val signed = feed
      .select(explode(array(
        struct(col("before").as("img"), lit(-1).as("__sign")),
        struct(col("after").as("img"), lit(1).as("__sign")))).as("e"))
      .where(col("e.img").isNotNull)
      .select(
        dims.map(d => col(s"e.img.$d").as(d)) ++
          (col("e.__sign").cast("long").as("__dn") +:
            measures.map(m =>
              (col(s"e.img.$m").cast(dec) * col("e.__sign")).as(s"__d_$m"))): _*)
    fold(mv, signed, dims, measures)
  }

  /** [[applyDelta]] for the FLAT change-feed row shape the STREAMING
    * source emits (`readChangeFeed`: table columns + `_change_type` +
    * `_commit_version`): delete/update_preimage rows contribute
    * (−1, −measures), insert/update_postimage rows (+1, +measures) —
    * the Delta-CDF-to-incremental-MV consumer, safe to fold one
    * micro-batch at a time (deltas are additive, so batch boundaries
    * between commits don't matter). */
  def applyCdf(mv: DataFrame, feed: DataFrame, dims: Seq[String],
      measures: Seq[String], minMax: Seq[String] = Seq.empty): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    // min/max are append-monotone ONLY: a delete may remove the very
    // row holding a group's extreme, which no fold can undo — refuse so
    // the caller's standard fallback (full recompute) takes over
    if (minMax.nonEmpty && !feed
        .where(col("_change_type").isin("delete", "update_preimage"))
        .isEmpty)
      throw new IllegalStateException(
        "min/max measures cannot fold deletes - full refresh required")
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1)
      .when(col("_change_type").isin("delete", "update_preimage"), -1)
    val signed = feed.where(sign.isNotNull)
      .select(dims.map(col) ++
        (sign.cast("long").as("__dn") +:
          (measures.map(m => (col(m).cast(dec) * sign).as(s"__d_$m")) ++
            minMax.flatMap(m => Seq(col(m).as(s"__mn_$m"),
              col(m).as(s"__mx_$m"))))): _*)
    fold(mv, signed, dims, measures, minMax)
  }

  /** Shared delta fold: aggregate signed contributions per dim group,
    * full-outer-merge into the previous state (null-safe dims), drop
    * emptied groups. */
  private def fold(mv: DataFrame, signed: DataFrame, dims: Seq[String],
      measures: Seq[String], minMax: Seq[String] = Seq.empty): DataFrame = {
    val delta = signed
      .groupBy(dims.map(col): _*)
      .agg(sum(col("__dn")).as("__dn"),
        measures.map(m => sum(col(s"__d_$m")).cast(sumDec).as(s"__d_$m")) ++
          minMax.flatMap(m => Seq(min(col(s"__mn_$m")).as(s"__mn_$m"),
            max(col(s"__mx_$m")).as(s"__mx_$m"))): _*)
    val joined = mv.join(delta,
      dims.map(d => mv(d) <=> delta(d)).reduce(_ && _), "full_outer")
    joined.select(
      dims.map(d => coalesce(mv(d), delta(d)).as(d)) ++
        (coalesce(mv("n"), lit(0L)).plus(coalesce(delta("__dn"), lit(0L))).as("n") +:
          (measures.map(m =>
            (coalesce(mv(s"sum_$m"), lit(0).cast(sumDec)) +
              coalesce(delta(s"__d_$m"), lit(0).cast(sumDec))).cast(sumDec)
              .as(s"sum_$m")) ++
            // least/greatest skip nulls: a new group takes the delta's
            // extreme, an untouched group keeps its own
            minMax.flatMap(m => Seq(
              least(mv(s"min_$m"), delta(s"__mn_$m")).as(s"min_$m"),
              greatest(mv(s"max_$m"), delta(s"__mx_$m")).as(s"max_$m"))))): _*)
      .where(col("n") > 0)
  }
}
