package graft.cursor

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cursor mode, mirroring the reference (core/types.py:24-28). The mode
  * names the logical cursor field; [[CursorField]] maps it to a physical
  * column (the reference does the same via `json_schema_extra["cursor"]`
  * tags on native models, core/utils.py:150-181). */
sealed abstract class CursorMode(val name: String)
object CursorMode {
  case object Uid       extends CursorMode("uid")
  case object CreatedAt extends CursorMode("created_at")
  case object UpdatedAt extends CursorMode("updated_at")
}

/** Incremental-sync cursor (reference: core/types.py:30-34 `Cursor`).
  *
  * In the reference the cursor becomes HTTP params `date_range_min` /
  * `date_range_max` (core/utils.py:195-286 `build_cursor_query_params`) and
  * advance = the cursor field of the last row read in sort order
  * (core/connector.py:231-255 `_finalize_read_batch`).
  *
  * Here the cursor compiles to a range predicate — which Catalyst pushes to
  * the parquet scan, so at 100 TB an incremental pull prunes row groups by
  * min/max stats instead of scanning history — and advance is a single-row
  * `max` (asc) / `min` (desc) aggregation, i.e. one distributed partial-agg
  * pass, never a driver-side iteration.
  */
final case class Cursor(
    mode: CursorMode,
    start: Option[String] = None,
    end: Option[String] = None,
    ascending: Boolean = true) {

  /** Range predicate for the slice this cursor selects: in asc order start
    * is the lower bound and end the upper; desc swaps them (mirrors the
    * reference's start/end → min/max param swap, core/utils.py:259-284). */
  def slice(cursorCol: Column): Column = {
    val (lo, hi) = if (ascending) (start, end) else (end, start)
    val bounds =
      lo.map(v => cursorCol >= lit(v)).toSeq ++
      hi.map(v => cursorCol <= lit(v)).toSeq
    bounds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** The slice as [[graft.conditions.Condition]] values keyed on the
    * physical cursor column — what a metadata/stats-pruning SOURCE
    * consumes (the analogue of the reference's cursor → query-param
    * compilation, core/utils.py:195-286, pointed at a lake table's
    * manifest stats instead of an HTTP origin). */
  def conditions(field: String): Seq[graft.conditions.Condition] = {
    import graft.conditions.{Condition, Op}
    val (lo, hi) = if (ascending) (start, end) else (end, start)
    lo.map(v => Condition(field, Op.Gte, v)).toSeq ++
      hi.map(v => Condition(field, Op.Lte, v)).toSeq
  }

  /** Advance: compute the new `end` from the data actually selected.
    * Equivalent to "cursor value of the last row read in sort order". */
  def advance(df: DataFrame, cursorCol: Column): Cursor = {
    val agg = if (ascending) max(cursorCol) else min(cursorCol)
    val v = df.agg(agg.cast("string").as("cursor_end")).collect().headOption
      .flatMap(r => Option(r.getString(0)))
    copy(end = v.orElse(end))
  }
}
