package graft.pipeline

import graft.conditions.{Condition, Conditions}
import graft.cursor.Cursor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result counters of a push run (reference: core/types.py:74-80
  * `PushResult`, including the `errors` list core/pipeline.py:119).
  * Computed in ONE distributed pass as conditional aggregates — the
  * reference counts per-row in a Python loop (core/pipeline.py:114-199);
  * at scale that loop becomes a single partial-aggregated `agg` over the
  * joined plan. `errors` counts per-record format failures (the rows
  * [[Pipeline.safeFormat]] isolates); the failing rows themselves are a
  * DataFrame side-channel, not a driver-side list. */
final case class PushResult(
    totalEvents: Long,
    totalResourcesFetched: Long,
    totalResourcesPushed: Long,
    skippedMissing: Long,
    skippedHaving: Long,
    errors: Long = 0)

/** Batch pipelines re-expressing the reference's pull/push semantics
  * (reference: core/pipeline.py:18-211) as declarative Spark plans.
  *
  * The reference iterates cursor batches in a driver loop because its
  * sources are paginated HTTP APIs. On a data lake the whole incremental
  * slice is one declarative plan: cursor range + WHERE compile to pushed
  * scan filters, HAVING stays a post-filter, the formatter is a narrow
  * projection. No driver-side batching — Spark partitions the scan.
  */
object Pipeline {

  /** Incremental pull: source → cursor slice → WHERE → HAVING → format.
    *
    * WHERE vs HAVING placement mirrors the reference (WHERE pushed to the
    * origin read, HAVING applied after, core/pipeline.py:42-58): `where` is
    * applied directly on the scan (pushdown-eligible), `having` after the
    * formatter-input rows are materialized in the plan.
    */
  def pull(
      source: DataFrame,
      cursorCol: String,
      cursor: Cursor,
      where: Seq[Condition] = Nil,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity): DataFrame = {
    val sliced   = source.where(cursor.slice(col(cursorCol)))
    val filtered = sliced.where(Conditions.all(where))
    val posted   = filtered.where(Conditions.all(having))
    format(posted)
  }

  /** Pull + cursor advance (reference returns `Cursor(start, end=last)`,
    * core/pipeline.py:77). `advance` is a single max/min agg action. */
  def pullWithCursor(
      source: DataFrame,
      cursorCol: String,
      cursor: Cursor,
      where: Seq[Condition] = Nil,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity): (DataFrame, Cursor) = {
    val out = pull(source, cursorCol, cursor, where, having, format)
    // advance from the pre-format slice (the formatter may drop the column)
    val slice = source.where(cursor.slice(col(cursorCol)))
      .where(Conditions.all(where))
    (out, cursor.advance(slice, col(cursorCol)))
  }

  /** EVENTS-mode push (reference: core/pipeline.py:121-178): events carry a
    * resource id; fetch the native resources (here: an equi-join), skip
    * events whose resource is missing, apply HAVING on the joined resource,
    * format, and hand back the rows to write.
    *
    * Scale: the join shuffles on the resource id unless `resources` is
    * broadcast-sized — callers pass `broadcast(resources)` for dimension
    * tables. `fetch_resources_by_events` batching disappears: the join IS
    * the batched fetch.
    */
  def pushEvents(
      events: DataFrame,
      eventResourceIdCol: String,
      resources: DataFrame,
      resourceIdCol: String,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity): DataFrame = {
    val joined = events.join(
      resources,
      events(eventResourceIdCol) === resources(resourceIdCol),
      "inner")
    format(joined.where(Conditions.all(having)))
  }

  /** PushResult counters for an EVENTS-mode push, as one conditional-agg
    * pass over a LEFT join (missing resources survive as NULLs and are
    * counted, not dropped). */
  def pushEventsResult(
      events: DataFrame,
      eventResourceIdCol: String,
      resources: DataFrame,
      resourceIdCol: String,
      having: Seq[Condition] = Nil): DataFrame = {
    // null-safe HAVING: a predicate evaluating to NULL (null-valued field
    // under three-valued logic) does NOT pass, and the row must land in
    // skipped_having — `!havingCol` alone is NULL there too, and the row
    // would vanish from every counter except the total
    val passes = coalesce(Conditions.all(having), lit(false))
    val matched = resources(resourceIdCol).isNotNull
    events
      .join(resources, events(eventResourceIdCol) === resources(resourceIdCol), "left")
      .agg(
        count(lit(1)).as("total_events"),
        count(when(matched, 1)).as("total_resources_fetched"),
        count(when(matched && passes, 1)).as("total_resources_pushed"),
        count(when(!matched, 1)).as("skipped_missing"),
        count(when(matched && !passes, 1)).as("skipped_having"))
  }

  /** Apply an event stream to a target table — the tombstone semantics of
    * the reference's event model (JobEventType/ProfileEventType
    * created/updated/DELETED/ARCHIVED/upserted, core/types.py:53-66, and
    * `archived_at` on the resources, core/models.py:216,481), which q12's
    * latest-state resolution alone does not cover: a real sync must also
    * REMOVE deleted/archived resources from the target.
    *
    * Semantics (the standard CDC merge, expressed with core operators):
    *  1. resolve each key's LATEST event (tsCol desc, tieCol desc — same
    *     total order as q12);
    *  2. full-outer join with the target on the key;
    *  3. keys whose latest event is in `tombstones` are dropped (even if
    *     the key never reached the target: insert-then-delete is a no-op);
    *  4. other events upsert: `updates` maps target column → event column,
    *     overwritten when the event payload is non-null (null payload =
    *     no change); unmapped target columns pass through; keys new to the
    *     target become inserts with null unmapped columns;
    *  5. target rows without events pass through unchanged.
    *
    * One window pass + one shuffle join on the key. At scale the join is
    * the merge: partition both sides by the key (or bucket the target) and
    * the plan is the Delta/Iceberg MERGE equivalent without a table format.
    */
  def applyEvents(
      target: DataFrame,
      targetKey: String,
      events: DataFrame,
      eventKey: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      tombstones: Set[String],
      updates: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(eventKey)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val eventCols = updates.values.toSeq.distinct
    val latest = events
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(eventKey).as("__ek") +: col(typeCol).as("__et") +:
        eventCols.map(c => col(c).as(s"__ev_$c")): _*)
    val joined = target.join(latest, target(targetKey) === col("__ek"), "full_outer")
    val alive = joined.where(col("__et").isNull ||
      !col("__et").isin(tombstones.toSeq: _*))
    val outCols = target.columns.map { c =>
      if (c == targetKey) coalesce(target(targetKey), col("__ek")).as(c)
      else updates.get(c) match {
        case Some(ec) => coalesce(col(s"__ev_$ec"), target(c)).as(c)
        case None => target(c)
      }
    }
    alive.select(outCols.toSeq: _*)
  }

  /** RESOURCES-mode push (reference: core/pipeline.py:180-199): direct
    * batch push with HAVING + format. */
  def pushResources(
      resources: DataFrame,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity): DataFrame =
    format(resources.where(Conditions.all(having)))

  /** Error-isolated formatting (reference: core/utils.py:13
    * `safe_format_resources` try/excepts each record so one malformed row
    * doesn't fail the batch). Spark formatters are projections evaluated
    * under non-ANSI semantics, so the projection analogue of a per-record
    * exception is an INVALID OUTPUT: a required output column that comes
    * back null (failed cast, malformed JSON, missing field).
    *
    * Splits the formatted frame into (valid, errors): rows where every
    * `requiredCols` output is non-null, and the rest with an `error`
    * column naming the null fields — a distributed side-channel (write it
    * to a quarantine table) instead of the reference's driver-side string
    * list. Both frames share the formatted plan; a malformed row is
    * counted and skipped, never job-fatal. */
  def safeFormat(
      df: DataFrame,
      format: DataFrame => DataFrame,
      requiredCols: Seq[String]): (DataFrame, DataFrame) = {
    require(requiredCols.nonEmpty, "safeFormat needs at least one required column")
    val formatted = format(df)
    val missing = array_compact(array(
      requiredCols.map(c => when(col(c).isNull, lit(c))): _*))
    val flagged = formatted.withColumn("__missing", missing)
    val valid = flagged.where(size(col("__missing")) === 0).drop("__missing")
    val errors = flagged.where(size(col("__missing")) > 0)
      .withColumn("error",
        concat(lit("null required field(s): "), concat_ws(",", col("__missing"))))
      .drop("__missing")
    (valid, errors)
  }

  /** [[pushResourcesResult]] plus the frames it counted: (counters,
    * valid-to-push, error side-channel — None when no required columns
    * were declared, so nothing can land there) — callers that both WRITE
    * the valid rows and REPORT the counters build the split once, so the
    * two can never desynchronize. */
  def pushResourcesResultWithOutput(
      resources: DataFrame,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity,
      requiredCols: Seq[String] = Nil): (DataFrame, DataFrame, Option[DataFrame]) = {
    // null-safe HAVING — same accounting rule as pushEventsResult
    val passes = coalesce(Conditions.all(having), lit(false))
    val source = resources.agg(
      count(lit(1)).as("total_resources_fetched"),
      count(when(!passes, 1)).as("skipped_having"))
    val (valid, errors) = requiredCols match {
      case Nil => (format(resources.where(passes)), None)
      case req =>
        val (v, e) = safeFormat(resources.where(passes), format, req)
        (v, Some(e))
    }
    val pushed = valid.agg(count(lit(1)).as("total_resources_pushed"))
    val errs = errors.fold(
      pushed.sparkSession.range(1).select(lit(0L).as("errors")))(
      _.agg(count(lit(1)).as("errors")))
    (source.crossJoin(pushed).crossJoin(errs), valid, errors)
  }

  /** PushResult counters for an error-isolated RESOURCES-mode push
    * (core/pipeline.py:180-199 + the `errors` accumulation at :119):
    * HAVING skips count pre-format, format failures count as `errors`,
    * survivors as pushed. Two conditional-agg passes (source counters +
    * formatted counters — validity is only observable through the
    * formatter's projection) joined into one single-row frame; with
    * column pruning each pass scans only the columns it needs. */
  def pushResourcesResult(
      resources: DataFrame,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity,
      requiredCols: Seq[String] = Nil): DataFrame =
    pushResourcesResultWithOutput(resources, having, format, requiredCols)._1
}
