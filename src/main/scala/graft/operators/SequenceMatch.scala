package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-pattern matching over an event stream — the funnel's
  * (SparkEntry q29) generalization to arbitrary step chains with
  * per-step time constraints, emitting the matched SPAN rather than
  * stage counts.
  *
  * Semantics are GREEDY-EARLIEST, the standard of funnel analytics
  * (and of MATCH_RECOGNIZE's default greedy quantifiers without
  * backtracking): step 1 binds to the key's earliest qualifying event;
  * step i binds to the earliest event satisfying its predicate that is
  * strictly after step i−1's binding and within `maxGap` of it. This
  * is deterministic and one-pass-per-step, but NOT existence-complete:
  * a key where only a LATER step-i candidate admits a full chain does
  * not match (no backtracking). Callers that need existence semantics
  * should widen the gap or reverse the pattern.
  *
  * Scale shape: each step is `filter(pred) → co-keyed join with the
  * accumulated bindings → partial-aggregated min` — the filter reaches
  * the scan (only step-relevant events are read per pass), the join
  * key is the same across all steps so AQE reuses the partitioning,
  * and the accumulator is one row per still-alive key, shrinking
  * monotonically. No per-key event-list materialization, no window
  * sort over the full stream.
  */
object SequenceMatch {

  /** One pattern step: events satisfying `predicate`, bound at most
    * `maxGap` (same units as the ts column) after the previous step. */
  case class Step(name: String, predicate: Column,
      maxGap: Option[Long] = None)

  /** Earliest greedy match per key; output = key + one `t_<name>`
    * column per step, rows only for keys completing the whole chain. */
  def earliest(events: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[Step]): DataFrame = {
    require(steps.nonEmpty, "pattern needs at least one step")
    require(steps.map(_.name).distinct.size == steps.size,
      "step names must be unique")
    val first = events.where(steps.head.predicate)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as(s"t_${steps.head.name}"))
    steps.tail.foldLeft((first, s"t_${steps.head.name}")) {
      case ((acc, prev), st) =>
        val gapOk = st.maxGap
          .map(g => col(tsCol) - col(prev) <= g).getOrElse(lit(true))
        val carried = acc.columns.toSeq
        val next = events.where(st.predicate)
          .join(acc, keyCol)
          .where(col(tsCol) > col(prev) && gapOk)
          .groupBy(carried.map(col): _*)
          .agg(min(col(tsCol)).as(s"t_${st.name}"))
        (next, s"t_${st.name}")
    }._1
  }
}
