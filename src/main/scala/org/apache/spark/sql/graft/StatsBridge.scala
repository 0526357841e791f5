package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper, V2ScanRelationPushDown}

/** A [[V1ScanWrapper]] that FORWARDS the wrapped scan's statistics.
  *
  * Spark's pushdown wraps every `V1Scan` in a plain [[V1ScanWrapper]],
  * which does not implement [[SupportsReportStatistics]] — so a
  * V1-bridged source's row counts and ANALYZE column statistics never
  * reach `DataSourceV2ScanRelation.computeStats`, and the CBO
  * (filter-cardinality estimation, join reorder) sees only the 8-EiB
  * default. This subclass restores the interface by delegating to the
  * wrapped scan; the V1 execution fallback still matches it through the
  * parent's extractor, so planning is otherwise unchanged.
  */
class StatsV1ScanWrapper(v1: V1Scan,
    handled: Seq[org.apache.spark.sql.sources.Filter],
    ops: PushedDownOperators)
  extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {

  override def estimateStatistics(): Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // NOT equal to the plain wrapper it replaces — the parent case class
  // compares by fields alone, and TreeNode.transformUp drops any
  // replacement that fastEquals the original (the rewrap would silently
  // revert). canEqual keeps the asymmetry out of the parent's equals.
  override def canEqual(other: Any): Boolean =
    other.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper =>
      s.v1Scan == v1 && s.handledFilters == handled &&
        s.pushedDownOperators == ops
    case _ => false
  }
  override def hashCode(): Int = 31 * super.hashCode() + 1
}

/** Pre-CBO rule: make V1-bridged scan statistics visible to the CBO.
  *
  * The ordering problem: Spark's "Pre CBO Rules" batch runs BEFORE
  * "Early Filter and Projection Push-Down", but the statistics-bearing
  * scans only exist AFTER pushdown (and "Join Reorder" follows
  * immediately — there is no injection point between the two). Since
  * Pre-CBO is the batch directly adjacent to pushdown, this rule runs
  * Spark's own [[V2ScanRelationPushDown]] one batch early (the real
  * batch then no-ops on the already-converted scans) and re-wraps each
  * V1 scan in the stats-forwarding wrapper, so "Join Reorder" and
  * filter-cardinality estimation see real row counts and ANALYZE
  * column statistics.
  *
  * Tightly scoped: CBO sessions only, pure READ plans only (commands,
  * CTAS, DML and streaming writes keep the stock pipeline — row-level
  * operation planning must see the un-converted relation), and only
  * when a graft table is actually in the plan.
  */
class ForwardV1ScanStats extends Rule[LogicalPlan] {

  private def hasGraftRelation(plan: LogicalPlan): Boolean =
    plan.exists {
      case r: DataSourceV2Relation =>
        r.table.isInstanceOf[graft.sources.GraftSqlTable]
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.cboEnabled) return plan
    if (plan.exists(_.isInstanceOf[Command])) return plan
    if (!hasGraftRelation(plan)) return plan
    V2ScanRelationPushDown(plan).transformUp {
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper if !w.isInstanceOf[StatsV1ScanWrapper] &&
            w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
          r.copy(scan = new StatsV1ScanWrapper(w.v1Scan, w.handledFilters,
            w.pushedDownOperators))
        case _ => r
      }
    }
  }
}
