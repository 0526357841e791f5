package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V1ScanWrapper}

import graft.sources.{GraftScan, GraftSqlTable, ManifestTable}

/** Restore SIZE-BASED JOIN PLANNING for catalog scans.
  *
  * [[graft.sources.GraftScan]] bridges to execution through Spark's
  * `V1Scan`, and the optimizer's `V1ScanWrapper` reports no statistics
  * — every V1-bridged scan costs the 8-EiB default, so a SQL join over
  * a catalog table would NEVER broadcast it, however small it is (and
  * a MoR delete ledger makes the miss arbitrarily bad: a 100 TB table
  * whose live remainder is megabytes still plans as 100 TB+). This rule
  * re-derives the decision the planner would make if it could see the
  * manifest: when a join side is a graft scan (under row-preserving
  * Project/Filter wrappers only) whose MANIFEST-estimated live bytes —
  * post file-pruning, post delete-ledger, scaled to the pruned column
  * set — fit the session's auto-broadcast threshold, the join's hint
  * slot for that side is filled with BROADCAST. Explicit user hints are
  * never overridden, and a side whose estimate exceeds the threshold is
  * left alone (the conservative 8-EiB default then correctly shuffles).
  *
  * Registered two ways, so it matches both plan shapes:
  * - `spark.sql.extensions=graft.plans.GraftExtensions` injects it into
  *   operator optimization (PRE-pushdown: the side is still a
  *   [[DataSourceV2Relation]] carrying [[GraftSqlTable]] — whole-table
  *   estimate);
  * - `GraftExtensions.register`/[[GraftJoinSize.install]] appends it to
  *   `experimental.extraOptimizations` (POST-pushdown: the side is a
  *   [[DataSourceV2ScanRelation]] wrapping the pushed [[GraftScan]] —
  *   pruning-aware estimate).
  */
class GraftJoinSizeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, _, hint) =>
      val lh = hint.leftHint.orElse(sideHint(left))
      val rh = hint.rightHint.orElse(sideHint(right))
      if (lh == hint.leftHint && rh == hint.rightHint) j
      else j.copy(hint = JoinHint(lh, rh))
  }

  /** BROADCAST when the side bottoms out (through row-preserving
    * wrappers only) in a graft scan whose live estimate fits the
    * threshold. */
  private def sideHint(side: LogicalPlan): Option[HintInfo] = {
    val thr = conf.autoBroadcastJoinThreshold
    if (thr <= 0) return None
    scanBytes(strip(side)).collect {
      case bytes if bytes <= thr => HintInfo(strategy = Some(BROADCAST))
    }
  }

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, child)       => strip(child)
    case Filter(_, child)        => strip(child)
    case SubqueryAlias(_, child) => strip(child)
    case other                   => other
  }

  private def scanBytes(p: LogicalPlan): Option[Long] = p match {
    // post-pushdown (extraOptimizations position): the scan carries its
    // pushed predicates — the estimate sees file pruning
    case r: DataSourceV2ScanRelation => r.scan match {
      case V1ScanWrapper(g: GraftScan, _, _) => liveBytes(g)
      case g: GraftScan                      => liveBytes(g)
      case _                                 => None
    }
    // pre-pushdown (extension-injected position): whole-table estimate
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSqlTable if ManifestTable.versions(t.path).nonEmpty =>
        ManifestTable.estimatedLive(t.path, t.snapshot).map(_._2)
      case t: GraftSqlTable => Some(0L)
      case _                => None
    }
    case _ => None
  }

  private def liveBytes(g: GraftScan): Option[Long] = {
    val s = g.estimateStatistics().sizeInBytes()
    if (s.isPresent) Some(s.getAsLong) else None
  }
}

object GraftJoinSize {
  /** Append to an already-built session (the `extraOptimizations` slot
    * — runs post-pushdown). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftJoinSizeRule]))
      spark.experimental.extraOptimizations = cur :+ new GraftJoinSizeRule
  }
}
