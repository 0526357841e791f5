package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `graft_table('<path>'[, <version>])` — the TABLE-VALUED FUNCTION that
  * plugs the manifest format into plain SQL, the way `range(10)` plugs
  * in a sequence: `SELECT ... FROM graft_table('/w/t') t JOIN ...`,
  * with an optional second literal for `VERSION AS OF` time travel.
  *
  * A TVF is the lightest correct integration point: it resolves during
  * analysis with the active session in scope, returns the SAME analyzed
  * relation `ManifestTable.read` builds for the DataFrame API (so MoR
  * reconciliation, per-file deletion vectors, data skipping and the
  * manifest's size estimates all apply identically to SQL reads), and
  * needs no catalog plugin or DataSource V2 shim. Registered at session
  * build via [[GraftExtensions]] (`injectTableFunction` — the cluster
  * `--conf spark.sql.extensions` path) or into a live session via
  * `GraftExtensions.register`.
  */
object GraftTableFunction {

  def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.nonEmpty && exprs.size <= 2,
      "graft_table(path[, version]) takes one or two arguments")
    def evalLit(e: Expression, what: String): Any = {
      require(e.foldable, s"graft_table: $what must be a literal")
      val v = e.eval()
      require(v != null, s"graft_table: $what must not be NULL")
      v
    }
    val path = String.valueOf(evalLit(exprs.head, "path"))
    val version = exprs.lift(1).map(e => evalLit(e, "version") match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => throw new IllegalArgumentException(
        s"graft_table: version must be an integer literal, got $other")
    })
    // the analyzer invokes TVF builders with the active session set —
    // the same contract Spark's own session-dependent TVFs rely on
    org.apache.spark.sql.graft.ColumnBridge.logicalPlan(
      graft.sources.ManifestTable.read(SparkSession.active, path, version))
  }

  /** `graft_detail('<path>')` — DESCRIBE DETAIL as a TVF: the current
    * version's one-row summary (files, delete ledger, bytes, recorded
    * and live rows, contract metadata) from plain SQL. */
  def buildDetail(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "graft_detail(path) takes one argument")
    require(exprs.head.foldable, "graft_detail: path must be a literal")
    val path = String.valueOf(exprs.head.eval())
    org.apache.spark.sql.graft.ColumnBridge.logicalPlan(
      graft.sources.ManifestTable.detail(SparkSession.active, path))
  }

  /** `graft_history('<path>')` — DESCRIBE HISTORY as a TVF: the audit
    * surface (versions, commit timestamps/ids, file and row deltas,
    * constraint/merge-key metadata) queryable and joinable from plain
    * SQL, the way an operator actually inspects a table. */
  def buildHistory(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "graft_history(path) takes one argument")
    require(exprs.head.foldable, "graft_history: path must be a literal")
    val path = String.valueOf(exprs.head.eval())
    org.apache.spark.sql.graft.ColumnBridge.logicalPlan(
      graft.sources.ManifestTable.history(SparkSession.active, path))
  }

  /** `graft_changes('<path>', <from>, <to>)` — Delta's `table_changes`
    * as a TVF: the CHANGE FEED over `(from, to]` from plain SQL (table
    * columns + `_change_type` + `_commit_version`), on the same
    * per-version contract the streaming CDF source enforces
    * ([[graft.sources.ManifestTable.changeFeed]]). The SQL door of the
    * one change feed the API and streams already share. */
  def buildChanges(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3,
      "graft_changes(path, fromVersion, toVersion) takes three arguments")
    exprs.foreach(e => require(e.foldable,
      "graft_changes: every argument must be a literal"))
    def longOf(e: Expression, what: String): Long = e.eval() match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => throw new IllegalArgumentException(
        s"graft_changes: $what must be an integer literal, got $other")
    }
    val path = String.valueOf(exprs.head.eval())
    org.apache.spark.sql.graft.ColumnBridge.logicalPlan(
      graft.sources.ManifestTable.changeFeed(SparkSession.active, path,
        longOf(exprs(1), "fromVersion"), longOf(exprs(2), "toVersion")))
  }
}
