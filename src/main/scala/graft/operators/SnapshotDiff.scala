package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the validation pass after any warehouse sync
  * (reference pull/push pipelines move slices between warehouses; this is
  * how you PROVE two sides agree, and what a CDC feed reduces to when the
  * origin only offers full snapshots): diff two keyed snapshots into
  * added / removed / changed rows with column-level change attribution.
  *
  * One full-outer shuffle join on the key — both sides hash-partitioned,
  * no data collected; at 100 TB this is the standard keyed reconcile
  * (co-bucketed layouts make it exchange-free, see BucketedTables).
  * Null-safe per-column compares (`<=>`), so null→value and value→null
  * both count as changes. */
object SnapshotDiff {

  /** Rows that differ between snapshots: (key, change_type ∈
    * added|removed|changed, changed_cols = comma-joined attribution,
    * empty for added/removed). Unchanged rows are dropped — at scale the
    * diff is the small output; emitting the agreement would re-emit the
    * corpus.
    *
    * CONTRACT: both snapshots are keyed (unique on `keyCol`) — a
    * duplicated key silently fans out the full-outer join and the diff
    * stops meaning anything. `assertUniqueKeys = true` buys a loud
    * failure for one extra aggregation pass per side; leave it off when
    * the snapshots come from a keyed store that already guarantees it. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      compareCols: Seq[String], assertUniqueKeys: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must name at least one column")
    if (assertUniqueKeys) Seq("old" -> oldSnap, "new" -> newSnap).foreach {
      case (side, df) =>
        val dup = df.groupBy(col(keyCol)).count().where(col("count") > 1).limit(1)
          .collect()
        require(dup.isEmpty,
          s"$side snapshot has duplicate key ${dup.head.get(0)} — " +
            s"snapshots must be unique on '$keyCol'")
    }
    val o = oldSnap.select(col(keyCol).as("__ko"),
      struct(compareCols.map(col): _*).as("__o"))
    val n = newSnap.select(col(keyCol).as("__kn"),
      struct(compareCols.map(col): _*).as("__n"))
    val changedCols: Column = concat_ws(",", compareCols.map { c =>
      when(!(col(s"__o.$c") <=> col(s"__n.$c")), lit(c))
    }: _*)
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .select(
        coalesce(col("__ko"), col("__kn")).as(keyCol),
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(changedCols =!= "", "changed")
          .otherwise("unchanged").as("change_type"),
        when(col("__o").isNotNull && col("__n").isNotNull, changedCols)
          .otherwise(lit("")).as("changed_cols"))
      .where(col("change_type") =!= "unchanged")
  }
}
