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

  /** [[diff]] carrying the row VALUES: `before`/`after` structs of
    * `compareCols` (null on the added/removed side respectively). This is
    * the feed shape an incremental consumer needs to APPLY the change —
    * e.g. maintaining a downstream aggregate by signed deltas
    * ([[IncrementalAgg]]) — not merely to know which keys moved. */
  def diffWithValues(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame =
    diffWithValues(oldSnap, newSnap, Seq(keyCol), compareCols)

  /** One loud-failure uniqueness probe per side (limit-1 dup scan) —
    * shared by [[diff]]'s opt-in flag and the manifest CDC path, where
    * it runs on the O(diff) slices by DEFAULT (the keyed contract is
    * enforced, not assumed, and the cost tracks the change, not the
    * table). */
  def assertKeyed(side: String, df: DataFrame, keyCols: Seq[String]): Unit = {
    val dup = df.groupBy(keyCols.map(col): _*).count()
      .where(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$side snapshot has duplicate key ${dup.headOption.map(_.get(0))} — " +
        s"snapshots must be unique on ${keyCols.mkString("(", ",", ")")}")
  }

  /** Both-sides [[assertKeyed]] in ONE job: the sides are tagged and
    * grouped by (side, key), so a key present once on each side passes
    * while a duplicate within either side fails with that side named —
    * identical semantics to two per-side probes at half the action
    * count (this guard runs on every CDC slice pair). */
  def assertKeyedBoth(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): Unit = {
    val dup = before.select(lit("before").as("__side") +: keyCols.map(col): _*)
      .unionByName(after.select(lit("after").as("__side") +: keyCols.map(col): _*))
      .groupBy(("__side" +: keyCols).map(col): _*).count()
      .where(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"${dup.headOption.map(_.getString(0)).getOrElse("")} snapshot has " +
        s"duplicate key ${dup.headOption.map(_.get(1))} — " +
        s"snapshots must be unique on ${keyCols.mkString("(", ",", ")")}")
  }

  /** Composite-key [[diffWithValues]] (a lineitem-style table is keyed
    * on (orderkey, linenumber) — single-column keys are the special
    * case). Null-safe key equality: a null key component matches a null
    * component, never a value. */
  def diffWithValues(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "compareCols must name at least one column")
    val o = oldSnap.select(
      keyCols.map(k => col(k).as(s"__ko_$k")) :+
        struct(compareCols.map(col): _*).as("before"): _*)
    val n = newSnap.select(
      keyCols.map(k => col(k).as(s"__kn_$k")) :+
        struct(compareCols.map(col): _*).as("after"): _*)
    val changedCols: Column = concat_ws(",", compareCols.map { c =>
      when(!(col(s"before.$c") <=> col(s"after.$c")), lit(c))
    }: _*)
    o.join(n,
        keyCols.map(k => col(s"__ko_$k") <=> col(s"__kn_$k")).reduce(_ && _),
        "full_outer")
      .select(
        keyCols.map(k => coalesce(col(s"__ko_$k"), col(s"__kn_$k")).as(k)) ++
          Seq(
            when(col("before").isNull, "added")
              .when(col("after").isNull, "removed")
              .when(changedCols =!= "", "changed")
              .otherwise("unchanged").as("change_type"),
            col("before"), col("after")): _*)
      .where(col("change_type") =!= "unchanged")
  }
}
