package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance from a change data
  * feed.
  *
  * The reference syncs warehouse resources by replaying per-resource
  * change events onto the store (core/pipeline.py:83 — the
  * push-as-upsert loop); the history-preserving consumer of that
  * stream is the classic SCD2 dimension: each key carries one row per
  * attribute EPISODE with `[valid_from, valid_to)` commit-version
  * bounds and an `is_current` flag, so "what did this row look like at
  * version v" is a plain range predicate.
  *
  * Two code paths, one contract:
  *
  *  - [[foldStep]] — the incremental path. Given the CURRENT dimension
  *    and ONE commit's change rows, emit the merge rows (closed copies
  *    of superseded episodes + newly-opened episodes) that advance the
  *    dimension to that commit. Work is O(changed keys): the dimension
  *    is probed with a semi-join on the batch's keys (broadcast-able —
  *    a CDC batch is small next to the dimension), history is never
  *    rescanned, and the merge touches only the files holding those
  *    keys (per-file stats skip the rest).
  *  - [[fromFeed]] — the one-shot path. Rebuild the whole dimension
  *    from a complete change feed with a single window pass: each
  *    opening event (insert / update_postimage) is an episode whose
  *    `valid_to` is the key's next change of any kind (a later update
  *    closes it with its postimage's version, a delete closes it and
  *    opens nothing).
  *
  * The streaming gate (SparkEntry q120) requires the two paths to
  * agree row-for-row, so every incremental fold is checked against the
  * declarative recompute it replaces.
  */
object Scd2 {

  private val Opening = Seq("insert", "update_postimage")

  /** Merge rows advancing `dim` by one commit's change rows.
    *
    * The result is keyed by `keyCols :+ "valid_from"`: closed copies
    * carry an existing (key, valid_from) and update that episode in
    * place; opened rows carry (key, version) — a fresh episode key —
    * and insert. One `ManifestTable.merge` per commit applies both.
    *
    * `changes` must hold exactly one commit (`_commit_version` is not
    * consulted — the caller passes the version so a replayed batch
    * folds identically).
    */
  def foldStep(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], version: Long): DataFrame = {
    val rows = changes.where(col("_change_type") =!= "update_preimage")
    // keys whose current episode this commit supersedes
    val closing = rows
      .where(col("_change_type").isin("update_postimage", "delete"))
      .select(keyCols.map(col): _*).distinct()
    val closed = dim.where(col("is_current"))
      .join(closing, keyCols, "left_semi")
      .withColumn("valid_to", lit(version))
      .withColumn("is_current", lit(false))
    val opened = rows
      .where(col("_change_type").isin(Opening.map(lit): _*))
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        lit(version).as("valid_from"): _*)
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    closed.unionByName(opened)
  }

  /** One-shot rebuild from a COMPLETE feed (all versions from the
    * table's first commit). Pre-images are dropped — within a version
    * the postimage is the episode's content and the pair shares its
    * `_commit_version`, so ordering by version alone is total per key
    * (a keyed merge commits at most one change per key). */
  def fromFeed(feed: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    val events = feed.where(col("_change_type") =!= "update_preimage")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version"))
    events
      .withColumn("valid_to", lead(col("_commit_version"), 1).over(w))
      .where(col("_change_type").isin(Opening.map(lit): _*))
      .select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col("_commit_version").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }
}
