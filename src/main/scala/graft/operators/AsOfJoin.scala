package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row
  * with `right.time <= left.time` for the same key.
  *
  * Implementation is the union + last-non-null-over-window trick: tag both
  * sides, sort each key's timeline once, and propagate the most recent
  * right payload forward. ONE sort-merge pass over (key, time) — no
  * per-row lookups, no range-join explosion; exactly the plan you want at
  * 100 TB where both sides shuffle once by key and stream in time order.
  *
  * Determinism: right rows at the same (key, time) are ordered by the
  * carried struct, so the maximum payload wins ties; left rows sort after
  * right rows at equal times (as-of is inclusive).
  */
object AsOfJoin {

  /** @param carry right-side columns to attach, as (outputName, column) —
    *              evaluated against `right`. Left columns pass through. */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      carry: Seq[(String, Column)]): DataFrame = {
    require(carry.nonEmpty, "carry at least one right-side column")
    val leftCols = left.columns.toSeq
    require(carry.map(_._1).forall(n => !leftCols.contains(n)),
      s"carry names collide with left columns: ${carry.map(_._1).intersect(leftCols).mkString(",")}")
    val carryStruct = struct(carry.map { case (n, c) => c.as(n) }: _*)
    val l = left.select(
      struct(leftCols.map(col): _*).as("__l"),
      leftKey.as("__k"), leftTime.as("__t"),
      lit(null).cast(right.select(carryStruct).schema.head.dataType).as("__c"),
      lit(1).as("__is_l"))
    val r = right.select(
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("__l"),
      rightKey.as("__k"), rightTime.as("__t"),
      carryStruct.as("__c"),
      lit(0).as("__is_l"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__is_l"), col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__c"), ignoreNulls = true).over(w))
      .where(col("__is_l") === 1)
      .select(leftCols.map(n => col(s"__l.$n").as(n)) ++
        carry.map { case (n, _) => col(s"__asof.$n").as(n) }: _*)
  }
}
