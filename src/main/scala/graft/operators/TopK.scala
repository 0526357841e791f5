package graft.operators

import graft.plans.{TopKPerGroup, TopKStrategy}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graft.ColumnBridge

/** Top-k rows per group via the custom [[graft.plans.TopKPerGroup]]
  * operator (bounded heaps + partial map-side stage) instead of a window
  * sort. Pass `orderCols` with explicit direction (`col.desc`) and a
  * tiebreak for determinism. */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    // Column-API expressions arrive as opaque ColumnNode wrappers the
    // analyzer won't resolve inside a custom node: lift the resolved
    // SortOrder from an analyzed Sort plan, and resolve group keys by
    // name against the child's output attributes
    val (order, child) = ColumnBridge.logicalPlan(df.sort(orderCols: _*)) match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(s"expected Sort plan, got $other")
    }
    val g = groupCols.map { name =>
      child.output.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"no such group column: $name among ${child.output.map(_.name).mkString(",")}"))
    }
    ColumnBridge.ofRows(spark, TopKPerGroup(g, order, k, child))
  }
}
