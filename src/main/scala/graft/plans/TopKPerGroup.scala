package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical "keep the first k rows per group under `order`" operator.
  *
  * The built-in way to express this — `row_number().over(window) <= k` —
  * must fully SORT every group (a window sort of the whole dataset).
  * This operator instead keeps a bounded heap of k rows per group, in two
  * stages: a partial pass on each input partition (so at most
  * k·groups·partitions rows reach the exchange — at 100 TB the shuffle
  * carries k rows per group per map task, not the table), then a final
  * pass after clustering by the group key. O(n log k) compute, no full
  * sort, tiny shuffle.
  *
  * The order must be total (include a tiebreak column) for deterministic
  * results.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial exec + final exec
  * (EnsureRequirements inserts the hash exchange between them from the
  * final stage's required distribution). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, planLater(child), partial = true)
      TopKPerGroupExec(g, o, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per group. `partial = true` runs on the
  * map side with no distribution requirement; the final stage requires
  * clustering by the group key, so each group's survivors meet in one
  * partition and the same algorithm yields the exact answer.
  *
  * Memory: k rows per distinct group per partition, no spill (like
  * hash-agg pre-Tungsten) — for extreme group cardinality per partition,
  * fall back to the window formulation. */
final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs
    val ord = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val cmp = GenerateOrdering.generate(ord, childOutput)
      // heap head = the worst kept row (last in sort order)
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      val groups = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = groups.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, heapCmp)
          groups.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(row.copy())
        } else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      groups.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
