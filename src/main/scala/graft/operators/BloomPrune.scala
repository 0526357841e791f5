package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime join pruning — the semi-join reduction that decides
  * scan+shuffle cost for big fact↔dim joins at 100 TB. Spark's own
  * InjectRuntimeFilter applies this rewrite automatically only under narrow
  * conditions (selective creation-side filter, size thresholds); this
  * operator is the explicit form for when the pipeline KNOWS the dim side
  * is selective — e.g. a push run hydrating only the event-referenced
  * resource ids.
  *
  * Shape (same as InjectRuntimeFilter's, via the same expressions):
  * build = BloomFilterAggregate(XxHash64(key)) over the dim keys — one
  * map-side-combined agg, the collected sketch is KBs-to-MBs regardless of
  * fact size; probe = BloomFilterMightContain(sketch, XxHash64(key)) as a
  * fact-side Filter that evaluates BEFORE the join's exchange, so pruned
  * rows are never shuffled. The subsequent real join removes bloom false
  * positives, so the composed result is EXACT — the filter only cuts cost.
  *
  * Null fact keys hash to the xxhash64 seed (never null), may pass the
  * bloom, and are then dropped by the join — identical to Spark's builtin
  * runtime-filter semantics. */
object BloomPrune {

  /** Serialized bloom sketch over `build`'s key column, or None when the
    * build side has no rows (BloomFilterAggregate returns null then —
    * there is no sketch to probe, and for an inner join an empty build
    * side means an empty result). `expectedItems` sizes the filter
    * (default fpp from BloomFilterAggregate). */
  def tryBuildFilter(build: DataFrame, keyCol: String,
      expectedItems: Long = 1L << 20): Option[Array[Byte]] = {
    val key = ColumnBridge.expression(col(keyCol))
    val agg = new BloomFilterAggregate(new XxHash64(Seq(key)), expectedItems)
    Option(build
      .select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0))
  }

  /** Serialized bloom sketch over `build`'s key column; throws on an
    * empty build side — use [[tryBuildFilter]] when emptiness is a
    * legitimate outcome. */
  def buildFilter(build: DataFrame, keyCol: String,
      expectedItems: Long = 1L << 20): Array[Byte] =
    tryBuildFilter(build, keyCol, expectedItems).getOrElse(
      throw new IllegalArgumentException(
        s"empty build side: bloom over $keyCol is null"))

  /** Membership predicate for a probe column against a built sketch. */
  def mightContain(sketch: Array[Byte], probe: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(probe)))))

  /** Bloom-pruned inner equi-join: prune `fact` by a sketch of `dim`'s
    * keys, then join. Exact (false positives die in the join); the win is
    * the fact rows that never reach the exchange. An EMPTY dim side is a
    * legitimate input (a selective dim filter matching nothing) and
    * yields the inner join's correct empty result — the maximal prune,
    * not a crash. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1L << 20): DataFrame =
    tryBuildFilter(dim, dimKey, expectedItems) match {
      case Some(sketch) =>
        fact.where(mightContain(sketch, col(factKey)))
          .join(dim, col(factKey) === col(dimKey))
      case scala.None =>
        fact.where(lit(false)).join(dim, col(factKey) === col(dimKey))
    }
}
