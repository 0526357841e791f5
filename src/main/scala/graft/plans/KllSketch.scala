package graft.plans

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch => DsKllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches as native aggregates.
  *
  * The q103 story for COUNT DISTINCT — maintain per-batch sketch rows,
  * answer by union — applies verbatim to QUANTILES once the sketch is
  * mergeable: Spark ships HLL (`hll_sketch_agg`) but no quantile
  * sketch, so this registers one over the DataSketches KLL
  * implementation already on the classpath ([[KllSketchAgg]] builds a
  * sketch from values, [[KllUnionAgg]] merges serialized sketches,
  * [[KllQuantile]] reads an estimate out). `percentile_approx`'s
  * underlying digest is not exposed as a first-class value, which is
  * the whole point here: a sketch TABLE outlives the query, so a
  * maintained p99 over 100 TB folds each ingest batch's sketch rows in
  * O(batch) and answers from O(groups · k) bytes — no rescan.
  *
  * All three are TypedImperativeAggregate / eval expressions: the
  * per-partition buffer is the heap sketch object (updates are O(1)
  * amortized, no per-row serialization); bytes cross the wire only at
  * partial-merge boundaries, exactly like Spark's own HLL agg.
  *
  * KLL error is a RANK guarantee, not a value guarantee: k=200 bounds
  * |est_rank − true_rank| ≤ ~1.65% with 99% confidence
  * (`KllDoublesSketch.getNormalizedRankError`), and merging preserves
  * the bound — the q121 gate checks exactly that invariant.
  */
object KllSketchFns {
  /** DataSketches default; rank error ≈ 1.65% at 99% confidence. */
  val DefaultK = 200

  def rankError: Double =
    DsKllSketch.getNormalizedRankError(DefaultK, false)

  private[plans] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `graft_kll_agg(doubleCol)` → serialized KLL sketch of the values. */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def prettyName: String = "graft_kll_agg"
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllSketchFns.DefaultK)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch,
      b: KllDoublesSketch): KllDoublesSketch = { a.merge(b); a }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketchFns.heapify(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): KllSketchAgg = copy(child = newChild)
}

/** `graft_kll_union(sketchCol)` → serialized merge of the sketches. */
case class KllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def prettyName: String = "graft_kll_union"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllSketchFns.DefaultK)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllSketchFns.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: KllDoublesSketch,
      b: KllDoublesSketch): KllDoublesSketch = { a.merge(b); a }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketchFns.heapify(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): KllUnionAgg = copy(child = newChild)
}

/** `graft_kll_quantile(sketch, rank)` → estimated value at `rank`
  * (inclusive criteria, DataSketches' default). Null for an empty
  * sketch. Evaluated once per OUTPUT row (a handful of groups), so a
  * CodegenFallback eval is not on any hot path. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def prettyName: String = "graft_kll_quantile"
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(sketch: Any, rank: Any): Any = {
    val sk = KllSketchFns.heapify(sketch.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KllQuantile = copy(newLeft, newRight)
}
