package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable theta sketches as native aggregates — distinct-count SET
  * ALGEBRA.
  *
  * HLL (q103) unions losslessly but cannot intersect; theta sketches
  * keep a uniform hash SAMPLE of the key set, so A∩B (audience
  * overlap: "distinct users who did BOTH") is computable from two
  * already-built sketches — per-segment sketches built in ONE pass
  * over 100 TB intersect pairwise in O(k) on the driver, where the
  * exact answer would re-shuffle raw keys once per pair. The
  * reference's rating/profile filters (searchable boolean facets over
  * profile streams) ask exactly these overlap questions.
  *
  * [[ThetaSketchAgg]] builds from raw long keys, [[ThetaUnionAgg]]
  * merges serialized sketches (both buffer a theta `Union`, which
  * accepts raw updates AND sketch merges — one buffer type, no
  * copying); [[ThetaIntersectBounds]] intersects two serialized
  * sketches and returns `[lb, estimate, ub]` at 3 standard deviations
  * — the gate's contract is the library's own confidence interval, not
  * a hand-waved tolerance.
  */
object ThetaSketchFns {
  private[plans] def emptyUnion(): Union =
    SetOperation.builder().buildUnion()

  private[plans] def fromBytes(bytes: Array[Byte]): Union = {
    val u = emptyUnion()
    u.union(Memory.wrap(bytes))
    u
  }
}

/** `graft_theta_agg(longCol)` → serialized compact theta sketch. */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def prettyName: String = "graft_theta_agg"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketchFns.emptyUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaSketchFns.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaSketchAgg = copy(child = newChild)
}

/** `graft_theta_union(sketchCol)` → serialized union of the sketches. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def prettyName: String = "graft_theta_union"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketchFns.emptyUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaSketchFns.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaUnionAgg = copy(child = newChild)
}

/** `graft_theta_intersect_bounds(a, b)` → `array(lb, estimate, ub)` of
  * |A∩B| at 3 standard deviations. Evaluated once per OUTPUT pair (a
  * handful of segment combinations), so CodegenFallback is off any hot
  * path. */
case class ThetaIntersectBounds(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def prettyName: String = "graft_theta_intersect_bounds"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.heapifyCompactSketch(
      Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketches.heapifyCompactSketch(
      Memory.wrap(b.asInstanceOf[Array[Byte]])))
    val r = i.getResult
    new GenericArrayData(Array(r.getLowerBound(3), r.getEstimate,
      r.getUpperBound(3)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersectBounds = copy(newLeft, newRight)
}
