package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Heavy hitters over a string column — the Misra-Gries family
  * (DataSketches frequent-items) as a native mergeable aggregate.
  *
  * The curation question "which tokens / domains / templates dominate
  * this corpus" needs no exact global groupBy: a frequent-items sketch
  * finds every item above a frequency threshold in ONE pass with
  * O(maxMapSize) state per partition and a lossless merge, where the
  * exact answer over 100 TB of tokens shuffles the full token stream.
  * The guarantee is one-sided and checkable: with
  * `ErrorType.NO_FALSE_NEGATIVES` the sketch returns a SUPERSET of the
  * true heavy items (upper bound ≥ threshold), and every item's true
  * count sits in [lb, ub] with ub−lb ≤ `getMaximumError` — q123 gates
  * exactly those two contracts against exact counts.
  *
  * Estimates depend on partition merge ORDER (which rows share a
  * Misra-Gries decrement), so results are gated in-query against the
  * library bounds and the emitted answer is exact — the q103/q121
  * sketch discipline.
  */
object FreqSketchFns {
  /** Power of two; error ≤ 3.5/1024 of the stream length. */
  val MaxMapSize = 1024

  private val serde = new ArrayOfStringsSerDe

  def empty(): ItemsSketch[String] =
    new ItemsSketch[String](MaxMapSize)

  def fromBytes(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  def toBytes(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)

  /** (item, estimate, lowerBound, upperBound) for every item whose
    * UPPER bound reaches `threshold` — a guaranteed superset of the
    * items with true count ≥ threshold. */
  def frequentItems(bytes: Array[Byte],
      threshold: Long): Seq[(String, Long, Long, Long)] =
    fromBytes(bytes)
      .getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .toSeq.map(r =>
        (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))

  def streamLength(bytes: Array[Byte]): Long =
    fromBytes(bytes).getStreamLength

  def maximumError(bytes: Array[Byte]): Long =
    fromBytes(bytes).getMaximumError
}

/** `graft_freq_agg(strCol)` → serialized frequent-items sketch. */
case class FreqItemsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def prettyName: String = "graft_freq_agg"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    FreqSketchFns.empty()

  override def update(buf: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(a: ItemsSketch[String],
      b: ItemsSketch[String]): ItemsSketch[String] = a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any =
    FreqSketchFns.toBytes(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    FreqSketchFns.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketchFns.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): FreqItemsAgg = copy(child = newChild)
}
