package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `graft_bounded_collect(expr, cap)` — collect_list with a HARD
  * per-group element cap that refuses LOUDLY instead of letting one
  * pathological hot key OOM its task.
  *
  * The ordered-recurrence family (EWMA, Holt, trimmed mean, pattern
  * match) necessarily folds each user's own history, so its per-group
  * state is the user's event list — fine for real users, fatal for a
  * runaway key (a bot with 10⁸ events) that plain collect_list would
  * buffer in full before anything notices. This aggregate enforces
  * the cap WHERE the memory is consumed: `update` throws the moment a
  * partial (map-side) buffer passes `cap`, and `merge` throws before
  * materializing an over-cap combined buffer — the same refuse-loudly
  * contract as [[graft.cdc.MergeTable]]'s `broadcastKeyLimit`. Under
  * the cap the result is exactly `collect_list` (insertion order,
  * nulls skipped), so oracle-gated queries swap it in unchanged.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(cap > 0, "graft_bounded_collect cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_bounded_collect"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectList =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  private def failCap(): Nothing = throw new IllegalStateException(
    s"$prettyName: a single group exceeds cap=$cap elements; a hot key this " +
      "size would blow task memory — pre-filter, pre-aggregate, or raise the cap")

  override def update(buf: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.size >= cap) failCap()
      buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[Any],
      b2: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    if (b1.size + b2.size > cap) failCap()
    b1 ++= b2
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val bufferProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    bufferProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    mutable.ArrayBuffer.from(row.getArray(0).toObjectArray(child.dataType))
  }
}
