package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** `graft_kll_sketch(expr[, k])` — a mergeable KLL quantile sketch of
  * a double column (Apache DataSketches), returned as its serialized
  * bytes.
  *
  * This is the persistence half incremental ANALYZE's histograms need:
  * `percentile_approx` (Spark's QuantileSummaries) computes exact-ish
  * deterministic bin edges for a FULL pass but cannot be saved and
  * merged with later data, so incremental folds would let histograms
  * decay forever. A KLL sketch merges losslessly (sketch algebra, the
  * same property the NDV registers rely on), so each fold unions the
  * delta's sketch into the persisted one and re-derives equi-height
  * bin edges from the merged sketch — histogram error stays bounded
  * (~1.65% rank error at the default k=200) no matter how many folds
  * pass between full rescans. Nulls are skipped like every Spark
  * aggregate.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, "graft_kll_sketch k out of range")

  // update() casts the child's value straight to Double — demand the
  // type at analysis time so misuse fails in planning, not mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kll_sketch requires a DOUBLE child, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_sketch"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

object KllSketchAgg {
  /** Merge two serialized sketches (driver-side, no Spark job). */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = KllDoublesSketch.heapify(Memory.wrap(a))
    s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    s.toByteArray
  }

  /** Equi-height bin edges (numBins+1 ranks at i/numBins) from a
    * serialized sketch; None when the sketch saw no values.
    */
  def edges(bytes: Array[Byte], numBins: Int): Option[Seq[Double]] = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.isEmpty) None
    else Some((0 to numBins).map(i => s.getQuantile(i.toDouble / numBins)))
  }
}
