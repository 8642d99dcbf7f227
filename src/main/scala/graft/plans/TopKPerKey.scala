package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, CreateStruct, Expression, InterpretedOrdering, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructType}
import scala.collection.mutable

/** Whole-operator extension: top-k rows per key WITHOUT a per-key
  * sort of all rows.
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord))` then `filter(rank <= k)` — shuffles AND fully
  * sorts every group, touching O(n log n) rows of state per
  * partition. This operator keeps a bounded heap of k candidates per
  * key instead: O(n log k) with O(distinct-keys · k) memory, which at
  * 100 TB is the difference between spilling sorts and a small
  * in-memory structure. This is the (c)-tier extension path from the
  * design notes: a custom logical node, planner strategy, and
  * physical operator — registered through the session's experimental
  * strategies (and injectable via SparkSessionExtensions).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    ordering: Seq[Expression], // descending, lexicographic
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced here, not consumed from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, rankAttr, child) =>
      // partial/final split, like partial aggregation: the map-side
      // operator prunes to <= k candidates per (partition, key), so
      // the exchange the final operator requires only ever shuffles
      // the per-mapper winners — not every row
      val partial = TopKPartialExec(keys, ordering, k, planLater(child))
      TopKPerKeyExec(keys, ordering, k, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

/** Map-side pruning: keep the top k candidates per key within each
  * input partition. A superset of the global per-key top k always
  * survives, so the final operator's result is unchanged while the
  * shuffle shrinks from O(rows) to O(mappers · keys · k).
  */
case class TopKPartialExec(
    keys: Seq[Expression],
    ordering: Seq[Expression],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      TopKPerKey.heapsPerKey(iter, keys, ordering, k, childOutput)
        .flatMap { case (_, heap) =>
          val drained: Seq[(InternalRow, UnsafeRow)] = heap.dequeueAll
          drained.iterator.map(p => p._2: InternalRow)
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[Expression],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  /** The planner inserts the hash exchange for us — same-key rows
    * land in one partition; no sort is requested.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val joiner = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val outProj = UnsafeProjection.create(output, childOutput :+ rankAttr)
      TopKPerKey.heapsPerKey(iter, keys, ordering, k, childOutput)
        .flatMap { case (_, heap) =>
          val sorted = heap.dequeueAll.toIndexedSeq // worst-first
          sorted.reverseIterator.zipWithIndex.map { case ((_, row), i) =>
            rankRow.update(0, i + 1)
            outProj(joiner(row, rankRow))
          }
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Shared per-partition heap pass used by both the partial and final
  * operators: min-heap of k candidates per key, descending
  * lexicographic struct ordering.
  */
object TopKPerKey {
  def heapsPerKey(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      ordering: Seq[Expression],
      k: Int,
      childOutput: Seq[Attribute]): Iterator[(UnsafeRow, mutable.PriorityQueue[(InternalRow, UnsafeRow)])] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    // normalize child rows to UnsafeRow — a child plan bottoming out
    // in an RDD scan emits GenericInternalRows, which a bare cast
    // would crash on
    val rowProj = UnsafeProjection.create(childOutput, childOutput)
    val ordExpr = BindReferences.bindReference(CreateStruct.create(ordering), childOutput)
    val ordType = ordExpr.dataType.asInstanceOf[StructType]
    // descending lexicographic: invert the natural struct ordering
    val natural = InterpretedOrdering.forSchema(ordType.map(_.dataType))
    implicit val heapOrd: Ordering[(InternalRow, UnsafeRow)] =
      Ordering.by[(InternalRow, UnsafeRow), InternalRow](_._1)(natural.reverse)
    // min-heap of size k per key (head = currently-worst kept row)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(InternalRow, UnsafeRow)]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      val ord = ordExpr.eval(row).asInstanceOf[InternalRow]
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[(InternalRow, UnsafeRow)]
          heaps.put(key.copy(), h)
          h
      }
      if (heap.size < k) {
        heap.enqueue((ord.copy(), rowProj(row).copy()))
      } else if (natural.compare(ord, heap.head._1) > 0) {
        heap.dequeue()
        heap.enqueue((ord.copy(), rowProj(row).copy()))
      }
    }
    heaps.iterator
  }
}

/** Public API for the operator. */
object TopK {
  private def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  /** Top `k` rows per `keyCols` group, ranked by `ordering`
    * (descending, lexicographic across the given columns — include a
    * unique tie-break column for deterministic results). Adds an
    * integer `rankCol` (1 = best).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column],
             k: Int, rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val node = TopKPerKeyNode(
      keyCols.map(n => GraftSqlBridge.expression(col(n))),
      ordering.map(GraftSqlBridge.expression),
      k,
      AttributeReference(rankCol, IntegerType, nullable = false)(),
      GraftSqlBridge.logicalPlan(df))
    GraftSqlBridge.ofRows(spark, node)
  }
}
