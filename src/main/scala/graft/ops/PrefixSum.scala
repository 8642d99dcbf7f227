package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix sum: a running total per group in a stable
  * order, WITHOUT a per-group window.
  *
  * `Window.partitionBy(group).orderBy(order)` serializes each group
  * onto one reducer — on a low-cardinality group key (a corpus with 5
  * sources, a language column with 5 values) that is 5 straggler
  * tasks doing a full per-group sort at any scale. This operator is
  * the scale-safe equivalent:
  *
  *   1. range-repartition by (group, order…) — P ordered partitions,
  *      P sized by `spark.sql.shuffle.partitions`, each holding a
  *      contiguous slice of one-or-more groups;
  *   2. one tiny aggregation of per-(partition, group) subtotals
  *      (P × |groups| rows, collected — bounded by partition count);
  *   3. exclusive prefix offsets per (partition, group) broadcast
  *      back, and a partition-local running sum adds them in.
  *
  * The result is identical to the window formulation (the global
  * (group, order…) sort order fully determines the running total —
  * partition boundaries cancel out) but the only per-row data
  * movement is ONE range shuffle, and no task ever holds more than
  * one partition's rows. Deterministic: range sampling only moves
  * boundaries, never the order.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `valueCol` (long) within
    * each `groupCol` group, ordered by `orderCols` ascending.
    * `orderCols` must be unique per row within a group for the result
    * to be well-defined (true for primary-key-ish columns).
    */
  /** Global (ungrouped) running total of `valueCol` in `orderCols`
    * order — the scale-safe replacement for
    * `Window.orderBy(...)` with NO partitionBy, which Spark itself
    * flags ("No Partition Defined for Window operation! Moving all
    * data to a single partition"). Same mechanics as [[runningTotal]]
    * with a single constant group: one range shuffle, partition-local
    * sums, broadcast per-partition offsets.
    */
  def runningTotalGlobal(df: DataFrame, orderCols: Seq[String],
                         valueCol: String, cumCol: String): DataFrame = {
    val g = "_psg"
    runningTotal(df.withColumn(g, lit(0)), g, orderCols, valueCol, cumCol).drop(g)
  }

  def runningTotal(df: DataFrame, groupCol: String, orderCols: Seq[String],
                   valueCol: String, cumCol: String): DataFrame = {
    val sortCols = (groupCol +: orderCols).map(col)
    val parts = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    // pin the physical partitioning: range boundaries come from
    // sampling, so the subtotal pass and the accumulation pass must
    // observe the SAME partitions (registered → harness unpersists)
    val pinned = graft.Caches.register(parts)
    // pass 1: per-(partition, group) subtotals — P × |groups| rows,
    // bounded by the shuffle partition count, never by data size
    val subtotals = pinned
      .groupBy(spark_partition_id().as("_pid"), col(groupCol).as("_grp"))
      .agg(sum(col(valueCol)).as("_sub"))
      .collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2))
    // exclusive prefix per group over ascending partition id
    val offsets: Map[(Int, Any), Long] = subtotals
      .groupBy(_._1._2)
      .flatMap { case (_, parts) =>
        var acc = 0L
        parts.sortBy(_._1._1).map { case ((pid, g), sub) =>
          val off = acc; acc += sub; (pid, g) -> off
        }
      }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val groupIdx = pinned.schema.fieldIndex(groupCol)
    val valueIdx = pinned.schema.fieldIndex(valueCol)
    val outSchema = StructType(pinned.schema.fields :+ StructField(cumCol, LongType, nullable = false))
    // pass 2: partition-local running sum seeded by the broadcast
    // offset — a narrow map over the pinned partitions, no shuffle
    pinned.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var cur: Any = None
      var acc = 0L
      it.map { r =>
        val g = r.get(groupIdx)
        if (cur != g) { cur = g; acc = bc.value.getOrElse((pid, g), 0L) }
        acc += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
  }
}
