package graft.streaming

import graft.cdc.MergeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming statistics maintenance (r14): an ingest loop that keeps
  * the target table's ANALYZE stats FOLD-FRESH per batch instead of
  * waiting for a nightly full pass — append under the idempotent
  * writer txn marker, then union the commit's sketches into the
  * persisted stats (`MergeTable.analyzeIncremental`: O(batch) rows
  * read, exact row/null counts from footers, HLL-union NDV, KLL-fresh
  * histogram edges). CBO and the skew-salting rule read stats that
  * are never more than one batch stale.
  *
  * Replay safety: a replayed batch skips BOTH halves — `txnAtomic`
  * skips the append, and the fold is commit-driven (no new entries,
  * nothing to fold), so stats cannot double-count a retried batch.
  * The first batch on an unanalyzed table degrades to a full pass
  * (which IS the batch at that point).
  */
class StatsMaintainStream(spark: SparkSession, root: String,
    keys: Seq[String], appId: String = "stats-maintain") {

  private val table = new MergeTable(spark, root, keys)

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val appended = table.txnAtomic(appId, batchId) { table.append(batch) }
    if (appended.isDefined) table.analyzeIncremental()
  }

  /** Wire a streaming source through the batch loop. */
  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .trigger(trigger)
      .start()
}
