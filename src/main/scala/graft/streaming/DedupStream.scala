package graft.streaming

import graft.cdc.MergeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming incremental exact-dedup ingest — the streaming twin of
  * the `dedup_incremental` gate, wired into the lake layer: a
  * checkpointed `foreachBatch` pipeline whose fingerprint index AND
  * accepted corpus are both MergeTables, so the dedup decision
  * survives restarts and downstream consumers tail the accepted
  * table's CHANGE FEED instead of re-scanning the corpus.
  *
  * Per micro-batch: collapse the batch to one row per text md5
  * (lowest id wins — the in-batch first occurrence), anti-join
  * fingerprints already in the index, append the surviving docs to
  * `accepted` and their fingerprints to the index. Text never
  * shuffles — the batch groups on its md5 and only (fp, id) pairs
  * move; against a 10⁹-row index, [[graft.ops.Dedup.bloomPrefilter]]
  * composes in front of the anti-join to keep the definitely-new
  * majority off the index join entirely.
  *
  * Exactly-once: both writes run under the idempotent-writer txn
  * marker ([[MergeTable.txn]], Delta's txnAppId/txnVersion), keyed by
  * the streaming batchId. Replay after a crash between the two
  * commits is safe BECAUSE the accepted write lands first and the
  * kept set is a deterministic function of (batch, index) — the index
  * only advances in this batch's own second txn, so a replay
  * recomputes the identical kept set, skips the committed accepted
  * write, and completes the index write.
  */
class DedupStream(
    spark: SparkSession,
    root: String,
    idCol: String = "doc_id",
    textCol: String = "text",
    appId: String = "dedup-stream") {

  val indexRoot = s"$root/fp_index"
  val acceptedRoot = s"$root/accepted"

  // one writer instance per table per stream — the mutator contract
  private val indexTable = new MergeTable(spark, indexRoot, Seq("fp"))
  private val acceptedTable = new MergeTable(spark, acceptedRoot, Seq(idCol))

  /** Apply one micro-batch; idempotent per (appId, batchId). */
  def processBatch(batch0: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    // the batch is consumed three times (emptiness probe, fingerprint
    // collapse, accepted semi-join) — cache it or a file/Kafka source
    // re-reads its input per consumer
    val batch = batch0.cache()
    try {
      if (batch.isEmpty) return
      val indexFps =
        if (indexTable.exists) indexTable.read().select("fp")
        else Seq.empty[String].toDF("fp")
      // kept feeds both writes — cache it or the anti-join runs twice
      val kept = graft.ops.Dedup
        .incrementalKeepFps(batch, indexFps, idCol, textCol).cache()
      try {
        val accepted = batch.join(
          kept.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")
        acceptedTable.txn(appId, batchId) { acceptedTable.append(accepted) }
        indexTable.txn(appId, batchId) {
          indexTable.append(kept.select(col("fp"), col("keep_id")))
        }
      } finally kept.unpersist()
    } finally batch.unpersist()
  }

  /** Wire a streaming doc source through the batch loop. */
  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .start()
}
