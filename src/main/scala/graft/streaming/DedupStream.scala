package graft.streaming

import graft.cdc.MergeTable
import graft.ops.Dedup
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
  * (lowest id wins — the in-batch first occurrence), drop
  * fingerprints already in the index, append survivors to both
  * tables. Text never shuffles — the batch groups on its md5 and
  * only (fp, id) pairs move.
  *
  * The index probe is ADAPTIVE. Below [[bloomFrom]] index rows the
  * batch anti-joins the index directly — at that size the scan is
  * cheaper than any prefilter's fixed per-trigger cost. Above it, a
  * MAINTAINED broadcast bloom ([[Dedup.bloomMark]], a codegen kernel
  * holding the lane array — never a plan literal) classifies each
  * fingerprint first, and only the maybe-duplicate sliver pays the
  * exact anti-join — the definitely-new majority never touches the
  * 10⁹-row index (a bloom miss cannot be in the index: every indexed
  * fingerprint is folded in, at engagement from one index scan and
  * per batch via the shuffle-free [[Dedup.bloomAddFps]]).
  *
  * Exactly-once: both appends are single-commit ops, so each runs
  * under [[MergeTable.txnAtomic]] — the (appId, batchId) watermark
  * rides the append's OWN commit, leaving no window where data
  * committed but the watermark did not. A crash between the two
  * table commits replays safely: the kept set is a deterministic
  * function of (batch, index), the index only advances in this
  * batch's second commit, so the replay recomputes the identical
  * kept set, skips the already-committed accepted write, and
  * completes the index write. (The bloom is in-memory only —
  * re-seeded from the index on restart — so it can lag the index
  * only within a run, and only toward EXTRA bits, which are false
  * positives the exact join refutes, never false negatives.)
  */
class DedupStream(
    spark: SparkSession,
    root: String,
    idCol: String = "doc_id",
    textCol: String = "text",
    appId: String = "dedup-stream",
    bloomLanes: Int = 1 << 17,
    bloomFrom: Long = 8000000L) {

  val indexRoot = s"$root/fp_index"
  val acceptedRoot = s"$root/accepted"

  // one writer instance per table per stream — the mutator contract
  private val indexTable = new MergeTable(spark, indexRoot, Seq("fp"))
  private val acceptedTable = new MergeTable(spark, acceptedRoot, Seq(idCol))

  // superset-of-index bloom: bloomLanes longs of driver state however
  // large the index grows; seeded at engagement from one index scan,
  // advanced with each batch's kept fingerprints BEFORE the appends
  // (extra bits on a failed batch are only false positives)
  private var laneBits: Array[Long] = _
  // -1 = unknown (folded from footer STATS on the first batch — the
  // startup probe is O(manifest), zero data files opened); counted
  // per batch off the cached kept set until the bloom engages, frozen
  // after (engagement is monotone)
  private[streaming] var indexRowsApprox: Long = -1L
  private def bloomEngaged: Boolean = indexRowsApprox >= bloomFrom

  /** (candidate fingerprints, bloom-maybe sliver) of the last batch —
    * the observable that the index join's input really is the sliver.
    * Opt-in ([[trackBloomStats]]): counting costs one full pass over
    * the collapsed batch per trigger, which a production ingest should
    * not pay.
    */
  @volatile var lastBloomStats: (Long, Long) = (0L, 0L)
  @volatile var trackBloomStats: Boolean = false

  /** Apply one micro-batch; idempotent per (appId, batchId). */
  def processBatch(batch0: DataFrame, batchId: Long): Unit = {
    // the batch is consumed twice (fingerprint collapse, accepted
    // semi-join) — cache it or a file/Kafka source re-reads its input
    val batch = batch0.cache()
    try {
      if (batch.isEmpty) return
      if (indexRowsApprox < 0L)
        // the COW append-only index is always stats-complete, so the
        // engagement probe folds from manifests; the count() fallback
        // only fires on a stats-less legacy table
        indexRowsApprox = indexTable.statsRowCount
          .getOrElse(if (indexTable.exists) indexTable.read().count() else 0L)
      if (bloomEngaged && laneBits == null) {
        laneBits = new Array[Long](bloomLanes)
        if (indexTable.exists)
          Dedup.bloomAddFps(laneBits, indexTable.read().select("fp"))
      }
      val collapsed = batch.groupBy(md5(col(textCol)).as("fp"))
        .agg(min(col(idCol)).as("keep_id"))
      // kept feeds both writes (and the bloom fold) — cache it; the
      // bloom path also caches the marked frame (it feeds two filter
      // branches) and drops it with kept
      var flagged: DataFrame = null
      val kept =
        if (!bloomEngaged) {
          val k =
            if (indexTable.exists)
              collapsed.join(indexTable.read().select("fp"), Seq("fp"), "left_anti")
            else collapsed
          k.cache()
        } else {
          flagged = Dedup.bloomMark(collapsed, laneBits).cache()
          if (trackBloomStats) {
            val byMaybe = flagged.groupBy(col("_maybe")).agg(count(lit(1)))
              .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
            lastBloomStats = (byMaybe.values.sum, byMaybe.getOrElse(true, 0L))
          }
          val maybes = flagged.filter(col("_maybe")).drop("_maybe")
          val news = flagged.filter(!col("_maybe")).drop("_maybe")
          val survivors =
            if (indexTable.exists)
              maybes.join(indexTable.read().select("fp"), Seq("fp"), "left_anti")
            else maybes
          news.unionByName(survivors).cache()
        }
      try {
        if (bloomEngaged) Dedup.bloomAddFps(laneBits, kept.select("fp"))
        val accepted = batch.join(
          kept.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")
        acceptedTable.txnAtomic(appId, batchId) { acceptedTable.append(accepted) }
        val indexRan = indexTable.txnAtomic(appId, batchId) {
          indexTable.append(kept.select(col("fp"), col("keep_id")))
        }
        // count off the cache (cheap) only while disengaged — the next
        // batch re-evaluates engagement against the grown index. On a
        // REPLAYED batch txnAtomic skips (returns None): the index did
        // not grow, so the approximation must not either, or replays
        // double-count and engage the bloom before the index earns it
        if (!bloomEngaged && indexRan.isDefined) indexRowsApprox += kept.count()
      } finally {
        kept.unpersist()
        if (flagged != null) flagged.unpersist()
      }
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
