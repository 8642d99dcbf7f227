package graft.streaming

import graft.cdc.MergeTable
import graft.ops.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN index maintenance — the serving-side twin of the
  * batch IVF gates, wired into the lake layer: embeddings arrive as a
  * stream, each vector is assigned to its IVF cell against a FIXED
  * trained codebook (the [[Similarity.cellScores]] definition shared
  * with every batch IVF path, so write-side assignment and read-side
  * probing can never disagree), and (cell, vec_id, embedding) rows
  * append to a MergeTable — so the index survives restarts, serves
  * time travel, and downstream consumers tail its change feed.
  *
  * Exactly-once: the append is a single-commit op under
  * [[MergeTable.txnAtomic]] — the (appId, batchId) watermark rides
  * the append's own commit, so a replayed micro-batch is a no-op.
  *
  * 100 TB shape: per trigger the batch is assigned with one
  * broadcast-codebook expression (no shuffle — nCells struct scores
  * per row, argmax inline) and sorted by cell WITHIN partitions before
  * the write, so each appended file carries a tight `cell` min/max
  * range in its footer stats; [[topK]]'s serving scan filters on the
  * probed cells, and stats pruning drops whole files whose cell range
  * cannot match — the probe reads O(probed cells' files), not the
  * index. Compaction/Z-ORDER on `cell` (the standard maintenance ops)
  * keep ranges tight as the index grows. The codebook is
  * driver-resident (nCells × dim floats — KBs); retraining it is a
  * REBUILD, deliberately out of scope for the maintainer (the
  * ModelArtifacts contract versions codebooks).
  */
class AnnIndexStream(
    spark: SparkSession,
    root: String,
    cents: Seq[(Int, Seq[Float])],
    appId: String = "ann-index-stream") {

  val indexRoot = s"$root/ivf_index"
  private val table = new MergeTable(spark, indexRoot, Seq("vec_id"))

  /** Apply one micro-batch of (vec_id, embedding); idempotent per
    * (appId, batchId).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    // range-partition + sort by cell so every appended file carries a
    // CONTIGUOUS cell range in its footer stats — that is what lets
    // the serving probe's isin filter prune whole files. The partition
    // count is PINNED (AQE would coalesce a small trigger into one
    // file spanning every cell, losing prunability): one file per
    // cell up to a cap that bounds small-file pressure per trigger —
    // OPTIMIZE/ZORDER on `cell` is the growing index's maintenance op.
    val parts = math.min(math.max(cents.size, 1), 64)
    val assigned = batch
      .withColumn("cell", Similarity.assignCell(spark, col("embedding"), cents))
      .repartitionByRange(parts, col("cell"))
      .sortWithinPartitions("cell")
    table.txnAtomic(appId, batchId) { table.append(assigned) }
    ()
  }

  /** Wire a streaming embedding source through the batch loop. */
  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .start()

  /** Serve top-k neighbors for `queries` (query_id, qe) from the
    * CURRENT index state: probe the `nProbe` best cells per query,
    * prefilter the index scan to the UNION of probed cells (bounded
    * by the codebook size — the isin literal is what lets footer
    * stats prune cell-sorted files), then exact-rescore inside the
    * probed cells with the bounded-heap per-query top-k. Stored
    * assignments are served as written — bit-identical to what
    * [[Similarity.ivfTopKWith]] recomputes, because both sides use
    * the one [[Similarity.cellScores]] definition.
    */
  def topK(queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val probes = queries.withColumn("probe_cells",
        slice(reverse(array_sort(
          Similarity.cellScores(spark, col("qe"), cents))), 1, nProbe))
      .withColumn("cell", explode(transform(col("probe_cells"), p => p.getField("cell"))))
      .drop("probe_cells")
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by nCells, not data
    val corpus = table.read().filter(col("cell").isin(probedCells: _*))
    val scored = corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }
}
