package graft.streaming

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming incremental dedup (DedupStream): first occurrence wins
  * within a batch AND across batches (via the MergeTable fingerprint
  * index), the accepted corpus lands exactly once under the
  * idempotent-writer txn marker, and a RESTARTED writer (fresh
  * MergeTable handles reading the manifest watermark) still skips a
  * replayed batch.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def acceptedIds(root: String): Set[Long] =
    new MergeTable(spark, s"$root/accepted", Seq("doc_id"))
      .read().select("doc_id").as[Long].collect().toSet

  test("first occurrences accepted across batches; dups dropped in and across") {
    val root = "target/test_tables/dedup_stream_e2e"
    MergeTable.drop(root)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ds = new DedupStream(spark, root)
    val q = ds.start(mem.toDF().toDF("doc_id", "text"), s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))

    // batch 1: doc 3 duplicates doc 1 INSIDE the batch
    mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    assert(acceptedIds(root) === Set(1L, 2L))

    // batch 2: 4 dups history (beta), 6 dups 5 in-batch, 7 dups history
    mem.addData((4L, "beta"), (5L, "gamma"), (6L, "gamma"), (7L, "alpha"))
    q.processAllAvailable()
    q.stop()
    assert(acceptedIds(root) === Set(1L, 2L, 5L))

    val idx = new MergeTable(spark, s"$root/fp_index", Seq("fp"))
    assert(idx.read().count() === 3L, "one fingerprint per distinct text")
  }

  test("a replayed batch is a no-op, including from a restarted writer") {
    val root = "target/test_tables/dedup_stream_replay"
    MergeTable.drop(root)
    val ds = new DedupStream(spark, root)
    val b0 = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    ds.processBatch(b0, 0L)
    assert(acceptedIds(root) === Set(1L, 2L))

    // same writer replays batch 0 → txn watermark skips both writes
    ds.processBatch(b0, 0L)
    assert(acceptedIds(root) === Set(1L, 2L))
    assert(new MergeTable(spark, s"$root/fp_index", Seq("fp")).read().count() === 2L)

    // a RESTARTED writer (fresh handles, watermark read from the
    // manifest) also skips the replay, then applies the next batch
    val ds2 = new DedupStream(spark, root)
    ds2.processBatch(b0, 0L)
    assert(acceptedIds(root) === Set(1L, 2L))
    ds2.processBatch(Seq((3L, "aa"), (4L, "cc")).toDF("doc_id", "text"), 1L)
    assert(acceptedIds(root) === Set(1L, 2L, 4L), "3 dups history, 4 is new")
  }
}
