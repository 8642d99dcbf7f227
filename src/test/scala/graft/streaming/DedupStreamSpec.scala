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

  test("a replayed batch does not inflate the engagement approximation") {
    // the r10 ADVICE low: when both txnAtomic calls skip on replay the
    // index did NOT grow, so indexRowsApprox must not grow either —
    // double-counting engages the bloom before the index earns it
    val root = "target/test_tables/dedup_stream_replay_approx"
    MergeTable.drop(root)
    val ds = new DedupStream(spark, root)
    val b0 = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    ds.processBatch(b0, 0L)
    assert(ds.indexRowsApprox === 2L)
    ds.processBatch(b0, 0L) // replay: txn watermark skips both writes
    assert(ds.indexRowsApprox === 2L, "replayed batch double-counted index rows")
  }

  test("the startup engagement probe folds from footer stats, not a table scan") {
    // seed an index, then corrupt the parquet payloads in place: the
    // stats sidecar still answers the row count, so a fresh writer's
    // probe succeeds without opening a single data file
    val root = "target/test_tables/dedup_stream_probe"
    MergeTable.drop(root)
    val ds = new DedupStream(spark, root)
    ds.processBatch(Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text"), 0L)

    val idx = new MergeTable(spark, s"$root/fp_index", Seq("fp"))
    assert(idx.statsRowCount === Some(3L))
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dataFiles = Files.walk(Paths.get(s"$root/fp_index")).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(p => Files.write(p, "garbage".getBytes))
    assert(new MergeTable(spark, s"$root/fp_index", Seq("fp")).statsRowCount
      === Some(3L), "probe opened a data file")
  }

  test("crash between the accepted and index commits replays without duplicates") {
    // the ADVICE r9 window: the accepted append committed but the
    // index write never ran. With txnAtomic the watermark rode the
    // accepted commit itself, so the replay skips it (append is NOT
    // value-idempotent) and completes only the index write.
    val root = "target/test_tables/dedup_stream_crash"
    MergeTable.drop(root)
    val b0 = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val crashed = new MergeTable(spark, s"$root/accepted", Seq("doc_id"))
    crashed.txnAtomic("dedup-stream", 0L) { crashed.append(b0) }

    val ds = new DedupStream(spark, root)
    ds.processBatch(b0, 0L)
    assert(acceptedIds(root) === Set(1L, 2L))
    assert(new MergeTable(spark, s"$root/accepted", Seq("doc_id"))
      .read().count() === 2L, "replay duplicated the accepted rows")
    assert(new MergeTable(spark, s"$root/fp_index", Seq("fp"))
      .read().count() === 2L, "replay did not complete the index write")

    // and the stream carries on: next batch dedups against history
    ds.processBatch(Seq((3L, "aa"), (4L, "cc")).toDF("doc_id", "text"), 1L)
    assert(acceptedIds(root) === Set(1L, 2L, 4L))
  }

  test("null-text docs classify as maybe and survive (never silently dropped)") {
    val root = "target/test_tables/dedup_stream_null"
    MergeTable.drop(root)
    // engage the bloom so the null→maybe classification is what's
    // under test (the plain path's SQL-null anti-join is the gate twin)
    val ds = new DedupStream(spark, root, bloomFrom = 0L)
    ds.processBatch(Seq((1L, "aa"), (2L, null.asInstanceOf[String]), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"), 0L)
    // null fingerprints group together: in-batch first occurrence wins,
    // and the row must not vanish out of both bloom branches
    assert(acceptedIds(root) === Set(1L, 2L))
    // across batches a null fingerprint never matches the index (SQL
    // null semantics — the anti-join keeps it, mirroring the batch
    // twin dedup_incremental): within-batch collapse only
    ds.processBatch(Seq((4L, null.asInstanceOf[String]), (5L, "bb"))
      .toDF("doc_id", "text"), 1L)
    assert(acceptedIds(root) === Set(1L, 2L, 4L, 5L))
  }

  test("only the bloom-maybe sliver pays the index join") {
    val root = "target/test_tables/dedup_stream_bloom"
    MergeTable.drop(root)
    // bloomFrom = 0: engage the bloom immediately so the sliver
    // contract is testable at spec scale (production engages it only
    // once the index outgrows a direct anti-join)
    val ds = new DedupStream(spark, root, bloomFrom = 0L)
    ds.trackBloomStats = true
    ds.processBatch(
      (0L until 50L).map(i => (i, s"seed text $i")).toDF("doc_id", "text"), 0L)

    // batch 1: 200 fresh texts + 3 historical dups — the anti-join
    // input must be (about) the dups, not the whole batch
    val fresh = (100L until 300L).map(i => (i, s"novel text $i"))
    val dups = Seq((900L, "seed text 1"), (901L, "seed text 2"), (902L, "seed text 3"))
    ds.processBatch((fresh ++ dups).toDF("doc_id", "text"), 1L)
    val (cand, maybe) = ds.lastBloomStats
    assert(cand === 203L)
    assert(maybe >= 3L, "a true dup must always be a bloom hit")
    assert(maybe <= 10L,
      s"the index join's input should be the maybe sliver, got $maybe of $cand")
    assert(acceptedIds(root).size === 250)
  }
}
