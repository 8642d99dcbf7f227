package graft.streaming

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming stats maintenance: every ingested batch folds into the
  * persisted ANALYZE stats (rows exact, NDV by sketch union,
  * histograms from the merged KLL registers), and a replayed batch
  * folds nothing (txn marker + commit-driven fold).
  */
class StatsMaintainSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch folds keep stats fresh; a replayed batch folds nothing") {
    val root = "target/test_tables/stats_maintain"
    MergeTable.drop(root)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val sm = new StatsMaintainStream(spark, root, Seq("id"))
    val q = sm.start(mem.toDF().toDF("id", "k"), s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    def stats() = MergeTable.open(spark, root).tableStats().get
    // batch 1: 200 rows, k uniform over 20 values
    mem.addData((0 until 200).map(i => (i.toLong, (i % 20).toLong)): _*)
    q.processAllAvailable()
    assert(stats().rows === 200L)
    assert(stats().cols("k").ndv === 20L)
    // batch 2: 100 MORE rows with 10 NEW k values — stats move with it
    mem.addData((1000 until 1100).map(i => (i.toLong, (i % 30).toLong)): _*)
    q.processAllAvailable()
    q.stop()
    val s2 = stats()
    assert(s2.rows === 300L, "rows must fold per batch")
    assert(s2.cols("k").ndv === 30L, "NDV must absorb the new values")
    assert(s2.cols("k").max.contains(29.0), "bounds must widen")
    assert(s2.cols("k").hllB64.isDefined && s2.cols("k").kllB64.isDefined)
    // a REPLAY of the last batch (restarted writer, same ids) is a
    // double no-op: txn skip + nothing new committed to fold
    val sm2 = new StatsMaintainStream(spark, root, Seq("id"))
    sm2.processBatch(
      (1000 until 1100).map(i => (i.toLong, (i % 30).toLong)).toDF("id", "k"), 1L)
    val s3 = stats()
    assert(s3.rows === 300L && s3.cols("k").ndv === 30L,
      "a replayed batch must not double-fold")
  }
}
