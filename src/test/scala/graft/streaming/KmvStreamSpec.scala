package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KMV twin (StreamOps.kmvUniquesStream): the per-bucket
  * distinct estimate after any batch split must equal the batch
  * `Sketches.kmvDistinct` over the same events — the k-min fold is
  * order-free — with state bounded at k hashes per bucket and
  * event-time-timeout cleanup.
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private type Ev = (Long, java.sql.Timestamp)

  // two hour buckets: hour A gets 300 distinct users (> k=64, the
  // estimator regime), hour B gets 20 (< k, the exact regime); user
  // ids overlap across batches so distinctness does real work
  private def batch(lo: Long, hi: Long, hour: String): Seq[Ev] =
    (lo to hi).map(u => (u, ts(hour)))

  private val b1 = batch(1, 200, "2024-01-01 10:10:00") ++
    batch(1, 12, "2024-01-01 11:20:00")
  private val b2 = batch(101, 300, "2024-01-01 10:40:00") ++
    batch(5, 20, "2024-01-01 11:50:00")

  private def batchEstimates(events: Seq[Ev]): Map[Long, Double] = {
    val df = events.toDF("user_id", "ts")
      .select(date_trunc("hour", col("ts")).as("bucket"),
        col("user_id").cast("string").as("uid"))
    Sketches.kmvDistinct(df, "bucket", "uid")
      .select(col("bucket").cast("long"), col("kmv_estimate"))
      .as[(Long, Double)].collect().toMap
      // timestamp→long cast yields SECONDS; state keys are epoch ms
      .map { case (s, e) => (s * 1000L) -> e }
  }

  test("streaming per-bucket estimates equal the batch sketch, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.kmvUniquesStream(
      mem.toDF().toDF("user_id", "ts"), watermarkDelay = "6 hours")
    val q = out.writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val want = batchEstimates(b1 ++ b2)
    // the FINAL estimate per bucket is its maximum: folding more
    // hashes can only lower the kth min (raising the estimate) or
    // grow the sub-k exact count — so no reliance on sink row order
    val got = spark.table("kmv").filter(!col("closed"))
      .collect().groupBy(_.getLong(0))
      .map { case (b, rs) => b -> rs.map(_.getDouble(1)).max }
    assert(got.keySet === want.keySet)
    want.foreach { case (b, e) =>
      assert(got(b) === e, s"bucket $b estimate")
    }
    // regime sanity: hour A is estimating (300 distinct > k), hour B exact
    val es = want.values.toSeq.sorted
    assert(es.head === 20.0, "sub-k bucket reports the exact count")
    assert(es.last != 300.0 && es.last > 150.0 && es.last < 600.0,
      "super-k bucket reports a plausible estimate, not the exact count")
  }
}
