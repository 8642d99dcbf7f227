package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel twin (StreamOps.funnelStream): per-user
  * first-stage timestamps must equal the batch gate's groupBy minima
  * over the same events — min() is order-independent, so equality
  * must hold even for OUT-OF-ORDER arrival across batches (stronger
  * than the recurrence twin's in-order contract) — with O(1) state
  * and event-time-timeout cleanup.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private type Ev = (Long, java.sql.Timestamp, String)

  private def batchMinima(events: Seq[Ev]): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    events.toDF("user_id", "ts", "event_type")
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .collect()
      .map { r =>
        def o(i: Int) = Option(r.getTimestamp(i)).map(_.getTime)
        r.getLong(0) -> ((o(1), o(2), o(3)))
      }.toMap

  test("streaming stage minima equal the batch fold, out-of-order across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.funnelStream(
      mem.toDF().toDF("user_id", "ts", "event_type"),
      watermarkDelay = "1 hour", idleMinutes = 120)
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()

    val b1: Seq[Ev] = Seq(
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 10:02:00"), "view"))
    // batch 2 arrives EARLIER in event time than batch 1 for user 1 —
    // the earlier click must replace the stage minimum
    val b2: Seq[Ev] = Seq(
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"),
      (2L, ts("2024-01-01 10:07:00"), "signup"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    // the LATEST emitted row per user (memory sink appends in batch
    // order; state minima only ever tighten, so last = final answer)
    val rows = spark.table("funnel").filter(!col("closed"))
      .collect().groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.last }
    val want = batchMinima(b1 ++ b2)
    want.foreach { case (u, (s, c, p)) =>
      val r = rows(u)
      def o(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert((o(1), o(2), o(3)) === ((s, c, p)), s"user $u stage minima")
    }
  }

  test("idle users flush one closed row by event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.funnelStream(
      mem.toDF().toDF("user_id", "ts", "event_type"),
      watermarkDelay = "1 minute", idleMinutes = 5)
    val q = out.writeStream.format("memory").queryName("funnel_to")
      .outputMode("update").start()
    mem.addData((7L, ts("2024-01-01 10:00:00"), "signup"))
    q.processAllAvailable()
    // advance the watermark far past user 7's idle horizon
    mem.addData((8L, ts("2024-01-01 12:00:00"), "signup"))
    q.processAllAvailable()
    // one more batch so the timeout fires after the watermark moved
    mem.addData((8L, ts("2024-01-01 12:01:00"), "click"))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("funnel_to").filter(col("closed")).collect()
    assert(closed.map(_.getLong(0)).toSet === Set(7L))
    assert(!closed.head.isNullAt(1), "closed row carries the signup minimum")
  }
}
