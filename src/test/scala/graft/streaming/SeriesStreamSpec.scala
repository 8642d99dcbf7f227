package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of the ordered-recurrence family: the
  * mapGroupsWithState fold in [[StreamOps.recurrenceStream]] must
  * produce, for in-order arrival across micro-batches, exactly the
  * values the BATCH gate queries (events_ewma, events_holt_linear)
  * compute over the same events — same dyadic constants, same
  * (ts, event_id) ordering, same 6 dp round — with O(1) state per
  * user and event-time-timeout cleanup instead of collected history.
  */
class SeriesStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private type Ev = (Long, java.sql.Timestamp, Long, Double, String)

  /** The batch gates' exact expression trees (SeriesQueries ewma /
    * holtLinear) over an in-memory event set.
    */
  private def batchFold(events: Seq[Ev]): Map[Long, (Long, Double, Double, Double, Double)] =
    events.toDF("user_id", "ts", "event_id", "value", "event_type")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        expr("sort_array(collect_list(struct(ts, event_id, v)))").as("seq"))
      .select(col("user_id"), col("n"),
        round(expr(
          "aggregate(transform(seq, r -> r.v), CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE))"),
          6).as("ewma"),
        expr(
          "aggregate(transform(seq, r -> r.v), " +
            "named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)), " +
            "(acc, x) -> named_struct(" +
            "'l', x * CAST(0.5 AS DOUBLE) + (acc.l + acc.b) * CAST(0.5 AS DOUBLE), " +
            "'b', (x * CAST(0.5 AS DOUBLE) + (acc.l + acc.b) * CAST(0.5 AS DOUBLE)" +
            " - acc.l) * CAST(0.5 AS DOUBLE) + acc.b * CAST(0.5 AS DOUBLE)))").as("st"))
      .select(col("user_id"), col("n"), col("ewma"),
        round(col("st.l"), 6).as("level"), round(col("st.b"), 6).as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast_1"))
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("streaming recurrence fold equals the batch gate fold, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.recurrenceStream(
      mem.toDF().toDF("user_id", "ts", "event_id", "value", "event_type"),
      tailMax = 64, watermarkDelay = "10 minutes", idleMinutes = 60)
    val q = out.writeStream.format("memory").queryName("recur")
      .outputMode("update").start()

    // batch 2 deliberately carries rows OUT of order within the batch
    // (the per-batch sort must restore (ts, event_id) order)
    val batch1: Seq[Ev] = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, 20.0, "cart"),
      (2L, ts("2024-01-01 10:02:00"), 3L, 5.0, "signup"))
    val batch2: Seq[Ev] = Seq(
      (2L, ts("2024-01-01 10:05:00"), 6L, 2.5, "error"),
      (1L, ts("2024-01-01 10:03:00"), 4L, 30.0, "purchase"),
      (2L, ts("2024-01-01 10:04:00"), 5L, 7.5, "view"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("recur").as[RecurrenceRow].collect()
      .filter(!_.closed).groupBy(_.userId)
      .map { case (u, rs) => u -> rs.maxBy(_.nEvents) }

    val expected = batchFold(batch1 ++ batch2)
    Seq(1L, 2L).foreach { u =>
      val (n, ewma, level, trend, fc) = expected(u)
      val r = got(u)
      assert(r.nEvents === n, s"user $u count")
      assert(r.ewma === ewma, s"user $u ewma")
      assert(r.level === level, s"user $u level")
      assert(r.trend === trend, s"user $u trend")
      assert(r.forecast1 === fc, s"user $u forecast")
    }
    // the pattern-match symbol tail: first char per event in order
    assert(got(1L).tail === "vcp")
    assert(got(2L).tail === "sve")
  }

  test("symbol tail is bounded by tailMax — O(1) state, not history") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.recurrenceStream(
      mem.toDF().toDF("user_id", "ts", "event_id", "value", "event_type"),
      tailMax = 4, watermarkDelay = "10 minutes", idleMinutes = 60)
    val q = out.writeStream.format("memory").queryName("recur_tail")
      .outputMode("update").start()
    val evs: Seq[Ev] = "abcdefgh".zipWithIndex.map { case (c, i) =>
      (1L, ts(f"2024-01-01 10:0$i%01d:00"), i.toLong, 1.0, c.toString)
    }
    mem.addData(evs: _*)
    q.processAllAvailable()
    q.stop()
    val r = spark.table("recur_tail").as[RecurrenceRow].collect().maxBy(_.nEvents)
    assert(r.tail === "efgh", "tail must keep only the last tailMax symbols")
    assert(r.nEvents === 8L)
  }

  test("idle users flush one closed row by event-time timeout; state drops") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.recurrenceStream(
      mem.toDF().toDF("user_id", "ts", "event_id", "value", "event_type"),
      tailMax = 64, watermarkDelay = "10 minutes", idleMinutes = 60)
    val q = out.writeStream.format("memory").queryName("recur_close")
      .outputMode("update").start()

    mem.addData((1L, ts("2024-01-01 10:00:00"), 1L, 8.0, "view"))
    q.processAllAvailable()
    // watermark pushers: 13:00 → watermark 12:50, past 10:00 + 60 min
    mem.addData((9L, ts("2024-01-01 13:00:00"), 2L, 1.0, "view"))
    q.processAllAvailable()
    mem.addData((9L, ts("2024-01-01 13:30:00"), 3L, 1.0, "view"))
    q.processAllAvailable()

    val closed = spark.table("recur_close").as[RecurrenceRow].collect()
      .filter(r => r.userId == 1L && r.closed)
    assert(closed.length === 1, "exactly one final flush for the idle user")
    assert(closed.head.nEvents === 1L)
    assert(closed.head.ewma === 2.0) // 0·¾ + 8·¼

    // state was removed: a returning event restarts the fold from zero
    mem.addData((1L, ts("2024-01-01 13:40:00"), 4L, 4.0, "cart"))
    q.processAllAvailable()
    q.stop()
    val reborn = spark.table("recur_close").as[RecurrenceRow].collect()
      .filter(r => r.userId == 1L && !r.closed && r.tail == "c")
    assert(reborn.length === 1)
    assert(reborn.head.nEvents === 1L, "returning user must restart, not resume")
    assert(reborn.head.ewma === 1.0) // 0·¾ + 4·¼ — not folded onto the old state
  }
}
