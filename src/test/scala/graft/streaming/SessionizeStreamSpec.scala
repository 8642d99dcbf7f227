package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stateful sessionization: gap closes sessions, timeout flushes open ones") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]

    val out = StreamOps.sessionizeStream(
      mem.toDF().toDF("user_id", "ts"), gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two events 10 min apart (one session), then a later event
    // past the gap that both closes session 1 and opens session 2
    mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // watermark pusher: a far-future event times out user 1's open session
    mem.addData((2L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    mem.addData((2L, ts("2024-01-01 18:00:00")))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions").as[ClosedSession].collect()
      .filter(_.userId == 1L).sortBy(_.startMs)
    assert(sessions.length === 2, sessions.mkString(", "))
    assert(sessions(0).nEvents === 2)
    assert(sessions(0).startMs === ts("2024-01-01 10:00:00").getTime)
    assert(sessions(0).endMs === ts("2024-01-01 10:10:00").getTime)
    assert(sessions(1).nEvents === 1)
    assert(sessions(1).startMs === ts("2024-01-01 12:00:00").getTime)
  }

  test("allowed-late out-of-order events extend the session start or form earlier sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamOps.sessionizeStream(
      mem.toDF().toDF("user_id", "ts"), gapMinutes = 10, watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()

    mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable() // open session [10:00, 10:05]; watermark 09:35
    // both above the watermark, both BEFORE the open session:
    //  09:52 is within the 10-min gap of the session start → extends it
    //  09:37 is beyond the gap of 09:52 → its own earlier session
    mem.addData((1L, ts("2024-01-01 09:52:00")), (1L, ts("2024-01-01 09:37:00")))
    q.processAllAvailable()
    // watermark pusher flushes user 1's open session
    mem.addData((9L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    mem.addData((9L, ts("2024-01-01 20:00:00")))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions_ooo").as[ClosedSession].collect()
      .filter(_.userId == 1L).sortBy(_.startMs)
    assert(sessions.length === 2, sessions.mkString(", "))
    assert(sessions(0).startMs === ts("2024-01-01 09:37:00").getTime)
    assert(sessions(0).nEvents === 1)
    assert(sessions(1).startMs === ts("2024-01-01 09:52:00").getTime,
      "early event within gap of the session start must move the start back")
    assert(sessions(1).endMs === ts("2024-01-01 10:05:00").getTime)
    assert(sessions(1).nEvents === 3)
  }

  test("events far behind the watermark do not resurrect flushed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamOps.sessionizeStream(
      mem.toDF().toDF("user_id", "ts"), gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()

    mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    mem.addData((9L, ts("2024-01-01 18:00:00"))) // watermark jumps ahead; user 1 flushes
    q.processAllAvailable()
    val afterFlush = spark.table("sessions_late").as[ClosedSession].collect()
      .count(_.userId == 1L)
    // late event hours behind the watermark — dropped, no new session
    mem.addData((1L, ts("2024-01-01 10:06:00")))
    q.processAllAvailable()
    mem.addData((9L, ts("2024-01-01 23:00:00")))
    q.processAllAvailable()
    q.stop()
    val user1 = spark.table("sessions_late").as[ClosedSession].collect()
      .filter(_.userId == 1L)
    assert(afterFlush === 1)
    assert(user1.length === 1, s"late event resurrected a session: ${user1.mkString(", ")}")
    assert(user1.head.nEvents === 2)
  }
}
