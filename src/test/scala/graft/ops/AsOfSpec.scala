package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join: latest at-or-before, exact-ts matches, null when none precedes") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // after r1, before r2
      (2L, 100L, ts("2024-01-01 12:00:00")), // exactly at r2 -> matches r2
      (3L, 100L, ts("2024-01-01 08:00:00")), // before any right row -> null
      (4L, 200L, ts("2024-01-01 10:00:00")), // user with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 09:00:00"), "r1"),
      (100L, ts("2024-01-01 12:00:00"), "r2"),
    ).toDF("user_id", "rts", "v")
    val out = AsOf.joinLatestAtOrBefore(left, right,
        Seq("user_id"), "ts", "rts", "v", "matched")
      .select("event_id", "matched").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("r1"), 2L -> Some("r2"), 3L -> None, 4L -> None))
  }
}
