package graft.streaming

import graft.SparkSpec
import graft.cdc.{Debezium, MergeTable, TableConfig}
import graft.tables.Tables
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"target/test_tmp/stream_$name"
    MergeTable.drop(p)
    p
  }

  test("cdc pipeline: file stream of debezium envelopes lands in MergeTables") {
    val root = fresh("cdc_e2e")
    val srcDir = s"$root/in"
    Files.createDirectories(Paths.get(srcDir))

    // stage deterministic envelopes from events as one json-lines file
    // (small slice so some users have no 'error' event and survive the
    // delete fold)
    val ev = Tables.events(spark, sfDir).limit(100).cache()
    Debezium.synthesizeFromEvents(ev).coalesce(1)
      .write.mode("overwrite").text(s"$srcDir/batch0")

    val pipeline = new CdcPipeline(
      spark,
      parse = df => Debezium.parse(df, "value"),
      tablesRoot = s"$root/tables",
      configs = Seq(
        TableConfig(db = "graftdb", table = "events_0", primaryKey = Seq("user_id")),
        TableConfig(db = "graftdb", table = "events_1", primaryKey = Seq("user_id")),
        TableConfig(db = "graftdb", table = "events_2", primaryKey = Seq("user_id"))),
      databaseName = "graftdb")

    val source = spark.readStream.schema("value STRING").text(s"$srcDir/*")
    val q = pipeline.start(source, checkpoint = s"$root/ckpt")
    q.awaitTermination(120000)

    // every user routed to exactly one table (user_id % 3); final state
    // per user is the latest non-delete event, absent if latest op class
    // split leaves only deletes for a user whose last event was an error
    val t0 = new MergeTable(spark, s"$root/tables/graftdb/events_0", Seq("user_id"))
    val t1 = new MergeTable(spark, s"$root/tables/graftdb/events_1", Seq("user_id"))
    val t2 = new MergeTable(spark, s"$root/tables/graftdb/events_2", Seq("user_id"))
    assert(t0.exists && t1.exists && t2.exists)
    val landed = t0.read().unionByName(t1.read(), true)
      .unionByName(t2.read(), true)
    // expected survivors: users with >=1 non-error event and 0 error events
    val errUsers = ev.filter($"event_type" === "error")
      .select($"user_id").distinct().as[Long].collect().toSet
    val expected = ev.filter($"event_type" =!= "error")
      .select($"user_id").distinct().as[Long].collect().toSet -- errUsers
    assert(expected.nonEmpty, "test slice produced no survivors; enlarge/shift the slice")
    assert(landed.select($"user_id").as[Long].collect().toSet === expected)
    // routing respected
    assert(t1.read().filter($"user_id" % 3 =!= 1).count() === 0)
    ev.unpersist()
  }

  test("cdc pipeline skips malformed envelopes without failing the batch") {
    val root = fresh("cdc_garbage")
    val srcDir = s"$root/in"
    Files.createDirectories(Paths.get(srcDir))
    val ev = Tables.events(spark, sfDir).filter($"event_type" === "click").limit(20)
    val good = Debezium.synthesizeFromEvents(ev).as[String].collect()
    val garbage = Seq("not json at all", """{"op":"u"}""", """{"after": 12}""", "")
    import scala.jdk.CollectionConverters._
    Files.write(Paths.get(s"$srcDir/mixed.txt"), (garbage ++ good ++ garbage).asJava)

    val pipeline = new CdcPipeline(
      spark, df => Debezium.parse(df, "value"), s"$root/tables",
      (0 to 2).map(i => TableConfig(db = "graftdb", table = s"events_$i", primaryKey = Seq("user_id"))),
      "graftdb")
    val q = pipeline.start(
      spark.readStream.schema("value STRING").text(s"$srcDir/*"), s"$root/ckpt")
    q.awaitTermination(120000)

    val landed = (0 to 2).map(i => new MergeTable(spark, s"$root/tables/graftdb/events_$i", Seq("user_id")))
      .filter(_.exists).map(_.read()).reduce(_.unionByName(_, true))
    val expectedUsers = ev.select($"user_id").distinct().as[Long].collect().toSet
    assert(landed.select($"user_id").as[Long].collect().toSet === expectedUsers)
  }

  test("streaming windowed aggregation with watermark matches batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir).limit(500)
      .select($"ts".cast("timestamp"), $"event_type", $"value")
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    mem.addData(events.as[(java.sql.Timestamp, String, Double)].collect().toSeq: _*)

    val out = StreamOps.hourlyCounts(mem.toDF().toDF("ts", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly_stream")
      .select($"hour_ts".cast("long"), $"event_type", $"n", $"sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = events
      .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select($"hour_ts".cast("long"), $"event_type", $"n", $"sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed === batch)
  }

  test("stream-stream join matches only within the event-time window") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(3600_000L * 24 + min * 60_000L)
    val impressions = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = StreamOps.joinWithinWindow(
      impressions.toDF().toDF("user_id", "ts", "ad"),
      clicks.toDF().toDF("user_id", "ts", "target"),
      key = "user_id", windowMinutes = 5)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      impressions.addData((1L, ts(0), "adA"), (2L, ts(0), "adB"), (3L, ts(0), "adC"))
      clicks.addData(
        (1L, ts(3), "pageA"),   // within 5 min -> match
        (2L, ts(9), "pageB"),   // too late -> no match
        (4L, ts(2), "pageD"))   // no impression -> no match
      q.processAllAvailable()
      // advance both watermarks far past the horizon so state flushes
      impressions.addData((9L, ts(120), "adZ"))
      clicks.addData((9L, ts(121), "pageZ"))
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select($"user_id", $"l.ad", $"r.target")
        .as[(Long, String, String)].collect().toSet
      assert(got === Set((1L, "adA", "pageA"), (9L, "adZ", "pageZ")))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops re-deliveries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    mem.addData(
      (ts(0), 1L, "a"), (ts(1), 1L, "a-dup"), (ts(2), 2L, "b"),
      (ts(3), 1L, "a-dup2"), (ts(4), 3L, "c"))

    val out = StreamOps.dedupWithinWatermark(
      mem.toDF().toDF("ts", "k", "v"), "ts", Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val vs = spark.table("dedup_stream").select($"v").as[String].collect().toSet
    assert(vs === Set("a", "b", "c"))
  }

  test("kafka source options mirror the reference connector settings") {
    val opts = KafkaCdcSource.options("broker:9092", "t1,t2", "job1", "earliest")
    assert(opts("subscribe") === "t1,t2")
    assert(opts("kafka.group.id") === "group-job1")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("maxOffsetsPerTrigger") === "200000")
    // consumer-level settings must carry the "kafka." prefix or
    // Spark's provider silently drops them
    assert(opts("kafka.max.partition.fetch.bytes") === "10485760")
    assert(!opts.keys.exists(k => k == "max.partition.fetch.bytes"
      || k == "kafka.consumer.commit.groupid"))
    val tsOpts = KafkaCdcSource.options("b", "t", "j", "2024-01-01T00:00:00")
    assert(tsOpts.contains("startingTimestamp") && !tsOpts.contains("startingOffsets"))
  }
}
