package graft.streaming

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{count, lit, round, sum}
import org.apache.spark.sql.streaming.Trigger

class MergeTableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/sink_$name"
    MergeTable.drop(root)
    root
  }

  test("upsert sink: micro-batches merge by key, later batch wins") {
    val root = fresh("upsert")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("id", "v", "seq")
      .writeStream.format("mergetable")
      .option("path", root).option("keys", "id").option("ordering", "seq")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      in.addData((1L, "a", 1L), (2L, "b", 1L), (1L, "a2", 2L)) // batch dedup: a2 wins
      q.processAllAvailable()
      in.addData((2L, "B", 3L), (3L, "c", 3L))
      q.processAllAvailable()
      val got = new MergeTable(spark, root, Seq("id")).read()
        .as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "a2", 2L -> "B", 3L -> "c"))
    } finally q.stop()
  }

  test("sink writes a value-partitioned table and preserves the layout") {
    val root = fresh("partitioned")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("id", "grp", "seq")
      .writeStream.format("mergetable")
      .option("path", root).option("keys", "id").option("ordering", "seq")
      .option("partitions", "grp")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      in.addData((1L, "red", 1L), (2L, "blue", 1L))
      q.processAllAvailable()
      // second batch: update moves id=1 across partitions
      in.addData((1L, "blue", 2L), (3L, "red", 2L))
      q.processAllAvailable()
      def manifest(): Seq[String] = latestManifestLines(root)
      assert(manifest().forall(_.startsWith("pv:")), manifest().mkString("|"))
      assert(MergeTable.readMeta(root).get.partitionCols === Seq("grp"))
      val got = MergeTable.open(spark, root).read()
        .as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "blue", 2L -> "blue", 3L -> "red"))
      // a second stream WITHOUT the partitions option still honors
      // the recorded layout instead of degrading it to a flat rewrite
      val in2 = MemoryStream[(Long, String, Long)]
      val q2 = in2.toDF().toDF("id", "grp", "seq")
        .writeStream.format("mergetable")
        .option("path", root).option("keys", "id").option("ordering", "seq")
        .option("checkpointLocation", s"$root/ckpt2")
        .trigger(Trigger.ProcessingTime(50))
        .start()
      try {
        in2.addData((4L, "green", 3L))
        q2.processAllAvailable()
        assert(manifest().forall(_.startsWith("pv:")), manifest().mkString("|"))
        assert(MergeTable.open(spark, root).read().count() === 4)
      } finally q2.stop()
    } finally q.stop()
  }

  test("changes sink: I/U/D events fold through applyChanges") {
    val root = fresh("changes")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, String, Long)]
    val q = in.toDF().toDF("opclass", "id", "v", "ts_ms")
      .writeStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("apply", "changes").option("ordering", "ts_ms")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      in.addData(("I", 1L, "a", 1L), ("I", 2L, "b", 1L), ("I", 3L, "c", 1L))
      q.processAllAvailable()
      in.addData(("U", 2L, "B", 2L), ("D", 3L, "", 2L), ("I", 4L, "d", 2L))
      q.processAllAvailable()
      val got = new MergeTable(spark, root, Seq("id")).read()
        .select("id", "v").as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "a", 2L -> "B", 4L -> "d"))
    } finally q.stop()
  }

  test("delete-then-reinsert of a key within one batch keeps the newer row") {
    val root = fresh("dthenI")
    val sink = new graft.sources.MergeTableSink(root, Seq("id"),
      MergeTable.CopyOnWrite, None, "changes", Seq("ts_ms"))
    sink.addBatch(0, Seq(("I", 1L, "a", 1L), ("I", 2L, "b", 1L)).toDF("opclass", "id", "v", "ts_ms"))
    // key 1: deleted at ts 2, re-created at ts 3 — final state must be the re-insert;
    // key 2: updated at ts 2, deleted at ts 3 — final state must be gone
    sink.addBatch(1, Seq(
      ("D", 1L, "", 2L), ("I", 1L, "a2", 3L),
      ("U", 2L, "B", 2L), ("D", 2L, "", 3L)).toDF("opclass", "id", "v", "ts_ms"))
    val got = new MergeTable(spark, root, Seq("id")).read()
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a2"))
  }

  test("delete-only first batch on a fresh table is a no-op, not a crash") {
    // a new pipeline tailing a compacted topic can see only tombstones
    // first — the rows don't exist, so the deletes must drop silently
    val root = fresh("donly")
    val sink = new graft.sources.MergeTableSink(root, Seq("id"),
      MergeTable.CopyOnWrite, None, "changes", Seq("ts_ms"))
    sink.addBatch(0, Seq(("D", 1L, "", 1L), ("D", 2L, "", 1L)).toDF("opclass", "id", "v", "ts_ms"))
    assert(!new MergeTable(spark, root, Seq("id")).exists)
    // the table still initializes normally afterwards
    sink.addBatch(1, Seq(("I", 1L, "a", 2L)).toDF("opclass", "id", "v", "ts_ms"))
    val got = new MergeTable(spark, root, Seq("id")).read()
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a"))
  }

  test("replaying a batch leaves the table unchanged (checkpoint recovery)") {
    val root = fresh("replay")
    val sink = new graft.sources.MergeTableSink(root, Seq("id"),
      MergeTable.CopyOnWrite, None, "changes", Seq("ts_ms"))
    val batch = Seq(("I", 1L, "a", 1L), ("I", 2L, "b", 1L), ("U", 1L, "A", 2L))
      .toDF("opclass", "id", "v", "ts_ms")
    sink.addBatch(0, batch)
    val first = new MergeTable(spark, root, Seq("id")).read()
      .select("id", "v").as[(Long, String)].collect().toMap
    sink.addBatch(0, batch) // engine replays batch 0 after a crash
    val second = new MergeTable(spark, root, Seq("id")).read()
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(first === Map(1L -> "A", 2L -> "b"))
    assert(second === first) // no duplicated inserts
  }

  test("update-mode aggregation stream maintains a serving table") {
    val root = fresh("serving")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
    // update mode emits each changed key's NEW aggregate per batch;
    // keyed upserts turn that into an always-current serving table
    val q = agg.writeStream.format("mergetable")
      .outputMode("update")
      .option("path", root).option("keys", "k")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      in.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      in.addData((1L, 3.0), (3L, 7.0))
      q.processAllAvailable()
      val got = new MergeTable(spark, root, Seq("k")).read()
        .as[(Long, Long, Double)].collect().toSet
      assert(got === Set((1L, 3L, 6.0), (2L, 1L, 5.0), (3L, 1L, 7.0)))
    } finally q.stop()
  }

  test("sink round-trips into the change-feed source") {
    val root = fresh("roundtrip")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val sink = in.toDF().toDF("id", "v")
      .writeStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      sink.processAllAvailable()
      // tail the same table's outbound feed from its first version
      val feed = spark.readStream.format("mergetable")
        .option("path", root).option("keys", "id")
        .option("startingVersion", "0").load()
      val tail = feed.writeStream.format("memory").queryName("sink_rt")
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        in.addData((1L, "A"), (3L, "c"))
        sink.processAllAvailable()
        tail.processAllAvailable()
        val got = spark.table("sink_rt").select("id", "v", "_change")
          .as[(Long, String, String)].collect().toSet
        assert(got === Set((1L, "a", "I"), (2L, "b", "I"), (1L, "A", "U"), (3L, "c", "I")))
      } finally tail.stop()
    } finally sink.stop()
  }
}
