package graft.streaming

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.streaming.Trigger

class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/feedstream_$name"
    MergeTable.drop(root)
    root
  }

  test("streamed change feed reproduces the batch change feed version by version") {
    val root = fresh("replay")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))) // v1
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v")) // v2: U(2), I(4)
    t.delete(Seq(1L).toDF("id")) // v3: D(1)
    t.upsert(Seq((4L, "D")).toDF("id", "v")) // v4: U(4)

    val stream = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "1")
      .option("maxVersionsPerBatch", "1")
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("feed_replay").outputMode("append")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()

      // with maxVersionsPerBatch=1 each micro-batch is one version's
      // diff — together they must equal the per-version batch feeds
      val streamed = spark.table("feed_replay")
        .as[(Long, String, String, Long)].collect().toSet
      val expected = (2L to 4L).flatMap { v =>
        t.changesBetween(v - 1, v).withColumn("_commit_version", org.apache.spark.sql.functions.lit(v))
          .as[(Long, String, String, Long)].collect()
      }.toSet
      assert(streamed === expected)
      assert(streamed.map(_._4) === Set(2L, 3L, 4L)) // one batch per version

      // commits made while the stream runs are picked up incrementally
      t.upsert(Seq((5L, "e")).toDF("id", "v")) // v5: I(5)
      q.processAllAvailable()
      val afterLive = spark.table("feed_replay")
        .as[(Long, String, String, Long)].collect().toSet
      assert(afterLive -- streamed === Set((5L, "e", "I", 5L)))
    } finally q.stop()
  }

  test("CDF stream into a changes-mode sink replicates the table end to end") {
    // the flagship CDC composition: source table -> outbound change
    // feed -> streaming sink applying I/U/D -> replica table. The
    // replica must equal the source snapshot after arbitrary commits,
    // including ones made while the stream is live.
    val srcRoot = fresh("repl_src")
    val dstRoot = fresh("repl_dst")
    val src = MergeTable.createIfAbsent(spark, srcRoot, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
    src.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"))
    src.delete(Seq(1L).toDF("id"))

    val feed = spark.readStream.format("mergetable")
      .option("path", srcRoot).option("keys", "id")
      .option("startingVersion", "0")
      .load()
    // the feed's _change and _commit_version map onto the sink's
    // normalized-change contract: opclass I/U/D, ordered by commit
    val q = feed.withColumnRenamed("_change", "opclass")
      .writeStream.format("mergetable")
      .option("path", dstRoot).option("keys", "id")
      .option("apply", "changes").option("ordering", "_commit_version")
      .option("checkpointLocation", s"$dstRoot/ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      def snap(root: String): Set[(Long, String)] =
        MergeTable.open(spark, root).read().as[(Long, String)].collect().toSet
      assert(snap(dstRoot) === snap(srcRoot))
      // live commits replicate incrementally — upsert, then a delete
      src.upsert(Seq((3L, "C2"), (5L, "e")).toDF("id", "v"))
      src.delete(Seq(2L).toDF("id"))
      q.processAllAvailable()
      assert(snap(dstRoot) === snap(srcRoot))
      assert(snap(dstRoot) === Set((3L, "C2"), (4L, "d"), (5L, "e")))
    } finally q.stop()
  }

  test("CDF stream replicates a value-partitioned source end to end") {
    // same composition as the MOR replication test, with the source
    // in the partitioned layout: the feed is layout-agnostic, so
    // partition-scoped commits (including cross-partition key moves)
    // must replicate identically
    val srcRoot = fresh("pv_src")
    val dstRoot = fresh("pv_dst")
    val src = MergeTable.createIfAbsent(spark, srcRoot, Seq("id"),
      initial = Some(Seq((1L, "red", 10L), (2L, "blue", 20L))
        .toDF("id", "grp", "v")),
      partitionCols = Seq("grp"))
    val feed = spark.readStream.format("mergetable")
      .option("path", srcRoot).option("keys", "id")
      .option("startingVersion", "0")
      .load()
    val q = feed.withColumnRenamed("_change", "opclass")
      .writeStream.format("mergetable")
      .option("path", dstRoot).option("keys", "id")
      .option("apply", "changes").option("ordering", "_commit_version")
      .option("checkpointLocation", s"$dstRoot/ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      def snap(root: String): Set[(Long, String, Long)] =
        MergeTable.open(spark, root).read().as[(Long, String, Long)].collect().toSet
      q.processAllAvailable()
      assert(snap(dstRoot) === snap(srcRoot))
      src.upsert(Seq((1L, "blue", 11L), (3L, "red", 30L)).toDF("id", "grp", "v")) // move + insert
      src.delete(Seq(2L).toDF("id"))
      q.processAllAvailable()
      assert(snap(dstRoot) === snap(srcRoot))
      assert(snap(dstRoot) === Set((1L, "blue", 11L), (3L, "red", 30L)))
    } finally q.stop()
  }

  test("pre-image feed stream maintains an aggregate that equals recompute") {
    val root = fresh("preimages")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 5L))
        .toDF("id", "grp", "amt"))) // v1
    t.upsert(Seq((2L, "x", 25L), (4L, "y", 7L)).toDF("id", "grp", "amt")) // v2
    t.delete(Seq(1L).toDF("id")) // v3

    val stream = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "1")
      .option("updatePreImages", "true")
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("feed_pre").outputMode("append")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val feed = spark.table("feed_pre")
        .as[(Long, String, Long, String, Long)].collect()
      // updates arrive as retract/assert pairs
      assert(feed.filter(_._4 == "U_pre").toSet === Set((2L, "x", 20L, "U_pre", 3L)))
      assert(feed.filter(_._4 == "U_post").toSet === Set((2L, "x", 25L, "U_post", 3L)))
      // folding the deltas into the v1 aggregate reproduces a full
      // recompute of the final state — the streaming-maintenance use
      val seed = t.readVersion(1).groupBy("grp")
        .agg(org.apache.spark.sql.functions.sum("amt").as("total"))
        .as[(String, Long)].collect().toMap
      val maintained = feed.foldLeft(seed) { case (acc, (_, grp, amt, change, _)) =>
        val sign = if (change == "I" || change == "U_post") 1L else -1L
        acc + (grp -> (acc.getOrElse(grp, 0L) + sign * amt))
      }
      val recomputed = t.read().groupBy("grp")
        .agg(org.apache.spark.sql.functions.sum("amt").as("total"))
        .as[(String, Long)].collect().toMap
      assert(maintained === recomputed)
    } finally q.stop()
  }

  test("restarted stream catches up versions committed while it was down") {
    val root = fresh("catchup")
    val ckpt = s"$root/ckpt"
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v"))) // v1
    val outDir = s"$root/out"
    // file sink: the memory sink cannot recover from a checkpoint
    def startStream() = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id").load()
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50)).start()

    val q1 = startStream()
    try {
      t.upsert(Seq((2L, "b")).toDF("id", "v")) // v2, delivered live
      q1.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 1)
    } finally q1.stop()

    t.upsert(Seq((3L, "c")).toDF("id", "v")) // v3: committed while down
    t.upsert(Seq((2L, "B")).toDF("id", "v")) // v4: committed while down

    val q2 = startStream() // fresh source instance, same checkpoint
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .filter($"_commit_version" > 2)
        .select("id", "v", "_change").as[(Long, String, String)].collect().toSet
      // net changes of the missed range (v2 -> v4)
      assert(got === Set((3L, "c", "I"), (2L, "B", "U")))
    } finally q2.stop()
  }

  test("Trigger.AvailableNow drains all pending versions and stops") {
    // the batch-job shape: process everything committed so far, then
    // terminate — the engine drives the v1 source's offsets to the
    // current high water and ends the query
    val root = fresh("avail_now")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.upsert(Seq((2L, "b")).toDF("id", "v"))
    t.upsert(Seq((1L, "A")).toDF("id", "v"))
    val q = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "0").option("maxVersionsPerBatch", "1")
      .load()
      .writeStream.format("memory").queryName("avail_now")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
      val got = spark.table("avail_now").select("id", "v", "_change")
        .as[(Long, String, String)].collect().toSet
      assert(got === Set((1L, "a", "I"), (2L, "b", "I"), (1L, "A", "U")))
    } finally q.stop()
  }

  test("a torn high-water file degrades gracefully instead of crash-looping") {
    val root = fresh("tornhw")
    val ckpt = s"$root/ckpt"
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v"))) // v1
    val outDir = s"$root/out"
    def startStream() = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id").load()
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50)).start()

    val q1 = startStream()
    try {
      t.upsert(Seq((2L, "b")).toDF("id", "v")) // v2
      q1.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 1)
    } finally q1.stop()

    // simulate a crash mid-write: the high-water file exists but is
    // empty — restart must fall back to startingVersion + the
    // engine's checkpointed offset, not throw NumberFormatException
    val hw = java.nio.file.Paths.get(ckpt, "sources", "0", "graft-high-water")
    assert(java.nio.file.Files.exists(hw), s"expected high-water at $hw")
    java.nio.file.Files.write(hw, Array.empty[Byte])

    t.upsert(Seq((3L, "c")).toDF("id", "v")) // v3, committed while down
    val q2 = startStream()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select("id", "v", "_change").as[(Long, String, String)].collect().toSet
      assert(got.contains((3L, "c", "I")), s"missed catch-up after torn file: $got")
    } finally q2.stop()
  }

  test("an 'unlimited' maxVersionsPerBatch cap does not freeze the stream") {
    val root = fresh("bigcap")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.upsert(Seq((2L, "b")).toDF("id", "v"))
    // Long.MaxValue would previously wrap the exposed+cap addition
    // negative, so getOffset never advanced and no batch was scheduled
    val stream = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "1")
      .option("maxVersionsPerBatch", Long.MaxValue.toString)
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("feed_bigcap").outputMode("append")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_bigcap").count() === 1) // the v2 insert
    } finally q.stop()
  }

  test("default startingVersion tails only post-creation commits") {
    val root = fresh("tail")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.upsert(Seq((2L, "b")).toDF("id", "v")) // history the stream must skip

    val stream = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id").load()
    val q = stream.writeStream.format("memory")
      .queryName("feed_tail").outputMode("append")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_tail").isEmpty) // nothing from history
      t.upsert(Seq((1L, "A2"), (9L, "z")).toDF("id", "v"))
      q.processAllAvailable()
      val got = spark.table("feed_tail").as[(Long, String, String, Long)].collect().toSet
      assert(got.map(r => (r._1, r._2, r._3)) === Set((1L, "A2", "U"), (9L, "z", "I")))
    } finally q.stop()
  }
}
