package graft.cdc

import graft.SparkSpec

class MergeTableModesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/modes_$name"
    MergeTable.drop(root)
    root
  }

  test("merge-on-read: upserts and deletes land as deltas, reads reconcile") {
    val root = fresh("mor")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"))
    t.delete(Seq(3L).toDF("id"))
    // base + 2 deltas on disk, reconciliation hides all of it
    val lastManifest = latestManifestLines(root)
    assert(lastManifest.count(_.startsWith("delta:")) === 2)
    assert(t.read().as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("merge-on-read: later delta wins for the same key") {
    val root = fresh("mor_order")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "v0")).toDF("id", "v")), mode = MergeTable.MergeOnRead)
    t.upsert(Seq((1L, "v1")).toDF("id", "v"))
    t.upsert(Seq((1L, "v2")).toDF("id", "v"))
    assert(t.read().as[(Long, String)].collect() === Seq((1L, "v2")))
  }

  test("merge-on-read: auto-compaction folds deltas into a base") {
    val root = fresh("mor_compact")
    val t = new MergeTable(spark, root, Seq("id"), MergeTable.MergeOnRead, maxDeltas = 3)
    t.upsert(Seq((1L, "a")).toDF("id", "v")) // seeds the base
    t.upsert(Seq((2L, "b")).toDF("id", "v"))
    t.upsert(Seq((3L, "c")).toDF("id", "v"))
    t.upsert(Seq((1L, "A")).toDF("id", "v")) // 3rd delta -> compaction
    val last = latestManifestLines(root)
    assert(last.forall(_.startsWith("base:")), last)
    assert(t.read().as[(Long, String)].collect().sorted ===
      Seq((1L, "A"), (2L, "b"), (3L, "c")))
  }

  test("bucketed: upsert rewrites only affected buckets") {
    val root = fresh("bucketed")
    val rows = (0L until 64L).map(i => (i, s"v$i"))
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(rows.toDF("id", "v")), numBuckets = Some(8))
    val before = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_LATEST")))
    val beforeEntries = manifestLinesOf(root, before).sorted

    t.upsert(Seq((5L, "V5")).toDF("id", "v"))

    val after = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_LATEST")))
    val afterEntries = manifestLinesOf(root, after).sorted
    // exactly one bucket entry changed
    assert(beforeEntries.size === afterEntries.size)
    assert(beforeEntries.intersect(afterEntries).size === beforeEntries.size - 1)
    // content correct
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got.size === 64 && got(5L) === "V5" && got(6L) === "v6")
  }

  test("bucketed: delete drains keys, emptied buckets leave the manifest") {
    val root = fresh("bucketed_del")
    val rows = (0L until 32L).map(i => (i, s"v$i"))
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(rows.toDF("id", "v")), numBuckets = Some(4))
    t.delete((0L until 32L).toDF("id")) // delete everything
    val after = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_LATEST")))
    val afterEntries = manifestLinesOf(root, after)
    assert(afterEntries.isEmpty, afterEntries)
  }

  test("bucketed MOR: deltas reconcile, compaction touches only dirty buckets") {
    val root = fresh("mor_bucketed")
    val rows = (0L until 64L).map(i => (i, s"v$i"))
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(rows.toDF("id", "v")),
      mode = MergeTable.MergeOnRead, numBuckets = Some(8))
    t.upsert(Seq((5L, "V5"), (100L, "new")).toDF("id", "v"))
    t.delete(Seq(6L).toDF("id"))
    // pre-compaction read reconciles base buckets + flat deltas
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got.size === 64 && got(5L) === "V5" && got(100L) === "new" && !got.contains(6L))

    val before = latestManifestLines(root)
    assert(before.count(_.startsWith("delta:")) === 2)
    t.compact()
    val after = latestManifestLines(root)
    // deltas folded away; only the buckets hit by keys 5/100/6 moved
    assert(after.forall(_.matches("b\\d+:.*")), after)
    val beforeBuckets = before.filter(_.startsWith("b")).sorted
    val untouchedKept = after.sorted.intersect(beforeBuckets)
    assert(untouchedKept.size >= beforeBuckets.size - 3, (beforeBuckets, after))
    assert(t.read().as[(Long, String)].collect().toMap === got)
  }

  test("bucketed COW: upsert with a new column evolves the schema") {
    val root = fresh("bucketed_evolve")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 16L).map(i => (i, s"v$i")).toDF("id", "v")),
      numBuckets = Some(4))
    t.upsert(Seq((1L, "V1", "extra")).toDF("id", "v", "note"))
    val got = t.read()
    assert(got.columns.sorted === Array("id", "note", "v"))
    val rows = got.select("id", "v", "note").as[(Long, String, Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) === (("V1", Some("extra"))))
    assert(rows(2L) === (("v2", None))) // untouched bucketmate: null backfill
    assert(rows.size === 16)
  }

  test("bucketed MOR: deleting a whole bucket removes it at compaction") {
    val root = fresh("mor_bucket_drain")
    val rows = (0L until 16L).map(i => (i, s"v$i"))
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(rows.toDF("id", "v")),
      mode = MergeTable.MergeOnRead, numBuckets = Some(4))
    // find every key in bucket 0 and tombstone all of them
    val spark2 = spark
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val bucket0 = rows.map(_._1).filter { id =>
      spark2.range(1).select(pmod(xxhash64(lit(id)), lit(4))).head().getLong(0) == 0L
    }
    assert(bucket0.nonEmpty)
    t.delete(bucket0.toDF("id"))
    t.compact()
    val after = latestManifestLines(root)
    assert(!after.exists(_.startsWith("b0:")), after)
    assert(t.read().count() === 16L - bucket0.size)
  }

  test("forConfig honors the reference write.merge.mode") {
    val conf = TableConfig(db = "d", table = "t", primaryKey = Seq("id"),
      writeMergeMode = "merge-on-read")
    val t = MergeTable.forConfig(spark, fresh("forconfig"), conf)
    assert(t.mode === MergeTable.MergeOnRead)
  }
}
