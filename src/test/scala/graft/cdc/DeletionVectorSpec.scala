package graft.cdc

import graft.SparkSpec

/** Deletion-vector mode: upsert/delete commit positional `(file,
  * row_index)` masks instead of rewriting data files (Iceberg-v2
  * positional deletes / Delta deletion vectors), reads hide exactly
  * the masked rows via a broadcast anti-join, and compaction folds
  * masks back into a clean base.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/dv_$name"
    MergeTable.drop(root)
    root
  }

  private def lastManifest(root: String): String =
    latestManifestLines(root).mkString("\n")

  private def dataFiles(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$root/data"))
      .map(_.getPath).filter(_.endsWith(".parquet")).toSet
  }

  test("delete commits only a mask: original data files are untouched") {
    val root = fresh("delete_mask")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    val baseEntry = lastManifest(root).trim
    val baseFiles = dataFiles(root)
    t.delete(Seq(2L).toDF("id"))
    // the base entry survives verbatim; the commit added ONLY a dv entry
    val after = lastManifest(root).linesIterator.toSeq
    assert(after.contains(baseEntry))
    assert(after.count(_.startsWith("dv:")) === 1)
    assert(baseFiles.subsetOf(dataFiles(root)), "delete rewrote a data file")
    assert(t.read().as[(Long, String)].collect().sorted === Seq((1L, "a"), (3L, "c")))
  }

  test("upsert appends new rows and masks the matched keys' old positions") {
    val root = fresh("upsert")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    val baseFiles = dataFiles(root)
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"))
    val m = lastManifest(root).linesIterator.toSeq
    assert(m.count(_.startsWith("base:")) === 2, m.mkString("|"))
    assert(m.count(_.startsWith("dv:")) === 1, m.mkString("|"))
    assert(baseFiles.subsetOf(dataFiles(root)), "upsert rewrote a data file")
    assert(t.read().as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("later upsert of the same key masks the earlier appended row") {
    val root = fresh("rewin")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "v0")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    t.upsert(Seq((1L, "v1")).toDF("id", "v"))
    t.upsert(Seq((1L, "v2")).toDF("id", "v"))
    assert(t.read().as[(Long, String)].collect() === Seq((1L, "v2")))
  }

  test("insert-only upsert commits no dv entry; no-match delete commits nothing") {
    val root = fresh("noop")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    t.upsert(Seq((2L, "b")).toDF("id", "v")) // no matched key -> no mask
    assert(!lastManifest(root).linesIterator.exists(_.startsWith("dv:")))
    val versionsBefore = t.versions()
    t.delete(Seq(99L).toDF("id")) // matches nothing -> idempotent no-op
    assert(t.versions() === versionsBefore)
    assert(t.read().as[(Long, String)].collect().sorted === Seq((1L, "a"), (2L, "b")))
  }

  test("matches the COW result over a mixed upsert/delete sequence") {
    val rows = (0L until 200L).map(i => (i, s"v$i", i % 7))
    def drive(mode: String, name: String): Seq[(Long, String, Long)] = {
      val root = fresh(name)
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some(rows.toDF("id", "v", "grp")), mode = mode)
      t.upsert((50L until 120L).map(i => (i, s"V$i", i % 5)).toDF("id", "v", "grp"))
      t.delete((0L until 200L by 3).toDF("id"))
      t.upsert(Seq((3L, "back", 0L)).toDF("id", "v", "grp"))
      t.read().as[(Long, String, Long)].collect().sorted.toSeq
    }
    assert(drive(MergeTable.DeletionVectors, "vs_dv") ===
      drive(MergeTable.CopyOnWrite, "vs_cow"))
  }

  test("auto-compaction folds masks into a clean prunable base") {
    val root = fresh("compact")
    val t = new MergeTable(spark, root, Seq("id"),
      MergeTable.DeletionVectors, maxDeltas = 3)
    t.upsert((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((1L, "A")).toDF("id", "v"))
    t.delete(Seq(2L).toDF("id"))
    t.upsert(Seq((3L, "C")).toDF("id", "v")) // 3rd mask -> compaction
    val last = lastManifest(root)
    assert(last.linesIterator.forall(_.startsWith("base:")), last)
    assert(last.linesIterator.size === 1)
    assert(t.prunableFiles(t.currentEntries()).isDefined)
    assert(t.read().as[(Long, String)].collect().sorted ===
      ((0L, "v0") +: (4L until 10L).map(i => (i, s"v$i"))
        :+ (1L, "A") :+ (3L, "C")).sorted)
  }

  test("time travel and change feed see through dv commits") {
    val root = fresh("travel")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    val v1 = t.versions().last
    t.delete(Seq(2L).toDF("id"))
    val v2 = t.versions().last
    t.upsert(Seq((1L, "A"), (3L, "c")).toDF("id", "v"))
    val v3 = t.versions().last
    assert(t.readVersion(v1).as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "b")))
    assert(t.readVersion(v2).as[(Long, String)].collect() === Seq((1L, "a")))
    val feed = t.changesBetween(v1, v3).as[(Long, String, String)].collect().sorted
    assert(feed === Seq((1L, "A", "U"), (2L, "b", "D"), (3L, "c", "I")))
  }

  test("schema evolution: upsert with a new column null-fills old rows") {
    val root = fresh("evolve")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    t.upsert(Seq((2L, "B", 7L)).toDF("id", "v", "extra"))
    assert(t.read().select("id", "v", "extra").as[(Long, String, Option[Long])]
      .collect().sorted === Seq((1L, "a", None), (2L, "B", Some(7L))))
  }

  // -- deletion vectors × hash bucketing -----------------------------------

  private def bucketOf(id: Long, n: Int): Long = {
    import org.apache.spark.sql.functions.{pmod, xxhash64, lit, col}
    Seq(id).toDF("id").select(pmod(xxhash64(col("id")), lit(n)))
      .head().getLong(0)
  }

  test("bucketed dv upsert: mask + bucket-partitioned append, no rewrite") {
    val root = fresh("bk_upsert")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 40L).map(i => (i, s"v$i")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors, numBuckets = Some(4))
    val seedLines = lastManifest(root).linesIterator.toSet
    assert(seedLines.forall(_.matches("b\\d+:.*")), seedLines)
    val baseFiles = dataFiles(root)
    t.upsert(Seq((7L, "V7"), (41L, "new")).toDF("id", "v"))
    val after = lastManifest(root).linesIterator.toSeq
    // every seed bucket entry survives verbatim; the commit ADDED
    // only a mask and the new rows' bucket dirs
    assert(seedLines.subsetOf(after.toSet), after.mkString("|"))
    assert(after.count(_.startsWith("dv:")) === 1, after.mkString("|"))
    assert(baseFiles.subsetOf(dataFiles(root)), "bucketed dv upsert rewrote a data file")
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(7L) === "V7" && got(41L) === "new" && got(8L) === "v8")
    assert(got.size === 41)
  }

  test("bucketed dv delete commits only a mask") {
    val root = fresh("bk_delete")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 30L).map(i => (i, i * 10)).toDF("id", "n")),
      mode = MergeTable.DeletionVectors, numBuckets = Some(4))
    val seedLines = lastManifest(root).linesIterator.toSet
    val baseFiles = dataFiles(root)
    t.delete(Seq(5L, 6L).toDF("id"))
    val after = lastManifest(root).linesIterator.toSeq
    // manifest = the seed bucket entries verbatim + exactly one mask
    assert(after.toSet === seedLines ++ after.filter(_.startsWith("dv:")))
    assert(after.count(_.startsWith("dv:")) === 1, after.mkString("|"))
    assert(baseFiles.subsetOf(dataFiles(root)), "delete rewrote a data file")
    assert(t.read().count() === 28)
  }

  test("bucketed dv matches COW over a mixed upsert/delete sequence") {
    val rows = (0L until 200L).map(i => (i, s"v$i", i % 7))
    def drive(mode: String, buckets: Option[Int], name: String): Seq[(Long, String, Long)] = {
      val root = fresh(name)
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some(rows.toDF("id", "v", "grp")), mode = mode, numBuckets = buckets)
      t.upsert((50L until 120L).map(i => (i, s"V$i", i % 5)).toDF("id", "v", "grp"))
      t.delete((0L until 200L by 3).toDF("id"))
      t.upsert(Seq((3L, "back", 0L)).toDF("id", "v", "grp"))
      t.read().as[(Long, String, Long)].collect().sorted.toSeq
    }
    assert(drive(MergeTable.DeletionVectors, Some(8), "bk_vs_dv") ===
      drive(MergeTable.CopyOnWrite, None, "bk_vs_cow"))
  }

  test("bucketed dv compaction rewrites only dirty buckets, sheds masks") {
    val root = fresh("bk_compact")
    val n = 8
    val t = new MergeTable(spark, root, Seq("id"),
      MergeTable.DeletionVectors, numBuckets = Some(n), maxDeltas = 100)
    t.upsert((0L until 64L).map(i => (i, s"v$i")).toDF("id", "v"))
    val seedEntries = lastManifest(root).linesIterator.toSet
    // touch exactly two keys -> at most two dirty buckets
    t.upsert(Seq((1L, "A")).toDF("id", "v"))
    t.delete(Seq(2L).toDF("id"))
    val dirtyBuckets = Set(bucketOf(1L, n), bucketOf(2L, n))
    t.compact()
    val after = lastManifest(root).linesIterator.toSeq
    assert(!after.exists(_.startsWith("dv:")), after.mkString("|"))
    // untouched buckets keep their seed directories verbatim
    val untouchedSeed = seedEntries.filter { line =>
      !dirtyBuckets.contains(line.takeWhile(_ != ':').stripPrefix("b").toLong)
    }
    assert(untouchedSeed.subsetOf(after.toSet), after.mkString("|"))
    // dirty buckets were rewritten away from their seed dirs
    assert(after.toSet.intersect(seedEntries -- untouchedSeed).isEmpty)
    // one entry per live bucket, stats-prunable again
    assert(after.forall(_.matches("b\\d+:.*")))
    assert(t.prunableFiles(t.currentEntries()).isDefined)
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(1L) === "A" && !got.contains(2L) && got.size === 63)
  }

  test("bucketed dv auto-compaction triggers on the mask bound") {
    val root = fresh("bk_auto")
    val t = new MergeTable(spark, root, Seq("id"),
      MergeTable.DeletionVectors, numBuckets = Some(4), maxDeltas = 3)
    t.upsert((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((1L, "A")).toDF("id", "v"))
    t.delete(Seq(2L).toDF("id"))
    t.upsert(Seq((3L, "C")).toDF("id", "v")) // 3rd mask -> compaction
    val last = lastManifest(root)
    assert(!last.linesIterator.exists(_.startsWith("dv:")), last)
    assert(t.read().as[(Long, String)].collect().sorted ===
      ((0L, "v0") +: (4L until 10L).map(i => (i, s"v$i"))
        :+ (1L, "A") :+ (3L, "C")).sorted)
  }

  test("SQL MERGE and DELETE against a dv table commit masks, not rewrites") {
    // the DML rule reads mode from _META.json, so a dv-mode table gets
    // dv-mode writes through plain SQL with no extra plumbing
    val root = fresh("sql_dml")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    val baseFiles = dataFiles(root)
    spark.read.format("mergetable").option("path", root).load()
      .createOrReplaceTempView("dv_target")
    Seq((2L, "B"), (4L, "d")).toDF("id", "v")
      .createOrReplaceTempView("dv_source")
    spark.sql(
      """MERGE INTO dv_target t USING dv_source s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("DELETE FROM dv_target WHERE id = 1")
    val m = lastManifest(root).linesIterator.toSeq
    assert(m.count(_.startsWith("dv:")) === 2, m.mkString("|"))
    assert(baseFiles.subsetOf(dataFiles(root)), "SQL DML rewrote a data file")
    assert(t.read().as[(Long, String)].collect().sorted ===
      Seq((2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("streaming sink in dv mode: replayable upserts, masked supersedes") {
    val root = fresh("sink")
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("id", "v", "seq")
      .writeStream.format("mergetable")
      .option("path", root).option("keys", "id").option("ordering", "seq")
      .option("mode", MergeTable.DeletionVectors)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      in.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      val baseFiles = dataFiles(root)
      in.addData((2L, "B", 2L), (3L, "c", 2L))
      q.processAllAvailable()
      assert(lastManifest(root).linesIterator.count(_.startsWith("dv:")) === 1)
      assert(baseFiles.subsetOf(dataFiles(root)), "sink rewrote a data file")
      val got = MergeTable.open(spark, root).read()
        .as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
    } finally q.stop()
  }
}
