package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThanOrEqual, StringStartsWith}

/** File-level min/max stats + z-order clustering: the
  * Iceberg-manifest capabilities that make selective reads open only
  * the files whose range can match.
  */
class ClusterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"target/test_tmp/cs_$name"
    MergeTable.drop(root)
    root
  }

  test("commits record per-file min/max stats from parquet footers") {
    val root = freshRoot("stats")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")))
    val files = t.prunableFiles(t.currentEntries())
    assert(files.isDefined && files.get.nonEmpty)
    // every file carries an id range consistent with its contents
    files.get.foreach { case (f, st) =>
      assert(st.contains("id"), s"$f missing id stats")
      val (mn, mx, tag) = st("id")
      assert(tag === "i" && mn.toLong >= 0L && mx.toLong <= 99L && mn.toLong <= mx.toLong)
    }
    // string column stats recorded too
    assert(files.get.forall(_._2.get("v").forall(_._3 == "s")))
  }

  test("cluster() tightens per-file ranges; equality scan opens one file") {
    val root = freshRoot("cluster1")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(spark.range(10000).select(col("id"),
        (col("id") % 7).as("v"))))
    t.cluster(Seq("id"), targetFiles = 8)
    val files = t.prunableFiles(t.currentEntries()).get
    assert(files.size === 8, s"expected 8 clustered files, got ${files.size}")
    // disjoint id ranges → a point lookup admits exactly one file
    val hit = files.count { case (_, st) => FileStats.mayMatch(st, EqualTo("id", 4242L)) }
    assert(hit === 1, s"point lookup should hit 1 of 8 files, hit $hit")
    // a range predicate admits proportionally few files
    val lo = files.count { case (_, st) => FileStats.mayMatch(st, LessThanOrEqual("id", 999L)) }
    assert(lo <= 2, s"id<=999 over 8 even files should keep <=2, kept $lo")
    // clustering must not change the data
    assert(t.read().count() === 10000L)
    assert(t.read().agg(sum("id")).head().getLong(0) === (0L until 10000L).sum)
  }

  test("LIKE-prefix predicates prune on string ranges") {
    val root = freshRoot("prefix")
    // ids rendered zero-padded so string order = numeric order, then
    // clustered on the string key → disjoint per-file string ranges
    val t = MergeTable.createIfAbsent(spark, root, Seq("k"),
      initial = Some(spark.range(8000).select(
        format_string("k%05d", col("id")).as("k"), col("id").as("v"))))
    // cluster on the numeric twin (z-order wants numerics); k shares
    // its order, so the per-file k string ranges come out disjoint too
    t.cluster(Seq("v"), targetFiles = 8)
    val files = t.prunableFiles(t.currentEntries()).get
    assert(files.size === 8)
    // 'k00…' prefixed keys live in the first ~1000 ids → ≤2 files
    val kept = files.count { case (_, st) =>
      FileStats.mayMatch(st, StringStartsWith("k", "k00")) }
    assert(kept <= 2, s"LIKE 'k00%' should prune to <=2 of 8 files, kept $kept")
    // a prefix ABOVE every value prunes everything...
    assert(files.count { case (_, st) =>
      FileStats.mayMatch(st, StringStartsWith("k", "z")) } === 0)
    // ...and a prefix every value shares keeps everything
    assert(files.count { case (_, st) =>
      FileStats.mayMatch(st, StringStartsWith("k", "k")) } === 8)
    // correctness through the source read path
    val got = spark.read.format("mergetable").option("path", root).load()
      .filter(col("k").startsWith("k00")).count()
    assert(got === 1000L)
  }

  test("z-order on two columns prunes on EITHER column alone") {
    val root = freshRoot("zorder")
    // 100x100 grid: lexicographic (a, b) clustering would leave every
    // file's b-range at [0,99]; z-order keeps both dimensions tight
    val grid = spark.range(10000).select(
      (col("id") / 100).cast("long").as("a"),
      (col("id") % 100).cast("long").as("b"))
    val t = MergeTable.createIfAbsent(spark, root, Seq("a", "b"), initial = Some(grid))
    t.cluster(Seq("a", "b"), targetFiles = 16)
    val files = t.prunableFiles(t.currentEntries()).get
    assert(files.size === 16)
    val onA = files.count { case (_, st) => FileStats.mayMatch(st, LessThanOrEqual("a", 10L)) }
    val onB = files.count { case (_, st) => FileStats.mayMatch(st, LessThanOrEqual("b", 10L)) }
    assert(onA < 16, s"a<=10 pruned nothing ($onA of 16)")
    assert(onB < 16, s"b<=10 pruned nothing ($onB of 16) — z-order property lost")
  }

  test("pruned reads through the source return exactly the right rows") {
    val root = freshRoot("prunedread")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(spark.range(5000).select(col("id"), (col("id") * 2).as("v"))))
    t.cluster(Seq("id"), targetFiles = 8)
    val df = spark.read.format("mergetable").option("path", root).load()
    val got = df.filter(col("id") === 1234L).select("v").as[Long].collect()
    assert(got.toSeq === Seq(2468L))
    // an impossible predicate prunes every file and returns empty
    assert(df.filter(col("id") === -5L).isEmpty)
    // unfiltered read unaffected
    assert(df.count() === 5000L)
  }

  test("partitioned: scoped ZORDER rewrites only selected partitions and prunes") {
    val root = freshRoot("pv_zorder")
    // v is scrambled so the seed layout has no ordering to exploit
    val rows = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "g0" else "g1", (i * 2654435761L) % 100000L))
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(rows.toDF("id", "grp", "v").repartition(8)),
      partitionCols = Seq("grp"))
    val before = t.read().as[(Long, String, Long)].collect().sorted
    val entriesBefore = t.currentEntries()

    t.cluster(Seq("v"), targetFiles = 8, keepLeaf = _ == "_graft_p_grp=g0")

    val entriesAfter = t.currentEntries()
    // g1's partition dir is byte-identical — untouched partitions pinned
    assert(entriesAfter.filter(_._2.contains("_graft_p_grp=g1")) ===
      entriesBefore.filter(_._2.contains("_graft_p_grp=g1")))
    assert(entriesAfter.filter(_._2.contains("_graft_p_grp=g0")) !==
      entriesBefore.filter(_._2.contains("_graft_p_grp=g0")))
    assert(t.read().as[(Long, String, Long)].collect().sorted === before)

    // the clustered partition's files carry tight disjoint v ranges:
    // a point predicate may match at most one of its 8 files
    val files = t.prunableFiles(t.currentEntries()).get
    val g0 = files.filter(_._1.toString.contains("_graft_p_grp=g0"))
    assert(g0.size === 8)
    val hit = g0.count { case (_, st) => FileStats.mayMatch(st, EqualTo("v", 54321L)) }
    assert(hit <= 1, s"z-ordered partition should pin a point lookup, opened $hit/8")
    // while the unclustered partition's scrambled files all stay candidates
    val g1 = files.filter(_._1.toString.contains("_graft_p_grp=g1"))
    assert(g1.count { case (_, st) => FileStats.mayMatch(st, EqualTo("v", 54321L)) }
      === g1.size)
  }

  test("MOR snapshots with pending deltas never take the pruned path") {
    val root = freshRoot("mor_noprune")
    val t = new MergeTable(spark, root, Seq("id"), MergeTable.MergeOnRead)
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.upsert(Seq((2L, "B")).toDF("id", "v")) // delta pending
    assert(t.prunableFiles(t.currentEntries()).isEmpty)
    // compaction folds deltas → prunable again
    t.compact()
    assert(t.prunableFiles(t.currentEntries()).isDefined)
  }

  test("string pruning uses parquet's UTF-8 byte order, not UTF-16") {
    // U+FFFD sorts AFTER U+1F600 in Java's UTF-16 code-unit order but
    // BEFORE it in parquet's unsigned UTF-8 byte order — a Java-order
    // comparison would prune the file containing the matching row
    val root = freshRoot("utf8")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "�"), (2L, "😀")).toDF("id", "v").coalesce(1)))
    val files = t.prunableFiles(t.currentEntries()).get
    assert(files.size === 1 && files.forall(_._2.contains("v")))
    files.foreach { case (f, st) =>
      assert(FileStats.mayMatch(st, EqualTo("v", "�")),
        s"$f pruned away the row it contains (UTF-16 vs UTF-8 order)")
    }
    // sanity: a value outside the range still prunes
    assert(files.forall(st => !FileStats.mayMatch(st._2, EqualTo("v", "A"))))
  }

  test("raw binary columns get no stats (lossy string render would misprune)") {
    val root = freshRoot("binstats")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](3, 4))).toDF("id", "b")))
    val files = t.prunableFiles(t.currentEntries()).get
    assert(files.nonEmpty)
    assert(files.forall(!_._2.contains("b")), "binary column must not carry stats")
    assert(files.forall(_._2.contains("id")))
  }

  test("vacuum removes stats of dropped data directories") {
    val root = freshRoot("vacuum_stats")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.upsert(Seq((1L, "A")).toDF("id", "v")) // old base now unreferenced
    val statsDir = java.nio.file.Paths.get(root, "stats")
    val before = statsDir.toFile.list().length
    assert(t.vacuum() >= 1)
    assert(statsDir.toFile.list().length < before)
    assert(t.read().as[(Long, String)].collect() === Seq((1L, "A")))
  }
}
