package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}

/** Per-file key blooms: a primary-key point lookup opens only the
  * files whose bloom might hold the key — where min/max ranges prune
  * nothing because every file spans most of an unclustered key
  * domain — and pruning can NEVER hide a live row (no false
  * negatives by construction: both sides hash with the same engine
  * expressions).
  */
class FileBloomSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/bloom_$name"
    MergeTable.drop(root)
    root
  }

  private def relation(root: String): graft.sources.MergeTableRelation =
    new graft.sources.MergeTableRelation(spark.sqlContext, root, Seq("id"),
      MergeTable.CopyOnWrite)

  private def withBlooms[A](body: => A): A = {
    spark.conf.set("graft.mergetable.bloomIndex", "true")
    try body finally spark.conf.unset("graft.mergetable.bloomIndex")
  }

  test("point lookup opens a fraction of files; range filters ignore blooms") {
    val root = fresh("point")
    withBlooms {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v")
          // round-robin INTERLEAVES key domains: every file spans ~the
          // full range, so min/max stats keep all and only blooms prune
          .repartition(8)))
      val rel = relation(root)
      val all = rel.candidateFiles(Array.empty).get.size
      assert(all >= 4, s"expected >=4 files, got $all")
      val point = rel.candidateFiles(Array(EqualTo("id", 17L))).get.size
      assert(point < all / 2, s"bloom kept $point of $all files")
      // a non-point filter must not consult blooms
      assert(rel.candidateFiles(Array(GreaterThan("id", 0L))).get.size === all)
      // and the pruned read still finds the row
      val df = spark.read.format("mergetable").option("path", root).load()
      assert(df.filter($"id" === 17L).as[(Long, String)].collect()
        === Array((17L, "v17")))
    }
  }

  test("IN on the single key prunes to the union of candidate files") {
    val root = fresh("in")
    withBlooms {
      MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((1L to 2000L).map(i => (i, i * 2)).toDF("id", "w")
          .repartition(8)))
      val rel = relation(root)
      val all = rel.candidateFiles(Array.empty).get.size
      val in = rel.candidateFiles(Array(In("id", Array(3L, 4L)))).get.size
      assert(in < all, s"IN kept $in of $all")
      val df = spark.read.format("mergetable").option("path", root).load()
      assert(df.filter($"id".isin(3L, 4L)).count() === 2)
    }
  }

  test("no false negatives across the whole key domain") {
    val root = fresh("complete")
    withBlooms {
      MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
          .repartition(4)))
      val df = spark.read.format("mergetable").option("path", root).load()
      // every key must still be served through the pruned path
      assert(df.filter($"id".isInCollection(1L to 500L)).count() === 500)
      val rel = relation(root)
      (1L to 500L by 97L).foreach { k =>
        val hit = spark.read.format("mergetable").option("path", root).load()
          .filter($"id" === k).count()
        assert(hit === 1L, s"key $k lost by bloom pruning")
      }
    }
  }

  test("string keys index; unindexed tables and types skip cleanly") {
    val root = fresh("string")
    withBlooms {
      MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((1 to 1000).map(i => (s"k$i", i)).toDF("id", "n")
          .repartition(6)))
      val rel = relation(root)
      val all = rel.candidateFiles(Array.empty).get.size
      val point = rel.candidateFiles(Array(EqualTo("id", "k77"))).get.size
      assert(point <= all)
      val df = spark.read.format("mergetable").option("path", root).load()
      assert(df.filter($"id" === "k77").count() === 1)
    }
    // written WITHOUT the conf: no bloom dir, point lookups keep all
    val root2 = fresh("noindex")
    MergeTable.createIfAbsent(spark, root2, Seq("id"),
      initial = Some((1L to 100L).map(i => (i, i)).toDF("id", "n")))
    assert(!new java.io.File(s"$root2/blooms").exists(),
      "bloom index written without the conf")
    assert(spark.read.format("mergetable").option("path", root2).load()
      .filter($"id" === 5L).count() === 1)
  }

  test("index is a sharded executor-written dataset; driver sees names only") {
    val root = fresh("dist")
    withBlooms {
      MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((1L to 3000L).map(i => (i, s"v$i")).toDF("id", "v")
          .repartition(8)))
    }
    val entries = Option(new java.io.File(s"$root/blooms").listFiles())
      .getOrElse(Array.empty).toSeq
    assert(entries.nonEmpty)
    // every index entry is a parquet DIRECTORY of shards with a
    // _SUCCESS coverage marker — never a monolithic serialized-blooms
    // blob the driver must load whole (a million-file snapshot would
    // OOM it)
    entries.foreach { e =>
      assert(e.isDirectory, s"${e.getName} is not a sharded dataset")
      assert(new java.io.File(e, "_SUCCESS").exists, s"${e.getName} lacks coverage marker")
      assert(Option(e.listFiles()).get.exists(_.getName.endsWith(".parquet")))
    }
    // the probe surface hands the driver only (dir, file-name) pairs
    // for keys the blooms cannot rule out — bounded by lookup
    // selectivity, independent of snapshot file count
    val t = MergeTable.open(spark, root)
    val dirs = t.bloomCoveredDirs(t.currentEntries())
    assert(dirs.nonEmpty)
    val all = relation(root).candidateFiles(Array.empty).get.size
    val hits = FileBlooms.mightContain(spark, java.nio.file.Paths.get(root), dirs,
      Seq(FileBlooms.hashOf(Seq((17L, org.apache.spark.sql.types.LongType)))))
    assert(hits.nonEmpty, "true key must survive its own bloom")
    assert(hits.size < all, s"probe kept ${hits.size} of $all files")
    hits.foreach { case (d, f) => assert(dirs.contains(d) && f.endsWith(".parquet")) }
  }

  test("vacuum retires bloom files with their data dirs") {
    val root = fresh("vacuum")
    withBlooms {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some(Seq((1L, "a")).toDF("id", "v")))
      t.upsert(Seq((1L, "b")).toDF("id", "v")) // COW rewrite orphans v1's dir
      val before = Option(new java.io.File(s"$root/blooms").list())
        .map(_.length).getOrElse(0)
      assert(before >= 2)
      t.vacuum()
      val after = Option(new java.io.File(s"$root/blooms").list())
        .map(_.length).getOrElse(0)
      assert(after < before)
      assert(t.read().as[(Long, String)].collect() === Array((1L, "b")))
    }
  }
}
