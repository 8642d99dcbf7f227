package graft.cdc

import graft.SparkSpec

/** Plain OPTIMIZE (small-file bin-packing): drip-fed appends leave
  * many small files; OPTIMIZE rewrites the flat snapshot to the
  * target-size file count, preserves data and the copyInto ledger,
  * and no-ops when already packed.
  */
class OptimizeFilesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/opt_$name"
    MergeTable.drop(root)
    root
  }

  private def fileCount(t: MergeTable): Int =
    t.currentEntries().map { case (_, d) =>
      FileStats.listParquetFiles(
        java.nio.file.Paths.get(t.root, "data", d)).size
    }.sum

  test("bin-packs drip-fed appends into the target count and keeps data") {
    val root = fresh("pack")
    val t = new MergeTable(spark, root, Seq("id"))
    // 6 appends -> 6 base dirs of small files
    (0 until 6).foreach { i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(2))
    }
    val before = t.read().as[(Long, String)].collect().sorted
    assert(fileCount(t) > 4)
    val after = t.optimizeFiles(targetBytes = 1L << 30) // everything fits one file
    assert(after === 1)
    assert(t.read().as[(Long, String)].collect().sorted === before)
    val v = t.versions().last
    // already packed: no commit
    assert(t.optimizeFiles(targetBytes = 1L << 30) === 1)
    assert(t.versions().last === v)
  }

  test("preserves the copyInto ledger and skips pending-delta snapshots") {
    val root = fresh("ledger")
    val src = fresh("ledger_src")
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(s"$src/f1")
    val t = new MergeTable(spark, root, Seq("id"))
    t.copyInto(src)
    t.append(Seq((2L, "b")).toDF("id", "v").repartition(2))
    assert(t.optimizeFiles(targetBytes = 1L << 30) === 1)
    assert(t.copyInto(src) === 0, "OPTIMIZE lost the ledger")
    // MOR pending deltas: OPTIMIZE defers to COMPACT (no-op)
    val root2 = fresh("mor")
    val m = new MergeTable(spark, root2, Seq("id"), mode = MergeTable.MergeOnRead)
    m.upsert(Seq((1L, "a")).toDF("id", "v"))
    m.upsert(Seq((2L, "b")).toDF("id", "v"))
    val vs = m.versions().last
    m.optimizeFiles(targetBytes = 1L << 30)
    assert(m.versions().last === vs)
  }

  test("bucketed: scoped bin-packing rewrites only the selected bucket") {
    val root = fresh("bkt")
    val t = new MergeTable(spark, root, Seq("id"), numBuckets = Some(4))
    // an 8-way-parallel seed fragments each bucket into several files
    t.upsert((0L until 64L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8))
    val before = t.read().as[(Long, String)].collect().sorted
    def filesOf(d: String) = FileStats.listParquetFiles(
      java.nio.file.Paths.get(root, "data", d)).size
    val entriesBefore = t.currentEntries()
    val (tag, dir0) = entriesBefore
      .find { case (tg, d) => tg.matches("b\\d+") && filesOf(d) > 1 }
      .getOrElse(fail("expected at least one fragmented bucket"))
    val id = tag.stripPrefix("b")

    t.optimizeFiles(targetBytes = 1L << 30, leaf => leaf == s"_graft_bucket=$id")

    val after = t.currentEntries().toMap
    assert(filesOf(after(tag)) === 1, "selected bucket must coalesce")
    assert(after(tag) !== dir0)
    // every sibling bucket keeps its directory byte-identical
    entriesBefore.filterNot(_._1 == tag).foreach { case (tg, d) =>
      assert(after(tg) === d, s"untouched bucket $tg was rewritten")
    }
    assert(t.read().as[(Long, String)].collect().sorted === before)
    // unscoped pass packs the rest; already-packed buckets are no-ops
    t.optimizeFiles(targetBytes = 1L << 30)
    assert(t.currentEntries().forall { case (_, d) => filesOf(d) === 1 })
    assert(t.read().as[(Long, String)].collect().sorted === before)
  }

  test("SQL: OPTIMIZE WHERE bucket = i and SHOW PARTITIONS on a bucketed table") {
    MergeTable.drop("target/graft_warehouse/optb")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.optb")
    spark.sql("""CREATE TABLE graft.optb.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','buckets'='4')""")
    // fragmented seed through the API upsert: the DSv2 INSERT path now
    // clusters by bucket (one file per bucket dir), so the
    // fragmentation OPTIMIZE exists to fix is produced below the
    // engine's distribution request
    MergeTable.open(spark, "target/graft_warehouse/optb/t").upsert(
      (0L until 64L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8))

    val parts = spark.sql("SHOW PARTITIONS graft.optb.t")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(parts.map(_._1).toSeq === Seq("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    assert(parts.map(_._3).sum === 64L) // exact rows from footer stats
    val frag = parts.find(_._2 > 1).getOrElse(fail("expected a fragmented bucket"))
    val id = frag._1.stripPrefix("bucket=")

    try {
      spark.conf.set("graft.mergetable.targetFileBytes",
        (512L * 1024 * 1024).toString)
      spark.sql(s"OPTIMIZE graft.optb.t WHERE bucket = $id")
      val mid = spark.sql("SHOW PARTITIONS graft.optb.t")
        .as[(String, Long, Long, Long)].collect()
      assert(mid.find(_._1 === frag._1).get._2 === 1L)
      // sibling buckets keep their file counts
      parts.filterNot(_._1 == frag._1).foreach { p =>
        assert(mid.find(_._1 === p._1).get._2 === p._2, s"${p._1} changed")
      }
      assert(spark.table("graft.optb.t").count() === 64L)

      // non-bucket predicates on a bucketed table error loudly
      val bad = intercept[Exception] {
        spark.sql("OPTIMIZE graft.optb.t WHERE v = 'x'")
      }
      assert(bad.getMessage.contains("bucket = <id>"), bad.getMessage)
    } finally spark.conf.unset("graft.mergetable.targetFileBytes")
    spark.sql("DROP TABLE graft.optb.t")
  }

  test("SQL: OPTIMIZE graft.db.t") {
    fresh("sql")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.opt")
    spark.sql("DROP TABLE IF EXISTS graft.opt.t")
    spark.sql("CREATE TABLE graft.opt.t (id BIGINT, v STRING) TBLPROPERTIES('keys'='id')")
    spark.sql("INSERT INTO graft.opt.t VALUES (1, 'a'), (2, 'b')")
    import org.apache.spark.sql.functions.col
    val n = spark.sql("OPTIMIZE graft.opt.t")
      .select(col("affected")).head().getLong(0)
    assert(n >= 1)
    assert(spark.table("graft.opt.t").count() === 2)
    spark.sql("DROP TABLE graft.opt.t")
  }
}
