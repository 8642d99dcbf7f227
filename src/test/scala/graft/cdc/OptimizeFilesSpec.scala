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
