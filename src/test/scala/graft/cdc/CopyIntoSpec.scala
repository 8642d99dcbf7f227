package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** COPY INTO / Auto Loader-shape incremental file ingest: each source
  * file lands exactly once; the ledger rides the data commit
  * atomically, survives rewrites/compaction/vacuum, and rolls back
  * with RESTORE.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): (String, String) = {
    val root = s"target/test_tmp/ci_$name"
    val src = s"target/test_tmp/ci_src_$name"
    MergeTable.drop(root); MergeTable.drop(src)
    (root, src)
  }

  private def dropFile(src: String, sub: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "v").coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$src/$sub")

  test("ingests new files once; re-copy is a no-op") {
    val (root, src) = fresh("once")
    dropFile(src, "f1", Seq((1L, "a"), (2L, "b")))
    dropFile(src, "f2", Seq((3L, "c")))
    val t = new MergeTable(spark, root, Seq("id"))
    assert(t.copyInto(src) === 2) // two parquet files (one per subdir)
    assert(t.read().count() === 3)
    val v = t.versions().last
    assert(t.copyInto(src) === 0)
    assert(t.versions().last === v, "no-op copy committed")
    // a third file arrives: only its rows land
    dropFile(src, "f3", Seq((4L, "d")))
    assert(t.copyInto(src) === 1)
    assert(t.read().as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("ledger survives COW rewrite, compaction, and vacuum") {
    val (root, src) = fresh("carry")
    dropFile(src, "f1", Seq((1L, "a"), (2L, "b")))
    val t = new MergeTable(spark, root, Seq("id"))
    assert(t.copyInto(src) === 1)
    t.upsert(Seq((2L, "B"), (5L, "e")).toDF("id", "v")) // full COW rewrite
    t.compact()
    t.vacuum()
    assert(t.copyInto(src) === 0, "rewrite lost the ledger")
    assert(t.read().as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "B", 5L -> "e"))
  }

  test("ledger is invisible to reads, the change feed, and the source") {
    val (root, src) = fresh("invisible")
    dropFile(src, "f1", Seq((1L, "a")))
    val t = new MergeTable(spark, root, Seq("id"))
    t.copyInto(src)
    assert(t.read().columns.toSeq === Seq("id", "v"))
    val feed = t.changeFeed(0L, t.versions().last)
    assert(feed.columns.contains("id") && !feed.columns.contains("src_file"))
    assert(feed.count() === 1) // the ingested row, not the ledger row
    val viaSource = spark.read.format("mergetable").load(root)
    assert(viaSource.count() === 1)
  }

  test("RESTORE rolls the ledger back; re-copy re-ingests") {
    val (root, src) = fresh("restore")
    val t = new MergeTable(spark, root, Seq("id"))
    t.upsert(Seq((9L, "seed")).toDF("id", "v"))
    val preIngest = t.versions().last
    dropFile(src, "f1", Seq((1L, "a")))
    assert(t.copyInto(src) === 1)
    t.restore(preIngest)
    assert(t.read().count() === 1) // seed only
    assert(t.copyInto(src) === 1, "restored table must re-ingest")
    assert(t.read().count() === 2)
  }

  test("MOR mode ingests as deltas and reconciles with upserts") {
    val (root, src) = fresh("mor")
    dropFile(src, "f1", Seq((1L, "a"), (2L, "b")))
    val t = new MergeTable(spark, root, Seq("id"), mode = MergeTable.MergeOnRead)
    t.upsert(Seq((0L, "seed")).toDF("id", "v"))
    assert(t.copyInto(src) === 1)
    t.upsert(Seq((1L, "A")).toDF("id", "v"))
    assert(t.read().as[(Long, String)].collect().toMap ===
      Map(0L -> "seed", 1L -> "A", 2L -> "b"))
    assert(t.copyInto(src) === 0)
  }

  test("SQL: COPY INTO graft.db.t FROM '<dir>'") {
    val (_, src) = fresh("sql")
    dropFile(src, "f1", Seq((1L, "a"), (2L, "b")))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ci")
    spark.sql("DROP TABLE IF EXISTS graft.ci.t")
    spark.sql("CREATE TABLE graft.ci.t (id BIGINT, v STRING) TBLPROPERTIES('keys'='id')")
    import org.apache.spark.sql.functions.col
    val n = spark.sql(s"COPY INTO graft.ci.t FROM '$src'")
      .select(col("affected")).head().getLong(0)
    assert(n === 1)
    assert(spark.table("graft.ci.t").count() === 2)
    // idempotent at the SQL surface too
    assert(spark.sql(s"COPY INTO graft.ci.t FROM '$src'")
      .select(col("affected")).head().getLong(0) === 0)
    spark.sql("DROP TABLE graft.ci.t")
  }

  test("two concurrent copyInto of the same source never double-ingest") {
    // a blind rebase over the winner's ledger would re-anchor the
    // loser's stale anti-join and ingest every file twice; the
    // conflict-on-added-ledger rule forces the loser's retry to
    // recompute against the winner's ledger
    val (root, src) = fresh("dup_race")
    dropFile(src, "f1", Seq((1L, "a"), (2L, "b")))
    val t1 = new MergeTable(spark, root, Seq("id"))
    t1.upsert(Seq((0L, "seed")).toDF("id", "v"))
    val t2 = MergeTable.open(spark, root)
    var fired = false
    t2.onBeforeCommit = () => {
      if (!fired) { fired = true; t1.copyInto(src) }
    }
    assert(t2.copyInto(src) === 0, "loser re-ingested the winner's files")
    assert(t2.read().count() === 3, "rows ingested twice")
  }

  test("copyInto racing an upsert composes through the rebase") {
    val (root, src) = fresh("race")
    dropFile(src, "f1", Seq((1L, "a")))
    val t1 = new MergeTable(spark, root, Seq("id"), mode = MergeTable.MergeOnRead)
    t1.upsert(Seq((0L, "seed")).toDF("id", "v"))
    val t2 = MergeTable.open(spark, root)
    var fired = false
    t2.onBeforeCommit = () => {
      if (!fired) { fired = true; t1.upsert(Seq((7L, "x")).toDF("id", "v")) }
    }
    assert(t2.copyInto(src) === 1) // no conflict surfaced: rebased
    assert(t2.read().as[(Long, String)].collect().toMap ===
      Map(0L -> "seed", 1L -> "a", 7L -> "x"))
  }
}
