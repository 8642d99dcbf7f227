package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** SHALLOW CLONE: a metadata-only fork whose first commit references
  * the source's data dirs absolutely. The tables must then diverge
  * independently — writes on either side never show on the other, the
  * clone's vacuum can never reclaim source files, and the copied
  * footer stats keep pruning/metadata-aggregation working.
  */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Long, String)] =
    df.as[(Long, String)].collect().toSeq.sorted

  private def fresh(name: String): String = {
    val root = s"target/graft_tmp/clone_$name"
    MergeTable.drop(root)
    root
  }

  test("clone reads the source snapshot without copying a byte, then diverges") {
    val srcRoot = fresh("src1"); val dstRoot = fresh("dst1")
    val t = MergeTable.createIfAbsent(spark, srcRoot, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    val c = MergeTable.shallowClone(spark, srcRoot, dstRoot)
    assert(rows(c.read()) === Seq((1L, "a"), (2L, "b")))
    // zero data files were copied into the clone
    assert(FileStats.listParquetFiles(
      java.nio.file.Paths.get(dstRoot).resolve("data")).isEmpty)

    // source writes do not leak into the clone...
    t.upsert(Seq((3L, "c")).toDF("id", "v"))
    assert(rows(c.read()) === Seq((1L, "a"), (2L, "b")))
    // ...and clone writes do not leak into the source
    c.upsert(Seq((2L, "B"), (9L, "z")).toDF("id", "v"))
    assert(rows(c.read()) === Seq((1L, "a"), (2L, "B"), (9L, "z")))
    assert(rows(t.read()) === Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // the clone keeps its own history: v1 is the cloned snapshot
    assert(rows(c.readVersion(1)) === Seq((1L, "a"), (2L, "b")))

    // vacuum on the diverged clone lists only its OWN data dir, so the
    // now-unreferenced source dirs are untouchable by construction
    c.vacuum()
    assert(rows(t.read()) === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(t.readVersion(1)) === Seq((1L, "a"), (2L, "b")))
  }

  test("VERSION AS OF clones a historical snapshot") {
    val srcRoot = fresh("src2"); val dstRoot = fresh("dst2")
    val t = MergeTable.createIfAbsent(spark, srcRoot, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v"))) // v1
    t.upsert(Seq((2L, "b")).toDF("id", "v")) // v2
    val c = MergeTable.shallowClone(spark, srcRoot, dstRoot, Some(1L))
    assert(rows(c.read()) === Seq((1L, "a")))
    // cloning over an existing table is refused
    intercept[IllegalArgumentException] {
      MergeTable.shallowClone(spark, srcRoot, dstRoot)
    }
  }

  test("a MOR source with pending deltas clones with reconciliation intact") {
    val srcRoot = fresh("src3"); val dstRoot = fresh("dst3")
    val t = MergeTable.createIfAbsent(spark, srcRoot, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
    t.upsert(Seq((2L, "B")).toDF("id", "v")) // pending delta
    val c = MergeTable.shallowClone(spark, srcRoot, dstRoot)
    assert(rows(c.read()) === Seq((1L, "a"), (2L, "B")))
    // clone-side compaction folds into LOCAL dirs; source still reads
    c.compact()
    assert(rows(c.read()) === Seq((1L, "a"), (2L, "B")))
    assert(rows(t.read()) === Seq((1L, "a"), (2L, "B")))
  }

  test("clone of a clone re-anchors on the grandparent's dirs") {
    val srcRoot = fresh("src4"); val midRoot = fresh("mid4"); val dstRoot = fresh("dst4")
    MergeTable.createIfAbsent(spark, srcRoot, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    MergeTable.shallowClone(spark, srcRoot, midRoot)
    val c2 = MergeTable.shallowClone(spark, midRoot, dstRoot)
    assert(rows(c2.read()) === Seq((1L, "a")))
  }

  test("SQL surface: CREATE TABLE ... SHALLOW CLONE, then DML and pushdown") {
    MergeTable.drop("target/graft_warehouse/clonedb")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.clonedb")
    spark.sql("""CREATE TABLE graft.clonedb.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.clonedb.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("CREATE TABLE graft.clonedb.c SHALLOW CLONE graft.clonedb.t")
    assert(rows(spark.table("graft.clonedb.c")) === Seq((1L, "a"), (2L, "b")))

    // copied stats serve the metadata-only aggregate path on the clone
    val agg = spark.sql("SELECT count(*) AS c, max(id) AS m FROM graft.clonedb.c")
    assert(agg.queryExecution.executedPlan.toString.contains("MergeTableMetadataAggScan"))
    assert(agg.as[(Long, Long)].head() === ((2L, 2L)))

    spark.sql("""MERGE INTO graft.clonedb.c t
                 USING (SELECT 2 AS id, 'B' AS v) s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *""")
    assert(rows(spark.table("graft.clonedb.c")) === Seq((1L, "a"), (2L, "B")))
    assert(rows(spark.table("graft.clonedb.t")) === Seq((1L, "a"), (2L, "b")))

    // historical clone via SQL
    spark.sql(
      "CREATE TABLE graft.clonedb.c1 SHALLOW CLONE graft.clonedb.t VERSION AS OF 1")
    assert(rows(spark.table("graft.clonedb.c1")) === Seq((1L, "a"), (2L, "b")))
  }
}
