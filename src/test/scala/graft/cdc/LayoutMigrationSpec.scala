package graft.cdc

import graft.SparkSpec

/** One-shot layout migration (`migrateLayout` / `ALTER TABLE … SET
  * LAYOUT …`): rewrite the current snapshot into a new layout in one
  * commit, record it in _META, keep history readable, and keep the
  * content IDENTICAL (the change feed across the migration commit is
  * empty).
  */
class LayoutMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/layout_$name"
    MergeTable.drop(root)
    root
  }

  test("flat → bucketed: entries re-tag, meta updates, writes scope to buckets") {
    val root = fresh("f2b")
    val t0 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")))
    val preV = t0.versions().last
    val v = t0.migrateLayout(Some(8), Nil)
    assert(v === preV + 1)
    assert(latestManifestLines(root).forall(_.startsWith("b")),
      latestManifestLines(root).mkString("|"))
    val meta = MergeTable.readMeta(root).get
    assert(meta.numBuckets === Some(8) && meta.partitionCols.isEmpty)
    // the migration commit changed NO rows — the feed across it is empty
    val t = MergeTable.open(spark, root)
    assert(t.changesBetween(preV, v).isEmpty)
    // post-migration upsert rewrites ONE bucket, not the table
    val before = latestManifestLines(root).sorted
    t.upsert(Seq((5L, "V5")).toDF("id", "v"))
    val after = latestManifestLines(root).sorted
    assert(before.intersect(after).size === before.size - 1, (before, after))
    assert(t.read().as[(Long, String)].collect().toMap.apply(5L) === "V5")
    // time travel to the pre-migration flat version still reads
    assert(t.readVersion(preV).count() === 64)
  }

  test("re-bucketing 2 → 8 through SQL (the table-grew-10x operation)") {
    graft.cdc.MergeTable.drop("target/graft_warehouse/lay1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.lay1")
    spark.sql("""CREATE TABLE graft.lay1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','buckets'='2')""")
    spark.sql("INSERT INTO graft.lay1.t SELECT id, CAST(id AS STRING) FROM range(100)")
    spark.sql("ALTER TABLE graft.lay1.t SET LAYOUT BUCKETS 8")
    val root = "target/graft_warehouse/lay1/t"
    assert(MergeTable.readMeta(root).get.numBuckets === Some(8))
    val tags = latestManifestLines(root).map(_.split(":")(0)).toSet
    assert(tags.forall(_.matches("b\\d+")) && tags.size === 8, tags)
    assert(spark.table("graft.lay1.t").count() === 100)
    // catalog reads still ride the Batch path on the new layout
    assert(spark.table("graft.lay1.t").queryExecution.executedPlan
      .toString.contains("MergeTableBatchScan"))
  }

  test("flat → partitioned: pruning and SHOW PARTITIONS work after") {
    graft.cdc.MergeTable.drop("target/graft_warehouse/lay2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.lay2")
    spark.sql("""CREATE TABLE graft.lay2.t (id BIGINT, grp STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""INSERT INTO graft.lay2.t VALUES
                 (1,'red',10), (2,'red',20), (3,'blue',30)""")
    spark.sql("ALTER TABLE graft.lay2.t SET LAYOUT PARTITIONED BY (grp)")
    val root = "target/graft_warehouse/lay2/t"
    assert(MergeTable.readMeta(root).get.partitionCols === Seq("grp"))
    assert(latestManifestLines(root).forall(_.startsWith("pv:")))
    val parts = spark.sql("SHOW PARTITIONS graft.lay2.t")
      .select("partition").as[String].collect().toSet
    assert(parts.exists(_.contains("red")) && parts.exists(_.contains("blue")), parts)
    assert(spark.sql("SELECT sum(v) FROM graft.lay2.t WHERE grp = 'red'")
      .as[Long].head() === 30L)
  }

  test("MOR deltas fold into the migrated base (migration is a compaction)") {
    val root = fresh("mor")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
    t.upsert(Seq((1L, "A"), (3L, "c")).toDF("id", "v"))
    t.delete(Seq(2L).toDF("id"))
    t.migrateLayout(Some(4), Nil)
    assert(latestManifestLines(root).forall(_.startsWith("b")))
    assert(MergeTable.open(spark, root).read().as[(Long, String)]
      .collect().sorted === Seq((1L, "A"), (3L, "c")))
  }

  test("refusals: active branches, declared sortBy, dv × partitioned") {
    val root = fresh("refuse")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.createBranch("wip")
    val e1 = intercept[IllegalArgumentException](t.migrateLayout(Some(4), Nil))
    assert(e1.getMessage.contains("branches"))
    t.dropBranch("wip")
    val dv = MergeTable.createIfAbsent(spark, fresh("refuse_dv"), Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")),
      mode = MergeTable.DeletionVectors)
    val e2 = intercept[IllegalArgumentException](
      dv.migrateLayout(None, Seq("v")))
    assert(e2.getMessage.contains("deletion-vectors"))
  }
}
