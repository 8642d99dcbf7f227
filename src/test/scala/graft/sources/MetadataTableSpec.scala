package graft.sources

import graft.SparkSpec

/** Iceberg-style inspection tables: `graft.db.t.files` / `.history` /
  * `.refs` resolve through the catalog as read-only metadata tables —
  * driver-computed manifest facts, no data files opened, WAP-branch
  * aware, and shadowed by any REAL table of the same name.
  */
class MetadataTableSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    graft.cdc.MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  test("files lists every live data file; compaction shrinks it") {
    fresh("meta1")
    spark.sql("""CREATE TABLE graft.meta1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.meta1.t VALUES (1,'a')")
    spark.sql("INSERT INTO graft.meta1.t VALUES (2,'b')")
    val files = spark.table("graft.meta1.t.files")
      .as[(String, String, Long, String)].collect()
    // base + one MOR delta, every row a real parquet file under data/
    assert(files.length >= 2, files.mkString("|"))
    assert(files.map(_._1).toSet.subsetOf(Set("base", "delta")))
    assert(files.forall(f => f._2.startsWith("data/") && f._2.endsWith(".parquet")))
    assert(files.forall(_._3 > 0))
    spark.sql("COMPACT graft.meta1.t")
    val after = spark.table("graft.meta1.t.files")
      .as[(String, String, Long, String)].collect()
    assert(after.forall(_._1 == "base"), after.mkString("|"))
  }

  test("history is the queryable commit log; refs lists branches and tags") {
    fresh("meta2")
    spark.sql("""CREATE TABLE graft.meta2.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.meta2.t VALUES (1,'a')") // v1
    spark.sql("INSERT INTO graft.meta2.t VALUES (2,'b')") // v2
    val h = spark.sql(
      "SELECT version, base_entries FROM graft.meta2.t.history ORDER BY version")
      .as[(Long, Int)].collect()
    assert(h.map(_._1).toSeq === Seq(1L, 2L))
    // metadata tables are plain relations: joins/aggregates compose
    assert(spark.sql(
      "SELECT max(version) FROM graft.meta2.t.history").as[Long].head() === 2L)
    val root = "target/graft_warehouse/meta2/t"
    val t = graft.cdc.MergeTable.open(spark, root)
    t.createBranch("audit")
    t.createTag("rel1", Some(1L))
    val refs = spark.table("graft.meta2.t.refs")
      .as[(String, String, Long)].collect().toSet
    assert(refs === Set(("main", "branch", 2L), ("audit", "branch", 2L),
      ("rel1", "tag", 1L)))
  }

  test("manifests inspection table reports the commit-log shapes (r13)") {
    fresh("meta7")
    withSQLConf("graft.mergetable.manifestSegmentSize" -> "4",
        "graft.mergetable.manifestCheckpointInterval" -> "3") {
      spark.sql("""CREATE TABLE graft.meta7.t (id BIGINT, v STRING)
                   TBLPROPERTIES('keys'='id', 'buckets'='32')""")
      spark.sql("INSERT INTO graft.meta7.t SELECT id, concat('v', id) " +
        "FROM range(0, 256)") // v1: 32-entry seed → segmented checkpoint
      val t = graft.cdc.MergeTable.open(spark, "target/graft_warehouse/meta7/t")
      t.upsert(Seq((5L, "V5")).toDF("id", "v")) // v2: delta
      val m = spark.sql(
        """SELECT version, kind, chain_depth, entries, segment_refs
           FROM graft.meta7.t.manifests ORDER BY version""")
        .as[(Long, String, Int, Int, Int)].collect()
      assert(m(0) === ((1L, "segments", 0, 32, 8)), m.mkString("|"))
      assert(m(1)._2 === "delta" && m(1)._3 === 1 && m(1)._4 === 32, m.mkString("|"))
      // the health question the table exists for: is the log O(delta)?
      assert(spark.sql(
        """SELECT max(chain_depth) FROM graft.meta7.t.manifests""")
        .head().getInt(0) <= 3)
    }
  }

  test("wap branch conf routes files/history to the branch lineage") {
    fresh("meta3")
    spark.sql("""CREATE TABLE graft.meta3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.meta3.t VALUES (1,'a')")
    val t = graft.cdc.MergeTable.open(spark, "target/graft_warehouse/meta3/t")
    t.createBranch("wip")
    import spark.implicits._
    t.forBranch("wip").append(Seq((2L, "b")).toDF("id", "v"))
    withSQLConf("spark.graft.wap.branch" -> "wip") {
      assert(spark.sql("SELECT max(version) FROM graft.meta3.t.history")
        .as[Long].head() === 2L)
    }
    assert(spark.sql("SELECT max(version) FROM graft.meta3.t.history")
      .as[Long].head() === 1L)
  }

  test("history records operation labels (append / upsert / delete / compact)") {
    fresh("meta6")
    spark.sql("""CREATE TABLE graft.meta6.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.meta6.t VALUES (1,'a')")
    spark.sql("""MERGE INTO graft.meta6.t t USING (SELECT CAST(1 AS BIGINT) id, 'A' v) s
                 ON t.id = s.id WHEN MATCHED THEN UPDATE SET *""")
    spark.sql("DELETE FROM graft.meta6.t WHERE id = 99")
    spark.sql("COMPACT graft.meta6.t")
    val ops = spark.sql("DESCRIBE HISTORY graft.meta6.t")
      .selectExpr("version", "operation").as[(Long, String)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(ops.head === "append", ops)
    assert(ops.last === "compact", ops)
    assert(ops.contains("upsert") && ops.contains("delete"), ops)
    // the metadata table serves the same labels
    assert(spark.table("graft.meta6.t.history").selectExpr("operation")
      .as[String].collect().toSet === ops.toSet)
  }

  test("stats inspection table surfaces the ANALYZE state per column (r14)") {
    fresh("meta9")
    spark.sql("""CREATE TABLE graft.meta9.t (id BIGINT, k BIGINT, s STRING)
                 TBLPROPERTIES('keys'='id')""")
    (0 until 500).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L,
        if (i % 5 == 0) null else s"v$i"))
      .toDF("id", "k", "s").createOrReplaceTempView("meta9_src")
    spark.sql("INSERT INTO graft.meta9.t SELECT * FROM meta9_src")
    // no ANALYZE yet → empty surface, not an error
    assert(spark.table("graft.meta9.t.stats").isEmpty)
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.meta9.t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val rows = spark.table("graft.meta9.t.stats").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("id", "k", "s"))
    val k = rows("k")
    assert(k.getLong(2) === 0L) // null_count
    assert(k.getDouble(5) === 0.0 && k.getDouble(6) === 490.0) // min/max
    assert(k.getInt(7) === 10, "hist_bins")
    assert(k.getInt(8) >= 7, "the heavy hitter must show as heavy [v,v] bins")
    assert(k.getBoolean(9) && k.getBoolean(10), "both sketch registers persisted")
    assert(k.getLong(12) === 500L) // table_rows
    assert(rows("s").getLong(2) === 100L) // exact nulls
    assert(rows("s").getInt(7) === 0, "strings carry no histogram")
    // stats_version tracks the ANALYZE-time snapshot
    assert(rows("id").getLong(11) >= 1L)
  }

  test("a real table named files shadows the metadata surface") {
    fresh("meta4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.meta4.t")
    spark.sql("""CREATE TABLE graft.meta4.t.files (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.meta4.t.files VALUES (7,'real')")
    val got = spark.table("graft.meta4.t.files").as[(Long, String)].collect()
    assert(got === Array((7L, "real")))
  }

  test("TRUNCATE TABLE: one metadata commit, history intact, vacuum reclaims") {
    fresh("meta7")
    spark.sql("""CREATE TABLE graft.meta7.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.meta7.t VALUES (1,'a'), (2,'b')") // v1
    val root = "target/graft_warehouse/meta7/t"
    val dirsBefore = new java.io.File(s"$root/data").list().length
    spark.sql("TRUNCATE TABLE graft.meta7.t") // v2: empty-entry commit
    assert(new java.io.File(s"$root/data").list().length === dirsBefore,
      "truncate must not write data")
    assert(spark.table("graft.meta7.t").count() === 0)
    // schema survives; writes keep working
    spark.sql("INSERT INTO graft.meta7.t VALUES (3,'c')")
    assert(spark.table("graft.meta7.t").as[(Long, String)].collect() ===
      Array((3L, "c")))
    // history intact: pre-truncate snapshot still reads; op labeled
    val t = graft.cdc.MergeTable.open(spark, root)
    assert(t.readVersion(1L).count() === 2)
    assert(spark.sql("DESCRIBE HISTORY graft.meta7.t")
      .selectExpr("operation").as[String].collect().contains("truncate"))
    // vacuum reclaims the now-unreferenced seed dir
    assert(t.vacuum() >= 1)
  }

  test("metadata suffix on a missing table still errors as no-such-table") {
    fresh("meta5")
    val e = intercept[Exception](spark.table("graft.meta5.nope.files").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
