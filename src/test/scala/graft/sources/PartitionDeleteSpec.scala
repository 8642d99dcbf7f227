package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

/** Metadata-only partition deletes: a DELETE whose predicate is
  * partition-COMPLETE (every row of a matched dir satisfies it) drops
  * whole pv dirs in one manifest commit — zero data I/O, the
  * retention shape at 100 TB. Anything uncertain falls back to the
  * exact row-level delete.
  */
class PartitionDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def dataDirCount(root: String): Int =
    Option(new java.io.File(s"$root/data").list()).map(_.length).getOrElse(0)

  test("identity partition equality deletes by dropping the dir (no data I/O)") {
    fresh("pd1")
    spark.sql("""CREATE TABLE graft.pd1.t (id BIGINT, grp STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (grp)""")
    spark.sql("""INSERT INTO graft.pd1.t VALUES
                 (1,'red',10), (2,'red',20), (3,'blue',30), (4,'green',40)""")
    val root = "target/graft_warehouse/pd1/t"
    val dirsBefore = dataDirCount(root)
    spark.sql("DELETE FROM graft.pd1.t WHERE grp = 'red'")
    // metadata-only: NO new data dir was written (a row-level delete
    // writes a rewritten partition), the red dir just left the manifest
    assert(dataDirCount(root) === dirsBefore, "delete must not write data")
    assert(!latestManifestLines(root).exists(_.contains("grp=red")))
    assert(spark.table("graft.pd1.t").select("id").as[Long].collect().sorted ===
      Seq(3L, 4L))
  }

  test("hidden-day retention cutoff at midnight drops day dirs") {
    fresh("pd2")
    spark.sql("""CREATE TABLE graft.pd2.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.pd2.t VALUES
                 (1,'a',TIMESTAMP_NTZ'2024-03-01 10:00:00'),
                 (2,'b',TIMESTAMP_NTZ'2024-03-02 10:00:00'),
                 (3,'c',TIMESTAMP_NTZ'2024-03-03 10:00:00')""")
    val root = "target/graft_warehouse/pd2/t"
    val dirsBefore = dataDirCount(root)
    spark.sql("DELETE FROM graft.pd2.t WHERE ts < TIMESTAMP_NTZ'2024-03-03 00:00:00'")
    assert(dataDirCount(root) === dirsBefore, "retention must not write data")
    assert(spark.table("graft.pd2.t").select("id").as[Long].collect() === Seq(3L))
    // the dropped days are gone from the layout, the kept one remains
    val lines = latestManifestLines(root)
    assert(lines.forall(_.contains("ts_day=2024-03-03")), lines.mkString("|"))
  }

  test("ALTER TABLE DROP PARTITION: one metadata commit, zero records read (r13)") {
    fresh("pd5")
    spark.sql("""CREATE TABLE graft.pd5.t (id BIGINT, grp STRING, g2 BIGINT, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (grp, g2)""")
    spark.sql("""INSERT INTO graft.pd5.t VALUES
                 (1,'red',1,10), (2,'red',2,20), (3,'blue',1,30), (4,'green',1,40)""")
    val root = "target/graft_warehouse/pd5/t"
    val dirsBefore = dataDirCount(root)
    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // PARTIAL spec: grp='red' drops BOTH red leaves (g2=1, g2=2)
      assert(spark.sql("ALTER TABLE graft.pd5.t DROP PARTITION (grp = 'red')")
        .head().getLong(0) === 2L)
      Thread.sleep(500) // listener bus drains asynchronously
      assert(recordsRead === 0L, "DROP PARTITION must open zero data files")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(dataDirCount(root) === dirsBefore, "drop must not write data")
    assert(!latestManifestLines(root).exists(_.contains("grp=red")))
    assert(spark.table("graft.pd5.t").select("id").as[Long].collect().sorted
      === Seq(3L, 4L))
    // full spec drops exactly one leaf; a miss errors without IF EXISTS
    assert(spark.sql("ALTER TABLE graft.pd5.t DROP PARTITION (grp = 'blue', g2 = 1)")
      .head().getLong(0) === 1L)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.pd5.t DROP PARTITION (grp = 'absent')").collect())
    assert(e.getMessage.contains("no partition"), e.getMessage)
    assert(spark.sql(
      "ALTER TABLE graft.pd5.t DROP IF EXISTS PARTITION (grp = 'absent')")
      .head().getLong(0) === 0L)
    // non-partition column refuses loudly
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.pd5.t DROP PARTITION (v = 40)").collect())
    assert(e2.getMessage.contains("not a partition column"), e2.getMessage)
  }

  test("DROP PARTITION drops all bucket cells of a composed partition leaf (r14)") {
    fresh("pd6")
    spark.sql("""CREATE TABLE graft.pd6.t (id BIGINT, grp STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='4') PARTITIONED BY (grp)""")
    spark.sql("""INSERT INTO graft.pd6.t VALUES
                 (1,'red',10), (2,'red',20), (3,'red',30), (4,'blue',40), (5,'blue',50)""")
    val root = "target/graft_warehouse/pd6/t"
    assert(latestManifestLines(root).exists(_.startsWith("pb")),
      "precondition: composed layout commits pb leaves")
    val dirsBefore = dataDirCount(root)
    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the returned count is LOGICAL partitions (bucket cells of one
      // leaf collapse to 1), and the whole partition vanishes metadata-only
      assert(spark.sql("ALTER TABLE graft.pd6.t DROP PARTITION (grp = 'red')")
        .head().getLong(0) === 1L)
      Thread.sleep(500)
      assert(recordsRead === 0L, "composed DROP PARTITION must open zero data files")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(dataDirCount(root) === dirsBefore, "drop must not write data")
    assert(!latestManifestLines(root).exists(_.contains("grp=red")))
    assert(spark.table("graft.pd6.t").select("id").as[Long].collect().sorted
      === Seq(4L, 5L))
    // and the survivors keep their composed layout + bucketed semantics
    spark.sql("INSERT INTO graft.pd6.t VALUES (6,'blue',60)")
    assert(spark.table("graft.pd6.t").count() === 3)
  }

  test("DROP PARTITION on hidden-day layouts addresses the derived column") {
    fresh("pd6")
    spark.sql("""CREATE TABLE graft.pd6.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.pd6.t VALUES
                 (1,'a',TIMESTAMP_NTZ'2024-03-01 10:00:00'),
                 (2,'b',TIMESTAMP_NTZ'2024-03-02 10:00:00')""")
    assert(spark.sql(
      "ALTER TABLE graft.pd6.t DROP PARTITION (ts_day = '2024-03-01')")
      .head().getLong(0) === 1L)
    assert(spark.table("graft.pd6.t").select("id").as[Long].collect() === Seq(2L))
    // time travel still reads the pre-drop snapshot
    assert(spark.sql("SELECT count(*) FROM graft.pd6.t VERSION AS OF 1")
      .head().getLong(0) === 2L)
  }

  test("DROP PARTITION refuses MOR pending deltas instead of silently row-deleting") {
    fresh("pd7")
    spark.sql("""CREATE TABLE graft.pd7.t (id BIGINT, grp STRING)
                 PARTITIONED BY (grp)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.pd7.t VALUES (1, 'a'), (2, 'b')")
    MergeTable.open(spark, "target/graft_warehouse/pd7/t")
      .upsert(Seq((3L, "a")).toDF("id", "grp"))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.pd7.t DROP PARTITION (grp = 'a')").collect())
    assert(e.getMessage.contains("COMPACT"), e.getMessage)
  }

  test("uncertain predicates fall back to the exact row delete") {
    fresh("pd3")
    spark.sql("""CREATE TABLE graft.pd3.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.pd3.t VALUES
                 (1,'a',TIMESTAMP_NTZ'2024-03-01 10:00:00'),
                 (2,'b',TIMESTAMP_NTZ'2024-03-01 23:00:00'),
                 (3,'c',TIMESTAMP_NTZ'2024-03-02 10:00:00')""")
    // mid-day cutoff: day 2024-03-01 is MIXED — must not drop the dir
    spark.sql("DELETE FROM graft.pd3.t WHERE ts < TIMESTAMP_NTZ'2024-03-01 12:00:00'")
    assert(spark.table("graft.pd3.t").select("id").as[Long].collect().sorted ===
      Seq(2L, 3L))
    // data-column predicate: row-level path, exact
    spark.sql("DELETE FROM graft.pd3.t WHERE v = 'b'")
    assert(spark.table("graft.pd3.t").select("id").as[Long].collect() === Seq(3L))
    // negation is never partition-complete-decidable here: exact path
    fresh("pd4")
    spark.sql("""CREATE TABLE graft.pd4.t (id BIGINT, grp STRING)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO graft.pd4.t VALUES (1,'red'), (2,'blue')")
    spark.sql("DELETE FROM graft.pd4.t WHERE NOT (grp = 'red')")
    assert(spark.table("graft.pd4.t").select("grp").as[String].collect() ===
      Seq("red"))
  }

  test("MOR layouts never take the metadata-only path (deltas hold rows)") {
    fresh("pd5")
    spark.sql("""CREATE TABLE graft.pd5.t (id BIGINT, grp STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')
                 PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO graft.pd5.t VALUES (1,'red',10), (2,'blue',20)")
    spark.sql("""MERGE INTO graft.pd5.t t USING
                 (SELECT CAST(3 AS BIGINT) id, 'red' grp, CAST(30 AS BIGINT) v) s
                 ON t.id = s.id WHEN NOT MATCHED THEN INSERT *""")
    // a MOR delta now holds a red row outside the pv dirs: the drop
    // path must refuse and the row delete must still be exact
    spark.sql("DELETE FROM graft.pd5.t WHERE grp = 'red'")
    assert(spark.table("graft.pd5.t").select("id").as[Long].collect() === Seq(2L))
  }
}
