package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

/** The TRUE DSv2 write path (MergeTableBatchWrite) and its
  * RequiresDistributionAndOrdering request: a bucketed seed INSERT
  * plans an engine-side rebalance over the catalog-served
  * `bucket(n, keys…)` transform, a partitioned seed over the
  * partition columns — and because the write is a real BATCH_WRITE
  * (not a V1 fallback, which Spark executes from the stored analyzed
  * query, ignoring the request), the clustering actually executes:
  * file counts are bounded by the layout, not the source parallelism.
  * Populated keyed layouts keep their V1 merge semantics.
  */
class WriteDistributionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def dataFiles(db: String, t: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"target/graft_warehouse/$db/$t"))
      .iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
  }

  test("a bucketed seed INSERT requests and EXECUTES bucket clustering") {
    fresh("wd1")
    spark.sql("""CREATE TABLE graft.wd1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(16) // deliberately wide source
      .createOrReplaceTempView("wd1_src")
    val plan = spark.sql(
      "EXPLAIN EXTENDED INSERT INTO graft.wd1.t SELECT * FROM wd1_src")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.toLowerCase.contains("rebalancepartitions"),
      s"INSERT must request engine-side clustering, plan was:\n$plan")
    assert(plan.contains("GraftBucketBound"),
      "the rebalance must key on the catalog bucket transform")

    spark.sql("INSERT INTO graft.wd1.t SELECT * FROM wd1_src")
    assert(spark.table("graft.wd1.t").count() === 400L)
    // 16 source tasks × 4 buckets would be up to 64 shards if the
    // request were ignored (the V1Write trap); clustered, each
    // bucket's rows land together
    assert(dataFiles("wd1", "t").size <= 8,
      s"expected ~one file per bucket, got ${dataFiles("wd1", "t").size}")
    // and the layout is the real write-side layout: a keyed read
    // through bucket pruning still finds its rows
    assert(spark.sql("SELECT v FROM graft.wd1.t WHERE id = 7")
      .as[String].head() === "v7")
  }

  test("a second INSERT into the populated bucketed table keeps merge semantics") {
    // (depends on wd1 seeded above) INSERT of an existing key must
    // UPSERT — the populated-layout path stays on the V1 scoped merge
    spark.sql("INSERT INTO graft.wd1.t VALUES (7, 'updated'), (900, 'new')")
    assert(spark.table("graft.wd1.t").count() === 401L)
    assert(spark.sql("SELECT v FROM graft.wd1.t WHERE id = 7")
      .as[String].head() === "updated")
  }

  test("a partitioned seed INSERT clusters by the partition columns") {
    fresh("wd2")
    spark.sql("""CREATE TABLE graft.wd2.t (id BIGINT, day STRING, v BIGINT)
                 PARTITIONED BY (day) TBLPROPERTIES('keys'='id')""")
    (1L to 300L).map(i => (i, s"d${i % 3}", i)).toDF("id", "day", "v")
      .repartition(12)
      .createOrReplaceTempView("wd2_src")
    val plan = spark.sql(
      "EXPLAIN EXTENDED INSERT INTO graft.wd2.t SELECT * FROM wd2_src")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.toLowerCase.contains("rebalancepartitions"),
      s"partitioned INSERT must request identity clustering, plan was:\n$plan")
    spark.sql("INSERT INTO graft.wd2.t SELECT * FROM wd2_src")
    assert(spark.table("graft.wd2.t").count() === 300L)
    assert(dataFiles("wd2", "t").size <= 6,
      s"expected ~one file per partition, got ${dataFiles("wd2", "t").size}")
    // partition pruning still sees the expected dirs
    assert(spark.sql("SELECT count(*) FROM graft.wd2.t WHERE day = 'd1'")
      .as[Long].head() === 100L)
    // and a follow-up keyed mutation works against the seeded layout
    spark.sql("INSERT INTO graft.wd2.t VALUES (1, 'd1', 999)")
    assert(spark.sql("SELECT v FROM graft.wd2.t WHERE id = 1")
      .as[Long].head() === 999L)
    assert(spark.table("graft.wd2.t").count() === 300L, "existing key upserts")
  }

  test("a hidden-day seed INSERT rides the v2 write, clustered by days(ts) (r13)") {
    fresh("wd7")
    spark.sql("""CREATE TABLE graft.wd7.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    (1L to 300L).map(i => (i, s"v$i",
        java.time.LocalDateTime.parse(f"2024-03-${i % 3 + 1}%02dT0${i % 9}:00:00")))
      .toDF("id", "v", "ts").repartition(12).createOrReplaceTempView("wd7_src")
    val plan = spark.sql(
      "EXPLAIN EXTENDED INSERT INTO graft.wd7.t SELECT * FROM wd7_src")
      .collect().map(_.getString(0)).mkString("\n")
    // the seed clusters by the FunctionCatalog-resolved days(ts)
    // transform — the derived column itself never enters the plan
    assert(plan.contains("MergeTableBatchWrite"),
      s"derived seed should ride the v2 write, plan was:\n$plan")
    assert(plan.toLowerCase.contains("rebalancepartitions"),
      s"derived seed must request granule clustering, plan was:\n$plan")
    spark.sql("INSERT INTO graft.wd7.t SELECT * FROM wd7_src")
    assert(spark.table("graft.wd7.t").count() === 300L)
    // ~one file per day dir: the clustering actually took effect
    assert(dataFiles("wd7", "t").size <= 6,
      s"expected ~one file per day, got ${dataFiles("wd7", "t").size}")
    // the executor-side derivation is byte-identical to the V1 path:
    // day dirs, hidden column, pruning, and a follow-up V1 upsert all
    // compose with the v2-seeded layout
    val lines = latestManifestLines("target/graft_warehouse/wd7/t")
    assert(lines.forall(_.startsWith("pv:")), lines.mkString("|"))
    assert(lines.exists(_.contains("_graft_p_ts_day=2024-03-01")), lines.mkString("|"))
    assert(!spark.table("graft.wd7.t").columns.contains("ts_day"))
    assert(spark.sql("SELECT count(*) FROM graft.wd7.t " +
      "WHERE ts >= TIMESTAMP_NTZ'2024-03-03 00:00:00'").as[Long].head() === 100L)
    spark.sql("INSERT INTO graft.wd7.t VALUES " +
      "(1, 'updated', TIMESTAMP_NTZ'2024-03-01 05:00:00')")
    assert(spark.sql("SELECT v FROM graft.wd7.t WHERE id = 1")
      .as[String].head() === "updated")
    assert(spark.table("graft.wd7.t").count() === 300L)
    // and the v2-seeded table still SPJs on ts (scan-side r13 feature)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.id FROM graft.wd7.t a JOIN graft.wd7.t b ON a.ts = b.ts")
      assert(shuffles(j) === 0, j.queryExecution.executedPlan.toString)
    }
  }

  test("a flat INSERT rides the v2 write with no gratuitous shuffle") {
    fresh("wd3")
    spark.sql("""CREATE TABLE graft.wd3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    val plan = spark.sql(
      "EXPLAIN EXTENDED INSERT INTO graft.wd3.t VALUES (1, 'a'), (2, 'b')")
      .collect().map(_.getString(0)).mkString("\n")
    assert(!plan.toLowerCase.contains("rebalancepartitions"),
      "a flat append has no layout to satisfy — no rebalance")
    assert(plan.contains("MergeTableBatchWrite"),
      s"flat INSERT should ride the v2 write, plan was:\n$plan")
    spark.sql("INSERT INTO graft.wd3.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.wd3.t VALUES (3, 'c')")
    assert(spark.table("graft.wd3.t").orderBy("id").as[(Long, String)].collect()
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("bucketed CTAS seeds through the v2 clustered write") {
    fresh("wd4")
    (1L to 200L).map(i => (i, i * 2)).toDF("id", "n")
      .repartition(10).createOrReplaceTempView("wd4_src")
    spark.sql("""CREATE TABLE graft.wd4.t
                 TBLPROPERTIES('keys'='id', 'buckets'='4')
                 AS SELECT * FROM wd4_src""")
    assert(spark.table("graft.wd4.t").count() === 200L)
    assert(dataFiles("wd4", "t").size <= 8,
      s"CTAS should emit ~one file per bucket, got ${dataFiles("wd4", "t").size}")
    assert(spark.sql("SELECT n FROM graft.wd4.t WHERE id = 42").as[Long].head() === 84L)
  }

  test("maxRecordsPerFile rolls the v2 writer's files (skewed buckets stay bounded)") {
    fresh("wd7")
    spark.sql("""CREATE TABLE graft.wd7.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    val prior = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    try {
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "50")
      (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
        .createOrReplaceTempView("wd7_src")
      spark.sql("INSERT INTO graft.wd7.t SELECT * FROM wd7_src")
      assert(spark.table("graft.wd7.t").count() === 400L)
      val n = dataFiles("wd7", "t").size
      // ~100 rows per bucket at 50 records/file → at least 2 files per
      // bucket; still bounded (not one per input task per bucket)
      assert(n >= 8 && n <= 16, s"expected rolled-but-bounded files, got $n")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
  }

  test("an empty INSERT commits nothing") {
    fresh("wd5")
    spark.sql("""CREATE TABLE graft.wd5.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO graft.wd5.t SELECT CAST(1 AS BIGINT), 'x' WHERE 1 = 0")
    assert(spark.table("graft.wd5.t").count() === 0L)
    // ...and the table still seeds normally afterwards
    spark.sql("INSERT INTO graft.wd5.t VALUES (1, 'a')")
    assert(spark.table("graft.wd5.t").count() === 1L)
  }

  test("INSERT OVERWRITE replaces a flat table's contents in one commit") {
    fresh("wd8")
    spark.sql("""CREATE TABLE graft.wd8.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.wd8.t VALUES (1, 'old1'), (2, 'old2')")
    spark.sql("INSERT INTO graft.wd8.t VALUES (3, 'old3')")
    spark.sql("INSERT OVERWRITE graft.wd8.t VALUES (10, 'new')")
    assert(spark.table("graft.wd8.t").as[(Long, String)].collect().toSeq
      === Seq((10L, "new")))
    // the overwrite is one VERSION: time travel still reads the old
    val t = MergeTable.open(spark, "target/graft_warehouse/wd8/t")
    val versions = t.versions()
    assert(t.readVersion(versions(versions.length - 2))
      .count() === 3L, "pre-overwrite snapshot must survive for time travel")
    // ...and the table keeps working after
    spark.sql("INSERT INTO graft.wd8.t VALUES (11, 'more')")
    assert(spark.table("graft.wd8.t").count() === 2L)
  }

  test("INSERT OVERWRITE with an empty source truncates (never keeps stale rows)") {
    fresh("wd11")
    spark.sql("""CREATE TABLE graft.wd11.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.wd11.t VALUES (1, 'stale'), (2, 'stale')")
    // the full-refresh job's upstream came back empty: SQL semantics
    // (and Delta/Iceberg) say the table is now empty, not unchanged
    spark.sql("INSERT OVERWRITE graft.wd11.t SELECT CAST(1 AS BIGINT), 'x' WHERE 1 = 0")
    assert(spark.table("graft.wd11.t").count() === 0L,
      "an empty overwrite must truncate")
    // and the emptied table keeps working
    spark.sql("INSERT INTO graft.wd11.t VALUES (5, 'fresh')")
    assert(spark.table("graft.wd11.t").as[(Long, String)].collect().toSeq
      === Seq((5L, "fresh")))
  }

  test("the change feed sees v2 appends and overwrites like any COW commit") {
    fresh("wd10")
    spark.sql("""CREATE TABLE graft.wd10.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.wd10.t VALUES (1, 'a'), (2, 'b')")
    val root = "target/graft_warehouse/wd10/t"
    val ins = spark.sql(s"SELECT id, _change FROM table_changes('$root', 0)")
      .as[(Long, String)].collect().toSet
    assert(ins === Set((1L, "I"), (2L, "I")),
      "an externally-staged v2 append must surface as plain inserts")

    spark.sql("INSERT OVERWRITE graft.wd10.t VALUES (2, 'b2'), (9, 'new')")
    // startingVersion is the BASE snapshot: changes AFTER it
    val base = MergeTable.open(spark, root).versions().max - 1
    val ow = spark.sql(s"SELECT id, _change FROM table_changes('$root', $base)")
      .as[(Long, String)].collect().toSet
    // the overwrite commit diffs as a COW rewrite: dropped key → D,
    // fresh key → I, surviving key with a new value → U
    assert(ow === Set((1L, "D"), (2L, "U"), (9L, "I")),
      s"overwrite must replay as a rewrite diff, got $ow")
  }

  test("INSERT OVERWRITE refuses populated keyed layouts loudly") {
    fresh("wd9")
    spark.sql("""CREATE TABLE graft.wd9.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO graft.wd9.t VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE graft.wd9.t VALUES (2, 'b')")
    }
    assert(e.getMessage.toLowerCase.contains("truncate") ||
      e.getMessage.contains("INSERT OVERWRITE"), e.getMessage)
    assert(spark.table("graft.wd9.t").count() === 1L, "refusal must not mutate")
  }

  test("VACUUM reclaims a crashed v2 write's orphaned staging dir") {
    fresh("wd12")
    spark.sql("""CREATE TABLE graft.wd12.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.wd12.t VALUES (1, 'a')")
    // simulate a driver crash between staging and commit: files exist
    // under data/<uuid> but no manifest references the dir
    val orphan = java.nio.file.Paths.get(
      "target/graft_warehouse/wd12/t/data/deadbeef-orphan")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-00000-x.parquet"), "junk".getBytes)
    MergeTable.open(spark, "target/graft_warehouse/wd12/t").vacuum()
    assert(!java.nio.file.Files.exists(orphan),
      "the unreferenced staging dir must be reclaimed")
    assert(spark.table("graft.wd12.t").count() === 1L, "live data untouched")
  }

  test("CHECK constraints route the write back to the enforcing V1 path") {
    fresh("wd6")
    spark.sql("""CREATE TABLE graft.wd6.t (id BIGINT, v BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("ALTER TABLE graft.wd6.t ADD CONSTRAINT pos CHECK (v > 0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.wd6.t VALUES (1, -5)")
    }
    assert(e.getMessage.contains("pos"), s"constraint must still enforce: ${e.getMessage}")
    spark.sql("INSERT INTO graft.wd6.t VALUES (1, 5)")
    assert(spark.table("graft.wd6.t").count() === 1L)
  }
}
