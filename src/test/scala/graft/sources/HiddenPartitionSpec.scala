package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}

/** Hidden partitioning (`PARTITIONED BY (days(ts))` — Iceberg's days
  * transform): the derived day column is injected at write, drives
  * the dir layout, pruning, SHOW PARTITIONS, and scoped maintenance —
  * and is invisible to every reader and writer.
  */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def ts(s: String) = java.time.LocalDateTime.parse(s)

  test("rows land in day dirs; the derived column never surfaces") {
    fresh("hp1")
    spark.sql("""CREATE TABLE graft.hp1.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    Seq((1L, "a", ts("2024-03-01T10:00:00")), (2L, "b", ts("2024-03-01T23:59:00")),
        (3L, "c", ts("2024-03-02T00:01:00")))
      .toDF("id", "v", "ts").createOrReplaceTempView("hp1_src")
    spark.sql("INSERT INTO graft.hp1.t SELECT * FROM hp1_src")
    // layout: pv entries addressed by the DERIVED day
    val lines = latestManifestLines("target/graft_warehouse/hp1/t")
    assert(lines.forall(_.startsWith("pv:")), lines.mkString("|"))
    assert(lines.exists(_.contains("_graft_p_ts_day=2024-03-01")), lines)
    assert(lines.exists(_.contains("_graft_p_ts_day=2024-03-02")), lines)
    // invisible: schema, SELECT *, and a direct reference all exclude it
    assert(spark.table("graft.hp1.t").columns.toSeq === Seq("id", "v", "ts"))
    assert(intercept[Exception](
      spark.sql("SELECT ts_day FROM graft.hp1.t").collect())
      .getMessage.contains("ts_day"))
    assert(spark.table("graft.hp1.t").count() === 3)
    // SHOW PARTITIONS reports the hidden day values
    val parts = spark.sql("SHOW PARTITIONS graft.hp1.t")
      .select("partition").as[String].collect().toSet
    assert(parts.exists(_.contains("2024-03-01")) &&
      parts.exists(_.contains("2024-03-02")), parts)
  }

  test("timestamp predicates prune day dirs without naming the hidden column") {
    fresh("hp2")
    spark.sql("""CREATE TABLE graft.hp2.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    (1 to 30).map(i => (i.toLong, s"v$i", ts(f"2024-03-${i % 3 + 1}%02dT12:00:00")))
      .toDF("id", "v", "ts").createOrReplaceTempView("hp2_src")
    spark.sql("INSERT INTO graft.hp2.t SELECT * FROM hp2_src")
    val meta = MergeTable.readMeta("target/graft_warehouse/hp2/t").get
    val rel = new MergeTableRelation(spark.sqlContext,
      "target/graft_warehouse/hp2/t", meta.keys, meta.mode, meta.numBuckets,
      partitionCols = meta.partitionCols)
    val (keptGe, total) = rel.survivingFiles(
      Array(GreaterThanOrEqual("ts", ts("2024-03-03T00:00:00")))).get
    assert(total >= 3, s"expected >=3 day files, got $total")
    assert(keptGe.nonEmpty && keptGe.size < total)
    assert(keptGe.forall(_.toString.contains("_graft_p_ts_day=2024-03-03")),
      keptGe.mkString("|"))
    val (keptLt, _) = rel.survivingFiles(
      Array(LessThan("ts", ts("2024-03-02T00:00:00")))).get
    // strict bound relaxes to inclusive at day granularity: day 1 only
    assert(keptLt.nonEmpty &&
      keptLt.forall(_.toString.contains("_graft_p_ts_day=2024-03-01")),
      keptLt.mkString("|"))
    // pruned reads stay correct end to end
    assert(spark.sql(
      "SELECT count(*) FROM graft.hp2.t WHERE ts >= TIMESTAMP_NTZ'2024-03-03 00:00:00'")
      .as[Long].head() === 10L)
  }

  test("upserts rewrite only the touched day; maintenance stays scoped") {
    fresh("hp3")
    spark.sql("""CREATE TABLE graft.hp3.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    Seq((1L, "a", ts("2024-03-01T10:00:00")), (2L, "b", ts("2024-03-02T10:00:00")))
      .toDF("id", "v", "ts").createOrReplaceTempView("hp3_src")
    spark.sql("INSERT INTO graft.hp3.t SELECT * FROM hp3_src")
    val before = latestManifestLines("target/graft_warehouse/hp3/t").sorted
    spark.sql("""MERGE INTO graft.hp3.t t
                 USING (SELECT CAST(1 AS BIGINT) id, 'A' v,
                        TIMESTAMP_NTZ'2024-03-01 11:00:00' ts) s
                 ON t.id = s.id WHEN MATCHED THEN UPDATE SET *""")
    val after = latestManifestLines("target/graft_warehouse/hp3/t").sorted
    // one day rewritten, the other verbatim
    assert(before.intersect(after).size === before.size - 1, (before, after))
    assert(spark.table("graft.hp3.t").select("id", "v").as[(Long, String)]
      .collect().sorted === Seq((1L, "A"), (2L, "b")))
    // DELETE flows through the key-addressed scoped path too
    spark.sql("DELETE FROM graft.hp3.t WHERE id = 2")
    assert(spark.table("graft.hp3.t").select("id").as[Long].collect() === Seq(1L))
  }

  test("months(ts): month dirs, pruning, and month-boundary retention") {
    fresh("hp5")
    spark.sql("""CREATE TABLE graft.hp5.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (months(ts))""")
    Seq((1L, "a", ts("2024-01-15T10:00:00")), (2L, "b", ts("2024-02-10T10:00:00")),
        (3L, "c", ts("2024-03-05T10:00:00")))
      .toDF("id", "v", "ts").createOrReplaceTempView("hp5_src")
    spark.sql("INSERT INTO graft.hp5.t SELECT * FROM hp5_src")
    val root = "target/graft_warehouse/hp5/t"
    val lines = latestManifestLines(root)
    assert(lines.exists(_.contains("_graft_p_ts_month=2024-01")), lines)
    assert(spark.table("graft.hp5.t").columns.toSeq === Seq("id", "v", "ts"))
    // ts-range pruning at month granularity
    val meta = MergeTable.readMeta(root).get
    val rel = new MergeTableRelation(spark.sqlContext, root, meta.keys,
      meta.mode, meta.numBuckets, partitionCols = meta.partitionCols)
    val (kept, total) = rel.survivingFiles(
      Array(GreaterThanOrEqual("ts", ts("2024-03-01T00:00:00")))).get
    assert(kept.nonEmpty && kept.size < total)
    assert(kept.forall(_.toString.contains("ts_month=2024-03")), kept)
    // month-boundary retention: metadata-only dir drop
    val dirsBefore = Option(new java.io.File(s"$root/data").list()).get.length
    spark.sql("DELETE FROM graft.hp5.t WHERE ts < TIMESTAMP_NTZ'2024-03-01 00:00:00'")
    assert(Option(new java.io.File(s"$root/data").list()).get.length === dirsBefore)
    assert(spark.table("graft.hp5.t").select("id").as[Long].collect() === Seq(3L))
    // a MID-month cutoff must take the exact row path, not drop dirs
    spark.sql("DELETE FROM graft.hp5.t WHERE ts < TIMESTAMP_NTZ'2024-03-10 00:00:00'")
    assert(spark.table("graft.hp5.t").count() === 0)
  }

  test("two day-partitioned tables storage-partition-join on ts with zero shuffles (r13)") {
    // date-partitioned facts are THE most common 100 TB lake layout:
    // the scan now reports KeyGroupedPartitioning over the days(ts)
    // transform (resolved through the catalog's FunctionCatalog like
    // bucket), so two day-partitioned tables join partition-for-
    // partition — a.ts = b.ts implies equal day granules, the SPJ
    // alignment invariant
    fresh("hp6")
    for (n <- Seq("a", "b")) {
      spark.sql(s"""CREATE TABLE graft.hp6.$n (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                    TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
      (1 to 90).map(i => (i.toLong, s"$n$i", ts(f"2024-03-${i % 3 + 1}%02dT0${i % 9}:00:00")))
        .toDF("id", "v", "ts").createOrReplaceTempView(s"hp6_src_$n")
      spark.sql(s"INSERT INTO graft.hp6.$n SELECT * FROM hp6_src_$n")
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // join ON the granule source alone: cluster keys fully covered
      val j = spark.sql(
        """SELECT a.id, b.id FROM graft.hp6.a a
           JOIN graft.hp6.b b ON a.ts = b.ts""")
      assert(shuffles(j) === 0,
        s"day-partitioned tables must SPJ:\n${j.queryExecution.executedPlan}")
      // ts repeats with period 9 (i%9 fixes both day and hour):
      // 9 distinct timestamps × 10 rows each side → 9 × 10 × 10
      assert(j.count() === 900L)
      // the production shape — join ON (ts, id): days(ts) covers only
      // part of the join keys, so Spark needs the Iceberg-recommended
      // relaxation to accept partial clustering
      withSQLConf("spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
        val j2 = spark.sql(
          """SELECT a.id, a.v, b.v FROM graft.hp6.a a
             JOIN graft.hp6.b b ON a.ts = b.ts AND a.id = b.id""")
        assert(shuffles(j2) === 0,
          s"partial-clustering SPJ must hold:\n${j2.queryExecution.executedPlan}")
        assert(j2.count() === 90L)
      }
    }
  }

  test("granule rendering matches Spark's cast for extreme years (r14)") {
    // the v2 writer derives granule dirs executor-side via
    // GraftGranule.render; the V1 path derives them with
    // to_date(src).cast("string") / date_format(src, "yyyy-MM").
    // Spark's formatter renders years > 9999 with a '+' prefix
    // (SignStyle.EXCEEDS_PAD) — a %04d render would split one logical
    // partition across two leaf dirs for extreme timestamps.
    import org.apache.spark.sql.functions.{date_format, to_date}
    import org.apache.spark.sql.types.DateType
    val days = Seq(
      java.time.LocalDate.of(0, 1, 3), java.time.LocalDate.of(1, 1, 2),
      java.time.LocalDate.of(999, 12, 31), java.time.LocalDate.of(9999, 12, 31),
      java.time.LocalDate.of(10000, 1, 1), java.time.LocalDate.of(99999, 6, 15))
    val df = days.zipWithIndex.toDF("d", "i")
      .select(col("i"), to_date(col("d")).cast("string").as("day_v1"),
        date_format(col("d"), "yyyy-MM").as("month_v1"))
    df.collect().foreach { r =>
      val d = days(r.getAs[Int]("i"))
      val epochDay = d.toEpochDay.toInt
      assert(GraftGranule.render(DateType, epochDay, monthly = false) === r.getString(1),
        s"day granule diverges from V1 cast at $d")
      assert(GraftGranule.render(DateType, epochDay, monthly = true) === r.getString(2),
        s"month granule diverges from V1 date_format at $d")
    }
  }

  test("source-column DDL refusals and change-feed hiding") {
    fresh("hp4")
    spark.sql("""CREATE TABLE graft.hp4.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    spark.sql("INSERT INTO graft.hp4.t VALUES (1, 'a', TIMESTAMP_NTZ'2024-03-01 10:00:00')")
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE graft.hp4.t RENAME COLUMN ts TO t2"))
    assert(e1.getMessage.contains("hidden partition"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.hp4.t DROP COLUMN ts"))
    assert(e2.getMessage.contains("hidden partition"), e2.getMessage)
    // time travel and the change feed hide the derived column too
    val t = MergeTable.open(spark, "target/graft_warehouse/hp4/t")
    assert(!t.readVersion(1L).columns.contains("ts_day"))
    assert(!t.changesBetween(0L, 1L).columns.contains("ts_day"))
  }
}
