package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame

/** DSv2 Batch reads under an ACTIVE COLUMN MAPPING (r13): renamed
  * tables used to lose vectorized reads, pruning, and SPJ to the V1
  * fallback forever. The scan now reads by PHYSICAL name (identical
  * positions/types — rows line up positionally under the logical
  * output) and translates every filter physical-side, so RENAME
  * COLUMN stays the pure metadata operation it is ON THE READ PATH
  * TOO. The one unsafe mapping shape — a dropped physical name
  * colliding with a live column's physical name — is impossible by
  * construction (re-adds get fresh physical names) and refused
  * anyway.
  */
class ColumnMappingBatchScanSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def usesBatchScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("MergeTableBatchScan")

  test("a renamed table reads through the Batch scan under logical names") {
    fresh("cm1")
    spark.sql("""CREATE TABLE graft.cm1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cm1.t SELECT id, concat('v', id) FROM range(0, 200)")
    spark.sql("ALTER TABLE graft.cm1.t RENAME COLUMN v TO val")
    val df = spark.table("graft.cm1.t")
    assert(df.columns.toSeq === Seq("id", "val"))
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 200L)
    assert(df.filter($"id" === 7L).select("val").as[String].head() === "v7")
    // vectorized batches survive the mapping (the whole point)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"mapped read must stay columnar:\n${df.queryExecution.executedPlan}")
  }

  test("filters on a renamed column push down and PRUNE files (physical translation)") {
    fresh("cm2")
    spark.sql("""CREATE TABLE graft.cm2.t (id BIGINT, n BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    // two commits with disjoint n ranges → two file sets with stats
    spark.sql("INSERT INTO graft.cm2.t SELECT id, id FROM range(0, 50)")
    spark.sql("INSERT INTO graft.cm2.t SELECT id, id FROM range(100, 150)")
    spark.sql("ALTER TABLE graft.cm2.t RENAME COLUMN n TO num")
    val hi = spark.table("graft.cm2.t").filter($"num" >= 100L)
    assert(usesBatchScan(hi), hi.queryExecution.executedPlan.toString)
    assert(hi.count() === 50L)
    // stats pruning actually fired on the translated (physical) filter
    val meta = MergeTable.readMeta("target/graft_warehouse/cm2/t").get
    val rel = new MergeTableRelation(spark.sqlContext,
      "target/graft_warehouse/cm2/t", meta.keys, meta.mode, meta.numBuckets)
    val Some((kept, total)) = rel.survivingFilesBatch(Array(
      rel.toPhysicalFilter(
        org.apache.spark.sql.sources.GreaterThanOrEqual("num", 100L))))
    assert(kept.size < total, s"kept ${kept.size} of $total")
  }

  test("renamed co-bucketed tables keep the storage-partitioned join") {
    fresh("cm3")
    for (n <- Seq("a", "b")) {
      spark.sql(s"""CREATE TABLE graft.cm3.$n (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')""")
      spark.sql(s"INSERT INTO graft.cm3.$n SELECT id, concat('$n', id) " +
        "FROM range(0, 300)")
      // keys cannot rename (DDL rule); mapping a data column still
      // activates the physical-name machinery for the WHOLE scan
      spark.sql(s"ALTER TABLE graft.cm3.$n RENAME COLUMN v TO w")
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT a.id, a.w, b.w FROM graft.cm3.a a
           JOIN graft.cm3.b b ON a.id = b.id""")
      assert(shuffles(j) === 0,
        s"mapped tables must keep SPJ:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 300L)
      assert(j.filter($"id" === 5L).collect().map(r =>
        (r.getString(1), r.getString(2))).toSeq === Seq(("a5", "b5")))
    }
  }

  test("dv snapshots keep the Batch path under a mapping (positional masks, r14)") {
    fresh("cm6")
    spark.sql("""CREATE TABLE graft.cm6.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='deletion-vectors')""")
    spark.sql("INSERT INTO graft.cm6.t SELECT id, concat('v', id) FROM range(0, 100)")
    val t = MergeTable.open(spark, "target/graft_warehouse/cm6/t")
    t.upsert(Seq((5L, "u5")).toDF("id", "v"))
    t.delete(Seq(9L).toDF("id"))
    spark.sql("ALTER TABLE graft.cm6.t RENAME COLUMN v TO val")
    val df = spark.table("graft.cm6.t")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 99L)
    assert(df.filter($"id" === 5L).select("val").as[String].head() === "u5")
    assert(df.filter($"id" === 9L).isEmpty)
    // parity with the resolving table read
    assert(df.orderBy("id").as[(Long, String)].collect().toSeq
      === t.read().orderBy("id").as[(Long, String)].collect().toSeq
        .map { case (i, v) => (i, v) })
  }

  test("MOR snapshots keep the Batch path under a mapping (r14)") {
    fresh("cm7")
    spark.sql("""CREATE TABLE graft.cm7.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.cm7.t SELECT id, concat('v', id) FROM range(0, 100)")
    val t = MergeTable.open(spark, "target/graft_warehouse/cm7/t")
    t.upsert(Seq((3L, "u3"), (500L, "n500")).toDF("id", "v"))
    t.delete(Seq(7L).toDF("id"))
    // the delta layer must look up PHYSICAL names under the mapping
    // (key columns are unrenamable by design — data columns map)
    spark.sql("ALTER TABLE graft.cm7.t RENAME COLUMN v TO val")
    val df = spark.table("graft.cm7.t")
    assert(df.columns.toSeq === Seq("id", "val"))
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 100L) // 100 - 1 tombstone + 1 new
    assert(df.filter($"id" === 3L).select("val").as[String].head() === "u3",
      "delta winner must supersede under the mapping")
    assert(df.filter($"id" === 7L).isEmpty, "tombstone must hold")
    assert(df.filter($"id" === 500L).count() === 1L)
    // projection that drops the renamed key still reconciles
    val vs = spark.table("graft.cm7.t").select("val")
    assert(usesBatchScan(vs), vs.queryExecution.executedPlan.toString)
    val got = vs.as[String].collect().sorted
    assert(got.length === 100 && got.contains("u3") && !got.contains("v3") &&
      !got.contains("v7") && got.contains("n500"))
  }

  test("a renamed INT identity partition column keeps typed partition keys (r14)") {
    // partition dirs stay physical-named; the tuple TYPE must resolve
    // through the mapping — a string-typed tuple under an int-typed
    // reported transform would break KeyGroupedPartitioning grouping
    fresh("cm8")
    for (t <- Seq("l", "r")) {
      spark.sql(s"""CREATE TABLE graft.cm8.$t (id BIGINT, bucket_no INT, v BIGINT)
                    TBLPROPERTIES('keys'='id') PARTITIONED BY (bucket_no)""")
      spark.sql(s"""INSERT INTO graft.cm8.$t
        SELECT id, CAST(id % 4 AS INT), id * 10 FROM range(0, 80)""")
      spark.sql(s"ALTER TABLE graft.cm8.$t RENAME COLUMN bucket_no TO cell")
    }
    val df = spark.table("graft.cm8.l")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 80L)
    assert(df.filter($"cell" === 2).count() === 20L)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT l.id, l.v + r.v AS s FROM graft.cm8.l l
          |JOIN graft.cm8.r r ON l.cell = r.cell AND l.id = r.id""".stripMargin)
      val shuffles = j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s }.size
      assert(shuffles === 0,
        s"renamed int-partitioned tables must keep SPJ:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 80L)
    }
  }

  test("drop-then-readd yields nulls, never the dropped column's stale bytes") {
    fresh("cm4")
    spark.sql("""CREATE TABLE graft.cm4.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cm4.t VALUES (1, 'old1'), (2, 'old2')")
    spark.sql("ALTER TABLE graft.cm4.t DROP COLUMN v")
    spark.sql("ALTER TABLE graft.cm4.t ADD COLUMNS (v STRING)")
    val df = spark.table("graft.cm4.t").orderBy("id")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
      === Seq((1L, true), (2L, true)),
      "re-added column must read null, not the dropped physical bytes")
    // a write carrying the new column serves its values
    spark.sql("INSERT INTO graft.cm4.t VALUES (3, 'new3')")
    assert(spark.table("graft.cm4.t").filter($"id" === 3L)
      .select("v").as[String].head() === "new3")
  }

  test("a renamed SORTED table keeps the no-sort merge join (logical ordering claim)") {
    fresh("cm5")
    for (n <- Seq("a", "b")) {
      spark.sql(s"""CREATE TABLE graft.cm5.$n (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')""")
      spark.sql(s"INSERT INTO graft.cm5.$n SELECT id, concat('$n', id) FROM range(0, 300)")
      spark.sql(s"OPTIMIZE graft.cm5.$n SORT BY (id)")
      spark.sql(s"ALTER TABLE graft.cm5.$n RENAME COLUMN v TO w")
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT a.id, a.w FROM graft.cm5.a a JOIN graft.cm5.b b ON a.id = b.id""")
      val (sh, so) = planCounts(j)
      assert(sh === 0, s"shuffled:\n${j.queryExecution.executedPlan}")
      assert(so === 0,
        s"the sorted-scan claim must survive an active mapping:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 300L)
    }
  }
}
