package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame

/** DSv2 Batch reads over MOR (delta-bearing) snapshots — the last
  * fallback class closed: between compactions the hottest CDC tables
  * are MOR, and they now keep the Batch path's vectorized base scan,
  * file pruning, bucket-keyed partitioning (SPJ), and runtime
  * filtering. The delta layer is reconciled ABOVE the raw scan, the
  * keyed twin of the r11 dv design: the reconciled latest-per-key
  * delta rows and their exact key set broadcast (size-gated on delta
  * footer stats), base rows whose key any delta mentions drop
  * executor-side, winners ride their bucket's keyed partition.
  * Oversized delta layers refuse back to the V1 reconciling read.
  */
class MorBatchScanSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def usesBatchScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("MergeTableBatchScan")

  test("a MOR snapshot reads through the Batch scan, latest-by-key wins") {
    fresh("morb1")
    spark.sql("""CREATE TABLE graft.morb1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb1.t SELECT id, concat('v', id) " +
      "FROM range(0, 200)")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb1/t")
    // two delta commits: the SECOND wins for overlapping keys, a
    // brand-new key inserts, and a tombstone deletes
    t.upsert((0L until 10L).map(i => (i, s"u$i")).toDF("id", "v"))
    t.upsert(Seq((3L, "w3"), (500L, "w500")).toDF("id", "v"))
    t.delete(Seq(100L, 101L).toDF("id"))

    val df = spark.table("graft.morb1.t")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 199L) // 200 - 2 deleted + 1 new
    assert(df.filter($"id" === 3L).as[(Long, String)].collect()
      === Array((3L, "w3")), "the LATEST delta must win")
    assert(df.filter($"id" === 5L).as[(Long, String)].collect()
      === Array((5L, "u5")), "earlier delta still supersedes base")
    assert(df.filter($"id" === 100L).isEmpty, "tombstoned key must stay deleted")
    assert(df.filter($"id" === 500L).as[(Long, String)].collect()
      === Array((500L, "w500")), "delta-only key must surface")
    assert(df.filter($"id" === 150L).as[(Long, String)].collect()
      === Array((150L, "v150")), "untouched base row must survive")
    // full parity with the table API read (the V1-reconciled truth)
    assert(df.orderBy("id").as[(Long, String)].collect().toSeq
      === t.read().orderBy("id").as[(Long, String)].collect().toSeq)
  }

  test("co-bucketed MOR tables storage-partition-join with zero shuffles") {
    fresh("morb2")
    for (n <- Seq("a", "b")) {
      spark.sql(s"""CREATE TABLE graft.morb2.$n (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4',
                                  'mode'='merge-on-read')""")
      spark.sql(s"INSERT INTO graft.morb2.$n SELECT id, concat('$n', id) " +
        "FROM range(0, 300)")
      // push both tables into MOR state: an upsert delta + a tombstone
      val t = MergeTable.open(spark, s"target/graft_warehouse/morb2/$n")
      t.upsert((0L until 5L).map(i => (i, s"$n-up$i")).toDF("id", "v"))
      t.delete((290L until 300L).toDF("id"))
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT a.id, a.v, b.v FROM graft.morb2.a a
           JOIN graft.morb2.b b ON a.id = b.id""")
      assert(shuffles(j) === 0,
        s"MOR snapshots must keep SPJ:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 290L)
      // the upserted rows joined FROM THEIR BUCKET partitions — both
      // sides' winners must have landed in aligned partitions
      assert(j.filter($"id" === 2L).collect().map(r =>
        (r.getString(1), r.getString(2))).toSeq === Seq(("a-up2", "b-up2")))
    }
  }

  test("an oversized delta layer refuses the Batch path (V1 keeps serving)") {
    fresh("morb3")
    spark.sql("""CREATE TABLE graft.morb3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb3.t SELECT id, concat('v', id) FROM range(0, 100)")
    MergeTable.open(spark, "target/graft_warehouse/morb3/t")
      .upsert((0L until 50L).map(i => (i, s"u$i")).toDF("id", "v"))
    withSQLConf("graft.mergetable.broadcastKeyLimit" -> "10") {
      val df = spark.table("graft.morb3.t")
      assert(!usesBatchScan(df),
        "a delta layer past the broadcast limit must not be collected")
      assert(df.count() === 100L)
      assert(df.filter($"id" === 7L).as[(Long, String)].head() === ((7L, "u7")))
    }
  }

  test("stats pruning composes with reconciliation (pruned base files stay safe)") {
    // two base commits with disjoint id ranges, then a delta touching
    // only the low range: an id filter prunes the low files entirely —
    // safe because every dropped row is either superseded (its winner
    // rides along and is filtered by the engine) or filtered anyway
    fresh("morb4")
    spark.sql("""CREATE TABLE graft.morb4.t (id BIGINT, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb4.t SELECT id, id * 10 FROM range(0, 50)")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb4/t")
    t.compact() // both ranges in ONE base layer, second commit as delta
    spark.sql("INSERT INTO graft.morb4.t SELECT id, id * 10 FROM range(100, 150)")
    t.upsert(Seq((2L, 222L)).toDF("id", "v"))

    val hi = spark.table("graft.morb4.t").filter($"id" >= 100L)
    assert(usesBatchScan(hi), hi.queryExecution.executedPlan.toString)
    assert(hi.count() === 50L)
    val lo = spark.table("graft.morb4.t").filter($"id" === 2L)
    assert(lo.as[(Long, Long)].collect() === Array((2L, 222L)))
  }

  test("value-partitioned MOR serves through the Batch scan (packed, no SPJ claim)") {
    fresh("morb5")
    spark.sql("""CREATE TABLE graft.morb5.t (id BIGINT, region STRING, amt BIGINT)
                 PARTITIONED BY (region)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("""INSERT INTO graft.morb5.t VALUES
      (1, 'eu', 10), (2, 'eu', 20), (3, 'us', 30), (4, 'us', 40)""")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb5/t")
    // a key MOVES partition via delta, and a new partition value arrives
    t.upsert(Seq((2L, "us", 21L), (9L, "ap", 90L)).toDF("id", "region", "amt"))

    val df = spark.table("graft.morb5.t")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 5L)
    // the moved key answers its NEW partition only — a partition
    // filter on the old home must not resurrect the base row
    assert(spark.table("graft.morb5.t").filter($"region" === "eu")
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L))
    assert(spark.table("graft.morb5.t").filter($"region" === "us")
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L, 4L))
    assert(spark.table("graft.morb5.t").filter($"region" === "ap")
      .select("id", "amt").as[(Long, Long)].collect().toSeq === Seq((9L, 90L)))
  }

  test("schema evolution: a delta-added column null-fills base rows on the Batch path") {
    fresh("morb6")
    spark.sql("""CREATE TABLE graft.morb6.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb6.t VALUES (1, 'a'), (2, 'b')")
    MergeTable.open(spark, "target/graft_warehouse/morb6/t")
      .upsert(Seq((2L, "b2", 99L)).toDF("id", "v", "extra"))
    val df = spark.table("graft.morb6.t").orderBy("id")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      === Seq((1L, "a", -1L), (2L, "b2", 99L)))
  }

  test("projection that drops the key columns still reconciles (keys ride along)") {
    fresh("morb7")
    spark.sql("""CREATE TABLE graft.morb7.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb7.t SELECT id, concat('v', id) FROM range(0, 20)")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb7/t")
    t.upsert(Seq((3L, "u3")).toDF("id", "v"))
    t.delete(Seq(7L).toDF("id"))
    val vs = spark.table("graft.morb7.t").select("v")
    assert(usesBatchScan(vs), vs.queryExecution.executedPlan.toString)
    val got = vs.as[String].collect().sorted.toSeq
    assert(got.size === 19)
    assert(got.contains("u3") && !got.contains("v3") && !got.contains("v7"))
    // count(*) goes through the same reconcile (agg pushdown refuses MOR)
    assert(spark.table("graft.morb7.t").count() === 19L)
  }

  test("compaction clears the delta layer and restores columnar batches") {
    fresh("morb8")
    spark.sql("""CREATE TABLE graft.morb8.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb8.t SELECT id, concat('v', id) FROM range(0, 50)")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb8/t")
    t.upsert(Seq((1L, "u1")).toDF("id", "v"))
    val morRead = spark.table("graft.morb8.t")
    assert(usesBatchScan(morRead), morRead.queryExecution.executedPlan.toString)
    assert(!morRead.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a live delta layer must force the row-mode reader")
    t.compact()
    val cowRead = spark.table("graft.morb8.t")
    assert(usesBatchScan(cowRead), cowRead.queryExecution.executedPlan.toString)
    assert(cowRead.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"a compacted read must regain vectorized batches:\n${cowRead.queryExecution.executedPlan}")
    assert(cowRead.count() === 50L)
  }
}
