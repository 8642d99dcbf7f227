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

  test("co-partitioned MOR tables storage-partition-join with zero shuffles (r14)") {
    fresh("morb9")
    for (t <- Seq("l", "r")) {
      spark.sql(s"""CREATE TABLE graft.morb9.$t (id BIGINT, day STRING, v BIGINT)
                    TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')
                    PARTITIONED BY (day)""")
      spark.sql(s"""INSERT INTO graft.morb9.$t
        SELECT id, concat('d', id % 4), id * 10 FROM range(0, 120)""")
    }
    // pending deltas on BOTH sides: an update, a tombstone, and a
    // winner landing in a BRAND-NEW partition value (no base dir)
    val l = MergeTable.open(spark, "target/graft_warehouse/morb9/l")
    val r = MergeTable.open(spark, "target/graft_warehouse/morb9/r")
    l.upsert(Seq((5L, "d1", 555L), (900L, "d9", 9000L)).toDF("id", "day", "v"))
    l.delete(Seq(7L).toDF("id"))
    r.upsert(Seq((5L, "d1", 556L), (900L, "d9", 9001L)).toDF("id", "day", "v"))
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val j = spark.sql(
        """SELECT l.id, l.v AS lv, r.v AS rv
          |FROM graft.morb9.l l JOIN graft.morb9.r r
          |ON l.day = r.day AND l.id = r.id""".stripMargin)
      val shuffleCount = j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s }.size
      assert(shuffleCount === 0,
        s"pv-MOR tables must keep the storage-partitioned join:\n${j.queryExecution.executedPlan}")
      val rows = j.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      // 120 common ids - 1 tombstoned + the new id 900 on both sides
      assert(rows.length === 120, s"got ${rows.length}")
      assert(rows.contains((5L, 555L, 556L)), "both sides' delta winners must meet")
      assert(rows.contains((900L, 9000L, 9001L)),
        "winners in a partition with NO base dir must still align")
      assert(!rows.exists(_._1 == 7L), "tombstoned key must not join")
    }
  }

  test("value-partitioned MOR rides keyed splits (winners in their tuple's split)") {
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

  test("hidden-day MOR routes winners by their derived granule (SPJ kept)") {
    fresh("morb10")
    for (t <- Seq("l", "r")) {
      spark.sql(s"""CREATE TABLE graft.morb10.$t (id BIGINT, v BIGINT, ts TIMESTAMP_NTZ)
                    TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')
                    PARTITIONED BY (days(ts))""")
      spark.sql(s"""INSERT INTO graft.morb10.$t
        SELECT id, id * 2, timestamp_ntz'2024-03-01 06:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT))
        FROM range(0, 60)""")
    }
    val l = MergeTable.open(spark, "target/graft_warehouse/morb10/l")
    val r = MergeTable.open(spark, "target/graft_warehouse/morb10/r")
    // winners: one inside an existing day, one in a NEW day
    l.upsert(Seq(
      (4L, 444L, java.time.LocalDateTime.parse("2024-03-02T12:00:00")),
      (700L, 7000L, java.time.LocalDateTime.parse("2024-06-15T01:00:00")))
      .toDF("id", "v", "ts"))
    r.upsert(Seq(
      (700L, 7001L, java.time.LocalDateTime.parse("2024-06-15T23:00:00")))
      .toDF("id", "v", "ts"))
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val j = spark.sql(
        """SELECT l.id, l.v AS lv, r.v AS rv
          |FROM graft.morb10.l l JOIN graft.morb10.r r
          |ON l.ts = r.ts AND l.id = r.id""".stripMargin)
      val shuffleCount = j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s }.size
      assert(shuffleCount === 0,
        s"hidden-day MOR tables must storage-partition-join:\n${j.queryExecution.executedPlan}")
      val rows = j.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      // id 4 moved days on l only → its ts no longer matches r's; the
      // untouched ids still align; 700 exists on both but at different
      // times of the new day → no ts match either
      assert(rows.size === 59, s"got ${rows.size}")
      assert(!rows.exists(_._1 == 4L) && !rows.exists(_._1 == 700L))
    }
    // winner visibility sanity: day-filtered reads see the moved rows
    assert(spark.table("graft.morb10.l")
      .filter($"ts" >= "2024-06-15 00:00:00").select("id").as[Long].collect()
      === Array(700L))
  }

  test("delete-only delta on a hidden-day MOR table still reads (no granule source in delta)") {
    // a delete writes key columns + tombstone only — the delta union
    // carries neither the derived granule nor its source column; the
    // winner-tuple projection must stay resolvable (all rows are
    // tombstones, so the typed-null tuple is never observed)
    fresh("morb11")
    spark.sql("""CREATE TABLE graft.morb11.t (id BIGINT, v BIGINT, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')
                 PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.morb11.t
      SELECT id, id, timestamp_ntz'2024-03-01 06:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT))
      FROM range(0, 30)""")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb11/t")
    t.delete(Seq(3L, 7L).toDF("id"))
    val df = spark.table("graft.morb11.t")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 28L)
    assert(df.filter($"id" === 3L).isEmpty && df.filter($"id" === 8L).count() === 1)
    // day-filter pruning still composes with the tombstone supersede:
    // day 03-01 holds the 15 even ids; both deleted ids (3, 7) are odd
    assert(spark.table("graft.morb11.t")
      .filter($"ts" < "2024-03-02 00:00:00").count() === 15L)
    assert(spark.table("graft.morb11.t")
      .filter($"ts" >= "2024-03-02 00:00:00").count() === 13L)
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

  test("MOR scans stay COLUMNAR: per-batch supersede probe, parity with t.read() (r14)") {
    fresh("morb8")
    spark.sql("""CREATE TABLE graft.morb8.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.morb8.t SELECT id, concat('v', id) FROM range(0, 50)")
    val t = MergeTable.open(spark, "target/graft_warehouse/morb8/t")
    t.upsert(Seq((1L, "u1"), (77L, "n77")).toDF("id", "v"))
    t.delete(Seq(9L).toDF("id"))
    val morRead = spark.table("graft.morb8.t")
    assert(usesBatchScan(morRead), morRead.queryExecution.executedPlan.toString)
    // the r14 columnar supersede probe: delta-bearing snapshots keep
    // vectorized batches (hit-free batches pass through zero-copy)
    assert(morRead.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"a live delta layer must keep the columnar reader:\n${morRead.queryExecution.executedPlan}")
    // full parity with the V1-reconciled table read
    assert(morRead.orderBy("id").as[(Long, String)].collect().toSeq
      === t.read().orderBy("id").as[(Long, String)].collect().toSeq)
    assert(morRead.count() === 50L) // 50 - 1 tombstone + 1 new
    t.compact()
    val cowRead = spark.table("graft.morb8.t")
    assert(usesBatchScan(cowRead), cowRead.queryExecution.executedPlan.toString)
    assert(cowRead.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"a compacted read keeps vectorized batches:\n${cowRead.queryExecution.executedPlan}")
    assert(cowRead.count() === 50L)
    assert(cowRead.orderBy("id").as[(Long, String)].collect().toSeq
      === t.read().orderBy("id").as[(Long, String)].collect().toSeq)
  }
}
