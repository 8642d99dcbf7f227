package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** DSv2 Batch reads over DELETION-VECTOR snapshots: the mask is
  * applied positionally above the raw vectorized read (each file's
  * sorted masked row indexes ship inside its own input partition), so
  * the hottest CDC tables — the ones living in dv between
  * compactions — keep the Batch path's file pruning, bucket-keyed
  * partitioning (SPJ), and runtime filtering instead of losing them
  * to the V1 fallback. Oversized masks and MOR deltas still refuse.
  */
class DvBatchScanSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def usesBatchScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("MergeTableBatchScan")

  test("a dv snapshot reads through the Batch scan with the mask applied") {
    fresh("dvb1")
    spark.sql("""CREATE TABLE graft.dvb1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='deletion-vectors')""")
    spark.sql("INSERT INTO graft.dvb1.t SELECT id, concat('v', id) " +
      "FROM range(0, 200)")
    // dv upsert masks the old versions of 10 keys; dv delete masks 5
    val t = MergeTable.open(spark, "target/graft_warehouse/dvb1/t")
    t.upsert((0L until 10L).map(i => (i, s"u$i")).toDF("id", "v"))
    t.delete(Seq(100L, 101L, 102L, 103L, 104L).toDF("id"))

    val df = spark.table("graft.dvb1.t")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 195L)
    assert(df.filter($"id" === 3L).as[(Long, String)].collect()
      === Array((3L, "u3")), "masked pre-image must not resurface")
    assert(df.filter($"id" === 102L).isEmpty, "dv-deleted row must stay deleted")
    assert(df.filter($"id" === 150L).as[(Long, String)].collect()
      === Array((150L, "v150")))
    // parity with the table API read (the V1-reconciled truth)
    assert(df.orderBy("id").as[(Long, String)].collect().toSeq
      === t.read().orderBy("id").as[(Long, String)].collect().toSeq)
  }

  test("co-bucketed dv tables still storage-partition-join with zero shuffles") {
    fresh("dvb2")
    for (n <- Seq("a", "b")) {
      spark.sql(s"""CREATE TABLE graft.dvb2.$n (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4',
                                  'mode'='deletion-vectors')""")
      spark.sql(s"INSERT INTO graft.dvb2.$n SELECT id, concat('$n', id) " +
        "FROM range(0, 300)")
      // push both tables into dv state
      MergeTable.open(spark, s"target/graft_warehouse/dvb2/$n")
        .delete((290L until 300L).toDF("id"))
    }
    val prior = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold"),
      "spark.sql.requireAllClusterKeysForCoPartition" -> spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition"))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val j = spark.sql(
        """SELECT a.id, a.v, b.v FROM graft.dvb2.a a
           JOIN graft.dvb2.b b ON a.id = b.id""")
      assert(shuffles(j) === 0,
        s"dv snapshots must keep SPJ:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 290L)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime (DPP) bucket pruning composes with the mask on a dv fact") {
    // a dim filter prunes the dv fact's bucket partitions at RUNTIME,
    // and the surviving buckets' masks still apply — the two tiers
    // must compose, not race
    fresh("dvb6")
    spark.sql("""CREATE TABLE graft.dvb6.f (id BIGINT, amt BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='8',
                               'mode'='deletion-vectors')""")
    spark.sql("INSERT INTO graft.dvb6.f SELECT id, id * 3 FROM range(0, 800)")
    MergeTable.open(spark, "target/graft_warehouse/dvb6/f")
      .delete(Seq(5L, 6L).toDF("id"))
    (0L until 10L).map(i => (i, s"d$i")).toDF("id", "v")
      .createOrReplaceTempView("dvb6_dim")
    val j = spark.sql(
      """SELECT f.id, f.amt, d.v FROM graft.dvb6.f f
        |JOIN dvb6_dim d ON f.id = d.id""".stripMargin)
    assert(usesBatchScan(j), j.queryExecution.executedPlan.toString)
    val rows = j.collect().map(r => r.getLong(0)).sorted
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 9L),
      "masked rows must stay deleted under runtime-filtered reads")
  }

  test("an oversized mask refuses the Batch path (V1 keeps serving)") {
    fresh("dvb3")
    spark.sql("""CREATE TABLE graft.dvb3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='deletion-vectors')""")
    spark.sql("INSERT INTO graft.dvb3.t SELECT id, concat('v', id) FROM range(0, 100)")
    MergeTable.open(spark, "target/graft_warehouse/dvb3/t")
      .delete((0L until 50L).toDF("id"))
    val prior = spark.conf.getOption("graft.mergetable.broadcastKeyLimit")
    try {
      spark.conf.set("graft.mergetable.broadcastKeyLimit", "10")
      val df = spark.table("graft.dvb3.t")
      assert(!usesBatchScan(df),
        "a mask past the broadcast limit must not be collected to the driver")
      assert(df.count() === 50L)
    } finally prior match {
      case Some(v) => spark.conf.set("graft.mergetable.broadcastKeyLimit", v)
      case None => spark.conf.unset("graft.mergetable.broadcastKeyLimit")
    }
  }

  test("MOR deltas ride the Batch path too (r13) — reconciled above the raw scan") {
    fresh("dvb4")
    spark.sql("""CREATE TABLE graft.dvb4.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.dvb4.t VALUES (1, 'a')")
    MergeTable.open(spark, "target/graft_warehouse/dvb4/t")
      .upsert(Seq((1L, "b"), (2L, "c")).toDF("id", "v"))
    val df = spark.table("graft.dvb4.t")
    assert(usesBatchScan(df), df.queryExecution.executedPlan.toString)
    assert(df.count() === 2L)
    assert(df.filter($"id" === 1L).as[(Long, String)].head() === ((1L, "b")))
  }

  test("stats pruning composes with the mask (pruned file's positions never matter)") {
    // two append commits give two files with disjoint id ranges; an id
    // filter prunes the first file entirely, and the masked positions
    // of a pruned file simply never surface — dropping whole files
    // under a mask is safe because a mask only ever REMOVES rows
    fresh("dvb5")
    spark.sql("""CREATE TABLE graft.dvb5.t (id BIGINT, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'mode'='deletion-vectors')""")
    spark.sql("INSERT INTO graft.dvb5.t SELECT id, id * 10 FROM range(0, 50)")
    spark.sql("INSERT INTO graft.dvb5.t SELECT id, id * 10 FROM range(100, 150)")
    MergeTable.open(spark, "target/graft_warehouse/dvb5/t")
      .delete(Seq(2L, 4L).toDF("id")) // masks touch ONLY the [0,50) commit

    val all = spark.table("graft.dvb5.t")
    assert(usesBatchScan(all), all.queryExecution.executedPlan.toString)
    assert(all.count() === 98L)
    // a masked survivor forces row mode (Spark refuses mixed scans)
    assert(!all.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a surviving mask must force the row-mode reader")
    // the filter prunes the [0,50) file; its masked 2 and 4 never
    // matter — and with no SURVIVING mask the scan regains full
    // vectorized batches
    val hi = spark.table("graft.dvb5.t").filter($"id" >= 100L)
    assert(hi.count() === 50L)
    assert(hi.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"a pruned-clean dv read must stay columnar:\n${hi.queryExecution.executedPlan}")
    val rel = new MergeTableRelation(spark.sqlContext,
      "target/graft_warehouse/dvb5/t", Seq("id"),
      MergeTable.DeletionVectors, None, None, None, Nil)
    val Some((keptFiles, total)) = rel.survivingFilesBatch(
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 100L)))
    assert(keptFiles.size < total,
      s"the id filter must prune the low commit's files even under a mask")
    assert(keptFiles.size * 2 === total,
      "exactly the [0,50) commit's files must drop")
  }
}
