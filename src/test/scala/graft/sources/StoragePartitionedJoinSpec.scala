package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The DSv2 Batch read path: catalog snapshots serve through
  * MergeTableBatchScan (vectorized parquet, no Row round-trip), two
  * co-bucketed mergetables JOIN WITHOUT A SHUFFLE on either side
  * (KeyGroupedPartitioning + the catalog's `bucket` function —
  * Spark's storage-partitioned join), and runtime filtering prunes
  * bucket partitions at execution time. At 100 TB the fact⋈fact
  * shuffle this path removes is the single largest cost in the join;
  * the spec pins both the plan shape and the results.
  */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  test("the catalog bucket function replays the write side's hash byte-for-byte") {
    // Spark only needs canonicalName for SPJ compatibility, but the
    // one-side-shuffle variants (v2.bucketing.shuffle.enabled) would
    // EVALUATE produceResult — it must match pmod(xxhash64(k), n)
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val n = 16
    val longs = (0 until 200).map(i => (i * 2654435761L) ^ (i.toLong << 13))
    val bLong = GraftBucketBound(Array(IntegerType, LongType))
    val expectL = longs.toDF("id")
      .select(pmod(xxhash64(col("id")), lit(n)).cast("int")).as[Int].collect().toSeq
    val gotL = longs.map(v =>
      bLong.produceResult(new GenericInternalRow(Array[Any](n, v))).toInt)
    assert(gotL === expectL)

    val strs = (0 until 100).map(i => s"key-$i-é中")
    val bStr = GraftBucketBound(Array(IntegerType, StringType))
    val expectS = strs.toDF("k")
      .select(pmod(xxhash64(col("k")), lit(n)).cast("int")).as[Int].collect().toSeq
    val gotS = strs.map(v =>
      bStr.produceResult(new GenericInternalRow(
        Array[Any](n, UTF8String.fromString(v)))).toInt)
    assert(gotS === expectS)
  }

  test("catalog snapshot reads serve through the Batch scan with correct results") {
    fresh("spj0")
    spark.sql("""CREATE TABLE graft.spj0.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.spj0.t VALUES (1,'a'), (2,'b'), (3,'c')")
    val df = spark.table("graft.spj0.t")
    assert(df.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"))
    assert(df.as[(Long, String)].collect().sorted === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // pushed filters stay exact on the batch path (claimed, re-checked)
    val f = spark.sql("SELECT v FROM graft.spj0.t WHERE id >= 2")
    assert(f.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"))
    assert(f.as[String].collect().sorted === Seq("b", "c"))
  }

  test("co-bucketed mergetables join with ZERO shuffles (storage-partitioned join)") {
    fresh("spj1")
    for (t <- Seq("facts", "dims")) {
      spark.sql(s"""CREATE TABLE graft.spj1.$t (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    }
    val n = 500
    (1 to n).map(i => (i.toLong, s"f$i")).toDF("id", "v")
      .createOrReplaceTempView("spj1_f")
    (1 to n).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      .createOrReplaceTempView("spj1_d")
    spark.sql("INSERT INTO graft.spj1.facts SELECT * FROM spj1_f")
    spark.sql("INSERT INTO graft.spj1.dims SELECT * FROM spj1_d")

    // keep AQE/broadcast out of the way: the point is the co-located
    // sort-merge join, the shape a 100 TB fact⋈fact join takes
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT f.id, f.v AS fv, d.v AS dv
          |FROM graft.spj1.facts f JOIN graft.spj1.dims d ON f.id = d.id""".stripMargin)
      assert(shuffles(j) === 0,
        s"expected a shuffle-free storage-partitioned join:\n${j.queryExecution.executedPlan}")
      val rows = j.collect()
      assert(rows.length === n)
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
        (1 to n).map(i => (i.toLong, s"f$i", s"d$i")).toSet)
    }
  }

  test("a bucketed self-aggregation by key needs no shuffle either side of the join") {
    fresh("spj2")
    spark.sql("""CREATE TABLE graft.spj2.e (id BIGINT, amt BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    (1 to 200).map(i => (i.toLong % 50, i.toLong)).toDF("id", "amt")
      .createOrReplaceTempView("spj2_src")
    // bucketed MergeTable keys are unique per id — aggregate across
    // two snapshots of the same table joined on the bucket key
    spark.sql("INSERT INTO graft.spj2.e SELECT id, max(amt) FROM spj2_src GROUP BY id")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT a.id, a.amt + b.amt AS s
          |FROM graft.spj2.e a JOIN graft.spj2.e b ON a.id = b.id""".stripMargin)
      assert(shuffles(j) === 0,
        s"self-join shuffled:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 50)
    }
  }

  test("ADD COLUMNS: the Batch path backfills declared-but-unwritten columns as nulls") {
    fresh("spj8")
    spark.sql("""CREATE TABLE graft.spj8.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.spj8.t VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.spj8.t ADD COLUMNS (score BIGINT)")
    val df = spark.table("graft.spj8.t")
    assert(df.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"),
      "ADD COLUMNS alone must not evict the Batch fast path")
    assert(df.select("id", "score").as[(Long, Option[Long])].collect().toSet ===
      Set((1L, None), (2L, None)))
    // and once data carries the column, old files still read null
    spark.sql("INSERT INTO graft.spj8.t VALUES (3,'c', 30)")
    assert(spark.table("graft.spj8.t").select("id", "score")
      .as[(Long, Option[Long])].collect().toSet ===
      Set((1L, None), (2L, None), (3L, Some(30L))))
  }

  test("identity-partitioned tables join partition-for-partition without a shuffle") {
    fresh("spj4")
    for (t <- Seq("l", "r")) {
      spark.sql(s"""CREATE TABLE graft.spj4.$t (id BIGINT, day STRING, v BIGINT)
                    TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    }
    val rows = (1 to 300).map(i => (i.toLong, s"d${i % 5}", i.toLong))
    rows.toDF("id", "day", "v").createOrReplaceTempView("spj4_src")
    spark.sql("INSERT INTO graft.spj4.l SELECT * FROM spj4_src")
    spark.sql("INSERT INTO graft.spj4.r SELECT * FROM spj4_src")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT l.day, count(*) AS n, sum(l.v + r.v) AS s
          |FROM graft.spj4.l l JOIN graft.spj4.r r ON l.day = r.day
          |GROUP BY l.day""".stripMargin)
      assert(shuffles(j) === 0,
        s"identity-partitioned join shuffled:\n${j.queryExecution.executedPlan}")
      val got = j.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expect = rows.groupBy(_._2).map { case (d, rs) =>
        val n = rs.size.toLong
        (d, n * n, rs.map(_._3).sum * 2 * n)
      }.toSet
      assert(got === expect)
    }
  }

  test("unbucketed scans pack file slices instead of one-task-per-file") {
    fresh("spj5")
    spark.sql("""CREATE TABLE graft.spj5.many (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    // 12 separate commits → 12+ small files; packing must coalesce
    // them into far fewer read tasks than files
    for (b <- 0 until 12)
      spark.sql(s"INSERT INTO graft.spj5.many VALUES ($b, 'v$b')")
    val df = spark.table("graft.spj5.many")
    assert(df.count() === 12)
    assert(df.rdd.getNumPartitions < 12,
      s"expected packed read tasks, got ${df.rdd.getNumPartitions}")
  }

  test("gate audit: catalog gates ride the Batch path; the SPJ gate join never shuffles") {
    // regression pin against silent eviction of the fast path — a
    // batchReadable change that quietly re-routed catalog reads to the
    // V1 fallback would keep results green and lose the plan
    val upsert = graft.SparkEntry.queries("cdc_apply_upsert_catalog")(spark, sfDir)
    assert(upsert.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"))
    val spj = graft.SparkEntry.queries("catalog_spj_join")(spark, sfDir)
    assert(spj.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"))
    // r11 gates: the clustered-CTAS read-back and the dv masked read
    // must also ride the Batch path (the dv gate is the one the
    // batchReadableDv gate exists for)
    val ctas = graft.SparkEntry.queries("catalog_ctas_clustered")(spark, sfDir)
    assert(ctas.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"))
    val dv = graft.SparkEntry.queries("catalog_dv_batch_read")(spark, sfDir)
    assert(dv.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"),
      s"the dv gate fell back to V1:\n${dv.queryExecution.executedPlan}")
    // broadcast (small side) or storage-partitioned (aligned buckets):
    // either way the JOIN adds no shuffle — only ORDER BY's range
    // exchange may appear
    assert(shuffles(spj) <= 1,
      s"the SPJ gate join shuffled:\n${spj.queryExecution.executedPlan}")
    graft.Caches.clear()
  }

  test("mismatched bucket counts fall back to a shuffle with correct results") {
    fresh("spj9")
    spark.sql("""CREATE TABLE graft.spj9.a (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    spark.sql("""CREATE TABLE graft.spj9.b (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='8')""")
    (1 to 100).map(i => (i.toLong, s"x$i")).toDF("id", "v")
      .createOrReplaceTempView("spj9_src")
    spark.sql("INSERT INTO graft.spj9.a SELECT * FROM spj9_src")
    spark.sql("INSERT INTO graft.spj9.b SELECT * FROM spj9_src")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // 4 vs 8 buckets are NOT co-partitioned: the planner must insert
      // the shuffle (never silently mis-align) and values stay right
      val j = spark.sql(
        """SELECT count(*) AS n FROM graft.spj9.a a
          |JOIN graft.spj9.b b ON a.id = b.id""".stripMargin)
      assert(j.head().getLong(0) === 100L)
      assert(shuffles(j) > 0, "incompatible bucket layouts must shuffle")
    }
  }

  test("a dim filter dynamically prunes the fact's partition dirs at runtime") {
    fresh("spj6")
    spark.sql("""CREATE TABLE graft.spj6.fact (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    (1 to 1000).map(i => (i.toLong, s"d${i % 10}", i.toLong))
      .toDF("id", "day", "v").createOrReplaceTempView("spj6_src")
    spark.sql("INSERT INTO graft.spj6.fact SELECT * FROM spj6_src")
    // the dim must be FILE-backed with a filter that survives
    // optimization (a local relation constant-folds the predicate
    // away and the planner sees nothing selective to prune with)
    spark.sql("""CREATE TABLE graft.spj6.dim (day STRING, tag STRING)
                 TBLPROPERTIES('keys'='day')""")
    spark.sql("INSERT INTO graft.spj6.dim VALUES ('d3','x'), ('d4','y')")

    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val j = spark.sql(
        """SELECT count(*) AS n FROM graft.spj6.fact f
          |JOIN graft.spj6.dim d ON f.day = d.day WHERE d.tag = 'x'""".stripMargin)
      assert(j.head().getLong(0) === 100L)
      Thread.sleep(500) // listener bus drains asynchronously
      // runtime filtering must keep 9 of 10 partition dirs unread:
      // 100 matching fact rows (+ the broadcast dim row), not 1000
      assert(recordsRead < 200L,
        s"expected the runtime filter to prune fact partitions, read $recordsRead rows")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a dim join on the bucket key runtime-prunes to the touched buckets") {
    fresh("spj7")
    spark.sql("""CREATE TABLE graft.spj7.fact (id BIGINT, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='16')""")
    (1 to 2000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .createOrReplaceTempView("spj7_src")
    spark.sql("INSERT INTO graft.spj7.fact SELECT * FROM spj7_src")
    spark.sql("""CREATE TABLE graft.spj7.dim (id BIGINT, tag STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.spj7.dim VALUES (7,'x'), (8,'x'), (9,'y')")

    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val j = spark.sql(
        """SELECT sum(f.v) AS s FROM graft.spj7.fact f
          |JOIN graft.spj7.dim d ON f.id = d.id WHERE d.tag = 'x'""".stripMargin)
      assert(j.head().getLong(0) === 15L)
      Thread.sleep(500) // listener bus drains asynchronously
      // the In(id, [7,8]) runtime filter hashes to at most 2 of 16
      // buckets — far fewer than the 2000 fact rows
      assert(recordsRead < 500L,
        s"expected runtime bucket pruning, read $recordsRead rows")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("runtime point filters prune bucket partitions (DSv2 dynamic pruning)") {
    fresh("spj3")
    spark.sql("""CREATE TABLE graft.spj3.b (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='8')""")
    (1 to 64).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("spj3_src")
    spark.sql("INSERT INTO graft.spj3.b SELECT * FROM spj3_src")
    // a static point lookup plans only the key's bucket partition
    val one = spark.sql("SELECT v FROM graft.spj3.b WHERE id = 7")
    assert(one.as[String].collect() === Seq("v7"))
    assert(one.rdd.getNumPartitions <= 1,
      "a full-key point lookup must plan at most its own bucket")
  }

  test("partially-clustered SPJ: a skewed co-bucketed join stays shuffle-free and exact") {
    // spark.sql.sources.v2.bucketing.partiallyClusteredDistribution:
    // the skew answer for storage-partitioned joins — the larger
    // side's hot partitions keep their input splits (they are NOT
    // fully clustered into one task) while the smaller side's
    // matching partitions replicate to each split. A hot key at
    // 100 TB would otherwise turn the SPJ's one-task-per-bucket
    // alignment into a straggler.
    fresh("spj11")
    for (t <- Seq("facts", "dims")) {
      spark.sql(s"""CREATE TABLE graft.spj11.$t (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    }
    // facts: id 1 is hot (3000 rows via distinct synthetic keys it
    // joins through), dims small and uniform
    (1 to 4000).map(i => ((i % 40).toLong, s"f$i")).toDF("id", "v")
      .createOrReplaceTempView("spj11_f")
    (0 to 39).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      .createOrReplaceTempView("spj11_d")
    spark.sql("INSERT INTO graft.spj11.facts SELECT id, max(v) FROM spj11_f GROUP BY id")
    spark.sql("INSERT INTO graft.spj11.dims SELECT * FROM spj11_d")
    withSQLConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true") {
      val j = spark.sql(
        """SELECT f.id, f.v AS fv, d.v AS dv
          |FROM graft.spj11.facts f JOIN graft.spj11.dims d ON f.id = d.id""".stripMargin)
      assert(shuffles(j) === 0,
        s"partially-clustered SPJ must stay shuffle-free:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 40L)
      assert(j.filter("id = 1").count() === 1L)
    }
  }

  test("one-side storage-partitioned shuffle: only the unbucketed side moves") {
    // spark.sql.sources.v2.bucketing.shuffle.enabled: joining a
    // bucketed mergetable with an arbitrary frame shuffles ONLY the
    // frame — by EVALUATING the catalog bucket function
    // (GraftBucketBound.produceResult) as the shuffle hash, which is
    // why produceResult replays the write-side xxhash64 byte-for-byte
    // (a mismatch would silently drop join rows, not slow them).
    fresh("spj10")
    spark.sql("""CREATE TABLE graft.spj10.b (id BIGINT, v STRING)
                  TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    (1 to 400).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .createOrReplaceTempView("spj10_src")
    spark.sql("INSERT INTO graft.spj10.b SELECT * FROM spj10_src")
    (1 to 400).map(i => (i.toLong, i * 10L)).toDF("id", "amt")
      .createOrReplaceTempView("spj10_other")
    withSQLConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val j = spark.sql(
        """SELECT b.id, b.v, o.amt FROM graft.spj10.b b
          |JOIN spj10_other o ON b.id = o.id""".stripMargin)
      val rows = j.collect()
      assert(rows.length === 400)
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
        (1 to 400).map(i => (i.toLong, s"b$i", i * 10L)).toSet,
        "a bucket-hash mismatch would drop rows here")
      assert(shuffles(j) <= 1,
        s"only the unbucketed side may shuffle:\n${j.queryExecution.executedPlan}")
    }
  }
}
