package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

class MergeTableSourceSpec extends SparkSpec {
  import spark.implicits._

  test("spark.read.format(mergetable) reads a snapshot with pruning and pushdown") {
    val root = "target/test_tmp/source_read"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((1L to 100L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "v", "score")))
    t.upsert(Seq((5L, "V5", 0.0)).toDF("id", "v", "score"))

    val df = spark.read.format("mergetable").option("path", root).load()
    assert(df.columns.toSeq === Seq("id", "v", "score"))
    assert(df.count() === 100)

    val filtered = df.filter($"id" <= 10).select("id", "v")
    val rows = filtered.as[(Long, String)].collect().toMap
    assert(rows.size === 10 && rows(5L) === "V5" && rows(6L) === "v6")
  }

  test("source reads a merge-on-read table with delta reconciliation") {
    val root = "target/test_tmp/source_mor"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
    t.upsert(Seq((2L, "B")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))

    // the table self-describes: keys AND mode resolve from _META.json,
    // so a bare path reads with full MOR reconciliation
    val df0 = spark.read.format("mergetable").option("path", root).load()
    assert(df0.as[(Long, String)].collect().toSeq === Seq((2L, "B")))
    val df = spark.read.format("mergetable")
      .option("path", root).option("mode", MergeTable.MergeOnRead)
      .option("keys", "id").load()
    assert(df.as[(Long, String)].collect().toSeq === Seq((2L, "B")))
    // without _META (legacy/bare table) MOR still refuses to guess keys
    val metaBackup = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/_META.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/_META.json"))
    try {
      val noKeys = intercept[IllegalArgumentException] {
        spark.read.format("mergetable")
          .option("path", root).option("mode", MergeTable.MergeOnRead).load()
      }
      assert(noKeys.getMessage.contains("keys"))
    } finally java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_META.json"), metaBackup)
  }

  test("versionAsOf option reads an earlier snapshot") {
    val root = "target/test_tmp/source_tt"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "v1")).toDF("id", "v"))) // version 1
    t.upsert(Seq((1L, "v2")).toDF("id", "v")) // version 2
    val old = spark.read.format("mergetable")
      .option("path", root).option("versionAsOf", "1").load()
    assert(old.as[(Long, String)].collect() === Seq((1L, "v1")))
    val now = spark.read.format("mergetable").option("path", root).load()
    assert(now.as[(Long, String)].collect() === Seq((1L, "v2")))
  }

  test("timestampAsOf option resolves to the latest commit at or before t") {
    val root = "target/test_tmp/source_ts_tt"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "v1")).toDF("id", "v"))) // version 1
    Thread.sleep(50) // manifest mtimes are millisecond-granular
    val between = System.currentTimeMillis()
    Thread.sleep(50)
    t.upsert(Seq((1L, "v2")).toDF("id", "v")) // version 2
    val old = spark.read.format("mergetable")
      .option("path", root).option("timestampAsOf", between.toString).load()
    assert(old.as[(Long, String)].collect() === Seq((1L, "v1")))
    val now = spark.read.format("mergetable")
      .option("path", root)
      .option("timestampAsOf", System.currentTimeMillis().toString).load()
    assert(now.as[(Long, String)].collect() === Seq((1L, "v2")))
    // a timestamp before the first commit is an explicit error
    val err = intercept[IllegalArgumentException] {
      spark.read.format("mergetable")
        .option("path", root).option("timestampAsOf", "1000").load()
    }
    assert(err.getMessage.contains("no commit"), err.getMessage)
    // ISO datetime form parses too (far future → latest snapshot)
    val iso = spark.read.format("mergetable")
      .option("path", root).option("timestampAsOf", "2099-01-01 00:00:00").load()
    assert(iso.as[(Long, String)].collect() === Seq((1L, "v2")))
  }

  test("missing path option fails with a clear message") {
    val err = intercept[Exception] {
      spark.read.format("mergetable").load()
    }
    assert(err.getMessage.contains("path"))
  }

  test("no _META.json and no keys option fails instead of guessing a key") {
    val root = "target/test_tmp/source_nokeys"
    MergeTable.drop(root)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val err = intercept[IllegalArgumentException] {
      spark.read.format("mergetable").option("path", root).load()
    }
    assert(err.getMessage.contains("keys"))
  }

  test("relation reports real snapshot size and small tables auto-broadcast") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val root = "target/test_tmp/source_size"
    MergeTable.drop(root)
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")))
    val dim = spark.read.format("mergetable").option("path", root).load()
    val rel = dim.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation
    }.collectFirst { case r: MergeTableRelation => r }.get
    // kilobytes of parquet, not the "assume unjoinably huge" default
    assert(rel.sizeInBytes > 0L && rel.sizeInBytes < 10L * 1024 * 1024,
      s"sizeInBytes=${rel.sizeInBytes}")
    // size-based broadcast with NO hint: the dim side must broadcast
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = spark.range(10000).toDF("id")
      val joined = fact.join(dim, "id")
      val bhj = joined.queryExecution.executedPlan.collect {
        case j: BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, joined.queryExecution.executedPlan.toString)
      assert(joined.count() === 50)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("readChangeFeed option serves the batch CDF between versions") {
    val root = "target/test_tmp/source_cdf"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))
    def cdf(opts: (String, String)*) = {
      val r = spark.read.format("mergetable").option("path", root)
        .option("readChangeFeed", "true")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
    }
    // full replay from the empty table: final rows as I/U/D outcomes
    val full = cdf().as[(Long, String, String)].collect().sorted
    assert(full === Seq((1L, "a", "D"), (2L, "B", "U"), (3L, "c", "I")))
    // bounded window: only the upsert commit's changes
    val win = cdf("startingVersion" -> "1", "endingVersion" -> "2")
      .as[(Long, String, String)].collect().sorted
    assert(win === Seq((2L, "B", "U"), (3L, "c", "I")))
    // pre-images explode updates into U_pre/U_post pairs
    val pre = cdf("startingVersion" -> "1", "endingVersion" -> "2",
      "updatePreImages" -> "true").as[(Long, String, String)].collect().sorted
    assert(pre === Seq((2L, "B", "U_post"), (2L, "b", "U_pre"), (3L, "c", "I")))
  }

  test("readChangeFeed timestamp bounds resolve against the commit log") {
    val root = "target/test_tmp/source_cdf_ts"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    Thread.sleep(5) // distinct manifest mtimes for the boundary asserts
    t.upsert(Seq((2L, "b")).toDF("id", "v"))
    // commit times from the log (manifest mtimes), formatted UTC —
    // the same clock timestampAsOf resolves against
    val times = t.history().map { case (v, ms, _, _, _) => v -> ms }.toMap
    def fmt(ms: Long): String = {
      val f = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f.format(new java.util.Date(ms))
    }
    def feedFrom(ts: String): Seq[(Long, String, String)] =
      spark.read.format("mergetable").option("path", root)
        .option("readChangeFeed", "true")
        .option("startingTimestamp", ts).load()
        .as[(Long, String, String)].collect().sorted.toSeq
    // Delta parity: a commit landing EXACTLY at the bound is in the
    // feed — starting at v2's commit time includes v2
    assert(feedFrom(fmt(times(2L))) === Seq((2L, "b", "I")))
    // strictly after v1, the first at-or-after commit is v2
    assert(feedFrom(fmt(times(1L) + 1)) === Seq((2L, "b", "I")))
    // at v1's commit time, v1 itself is included -> full replay
    assert(feedFrom(fmt(times(1L))) ===
      Seq((1L, "a", "I"), (2L, "b", "I")))
    // pre-history startingTimestamp degrades to full replay from 0
    assert(feedFrom("1970-01-01 00:00:00") ===
      Seq((1L, "a", "I"), (2L, "b", "I")))
    // post-history: every commit predates the bound -> empty feed
    assert(feedFrom(fmt(times(2L) + 60000)) === Seq.empty)
  }

  test("point lookups on a bucketed table open only the key's bucket dir") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val root = "target/test_tmp/source_bucket_prune"
    MergeTable.drop(root)
    val n = 8
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")),
      numBuckets = Some(n))
    val rel = new MergeTableRelation(spark.sqlContext, root, Seq("id"),
      MergeTable.CopyOnWrite, Some(n))
    val all = rel.candidateFiles(Array.empty).get
    assert(all.size >= n, s"expected >= $n files, got ${all.size}")
    // the write side's bucket for id=17, replayed with the same expr
    val b17 = Seq(17L).toDF("id")
      .select(pmod(xxhash64(col("id")), lit(n)))
      .head().getLong(0)
    val kept = rel.candidateFiles(Array(EqualTo("id", 17L))).get
    assert(kept.nonEmpty && kept.forall(_.contains(s"_graft_bucket=$b17")),
      s"point lookup kept files outside bucket $b17: $kept")
    // IN-list: at most one bucket per value
    val keptIn = rel.candidateFiles(Array(In("id", Array(3L, 200L)))).get
    val bucketsIn = keptIn.flatMap("_graft_bucket=(\\d+)".r.findFirstMatchIn(_)
      .map(_.group(1).toLong)).toSet
    assert(bucketsIn.size <= 2 && keptIn.size < all.size)
    // a range filter must not bucket-prune
    assert(rel.candidateFiles(Array(GreaterThan("id", -1L))).get.size === all.size)
    // and the pruned read still answers correctly
    val df = spark.read.format("mergetable").option("path", root).load()
    assert(df.filter(col("id") === 17L).select("v").as[String].collect()
      .toSeq === Seq("v17"))
    assert(df.filter(col("id").isin(3L, 200L)).count() === 2L)
  }

  test("catalog-created empty table reads as an empty frame through format()") {
    val root = "target/test_tmp/source_declared"
    MergeTable.drop(root)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING")
    // what CREATE TABLE records before any insert: meta with schema only
    MergeTable.writeMeta(root,
      MergeTable.Meta(Seq("k"), MergeTable.CopyOnWrite, None, Some(schema.json)))
    val df = spark.read.format("mergetable").option("path", root).load()
    assert(df.schema === schema)
    assert(df.count() === 0)
  }
}
