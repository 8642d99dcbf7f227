package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

/** `ANALYZE TABLE … COMPUTE STATISTICS` → per-column NDV/null/length
  * statistics persisted beside the file stats and served through the
  * DSv2 scan's `columnStats()`, where CBO (`spark.sql.cbo.enabled`)
  * join reordering and selectivity estimation read them as
  * `attributeStats`.
  */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  test("ANALYZE computes ndv, exact null counts, and lengths in one job") {
    MergeTable.drop("target/graft_warehouse/ts1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts1")
    spark.sql("""CREATE TABLE graft.ts1.t (id BIGINT, grp BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    (1 to 300).map(i =>
        (i.toLong, i.toLong % 10, if (i % 5 == 0) null else s"value-$i"))
      .toDF("id", "grp", "v").createOrReplaceTempView("ts1_src")
    spark.sql("INSERT INTO graft.ts1.t SELECT * FROM ts1_src")

    assert(spark.sql("ANALYZE TABLE graft.ts1.t COMPUTE STATISTICS FOR ALL COLUMNS")
      .head().getLong(0) === 3L)
    val t = MergeTable.open(spark, "target/graft_warehouse/ts1/t")
    val stats = t.tableStats().get
    assert(stats.rows === 300L)
    assert(stats.cols("grp").ndv === 10L) // HLL is exact at tiny cardinality
    assert(math.abs(stats.cols("id").ndv - 300L) <= 15L) // within HLL rsd
    assert(stats.cols("v").nullCount === 60L) // exact
    assert(stats.cols("id").nullCount === 0L)
    assert(stats.cols("id").avgLen === 8L) // fixed-width: the type's size
    assert(stats.cols("v").maxLen >= 9L) // "value-300".length

    // FOR COLUMNS subset only recomputes what was asked
    assert(spark.sql("ANALYZE TABLE graft.ts1.t COMPUTE STATISTICS FOR COLUMNS grp")
      .head().getLong(0) === 1L)
    assert(t.tableStats().get.cols.keySet === Set("grp"))
  }

  test("CBO reads the analyzed stats as attributeStats on the scan") {
    MergeTable.drop("target/graft_warehouse/ts2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts2")
    spark.sql("""CREATE TABLE graft.ts2.t (id BIGINT, grp BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    (1 to 200).map(i => (i.toLong, i.toLong % 4)).toDF("id", "grp")
      .createOrReplaceTempView("ts2_src")
    spark.sql("INSERT INTO graft.ts2.t SELECT * FROM ts2_src")
    spark.sql("ANALYZE TABLE graft.ts2.t COMPUTE STATISTICS")

    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.table("graft.ts2.t")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(200)), stats.toString)
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.nonEmpty, "expected ANALYZE stats to surface as attributeStats")
      assert(byName("grp").distinctCount.contains(BigInt(4)))
      assert(byName("id").nullCount.contains(BigInt(0)))
    }
  }

  test("ANALYZE computes equi-height histograms; bins capture skew (r13)") {
    MergeTable.drop("target/graft_warehouse/ts3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts3")
    spark.sql("""CREATE TABLE graft.ts3.t (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    // 90% of rows share k=7 — the heavy-hitter skew NDV can't show
    (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L))
      .toDF("id", "k").createOrReplaceTempView("ts3_src")
    spark.sql("INSERT INTO graft.ts3.t SELECT * FROM ts3_src")
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ts3.t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val t = MergeTable.open(spark, "target/graft_warehouse/ts3/t")
    val h = t.tableStats().get.cols("k").hist.get
    assert(h.bins.length === 10)
    assert(h.height === 100.0) // 1000 non-null rows / 10 bins
    // the heavy hitter pins ~9 of 10 equi-height bins to [7, 7]
    val heavy = h.bins.count(b => b.lo === 7.0 && b.hi === 7.0)
    assert(heavy >= 7, h.bins.mkString("|"))
    assert(h.bins.filter(b => b.lo === 7.0 && b.hi === 7.0).forall(_.ndv === 1L))
    // bin edges are monotone and cover the domain
    assert(h.bins.head.lo === 7.0 && h.bins.last.hi === 1000.0, h.bins.mkString("|"))
    assert(h.bins.sliding(2).forall { case Seq(a, b) => a.hi <= b.lo + 1e-9 })
  }

  test("incremental ANALYZE: N folds ≈ full recompute, O(delta) rows read per fold (r14)") {
    MergeTable.drop("target/graft_warehouse/ts5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts5")
    spark.sql("""CREATE TABLE graft.ts5.t (id BIGINT, k BIGINT, s STRING)
                 TBLPROPERTIES('keys'='id')""")
    def batch(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i.toLong, i.toLong % 97, if (i % 7 == 0) null else s"s-$i"))
      .toDF("id", "k", "s")
    val t = MergeTable.open(spark, "target/graft_warehouse/ts5/t")
    t.append(batch(0, 1000))
    spark.sql("ANALYZE TABLE graft.ts5.t COMPUTE STATISTICS FOR ALL COLUMNS")
    // three append-commit folds; each must read only ITS delta
    (1 to 3).foreach { r =>
      t.append(batch(r * 1000, r * 1000 + 200))
      var recordsRead = 0L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          recordsRead += te.taskMetrics.inputMetrics.recordsRead
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        t.analyzeIncremental()
        Thread.sleep(500) // listener bus drains asynchronously
        assert(recordsRead <= 300L,
          s"fold $r read $recordsRead records — must be O(delta=200), " +
            s"not O(table=${1000 + r * 200})")
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val inc = t.tableStats().get
    val full = t.analyzeColumns() // ground truth at the same version
    assert(inc.version === full.version)
    assert(inc.rows === full.rows) // exact (footer row counts)
    for (c <- Seq("id", "k", "s")) {
      assert(inc.cols(c).nullCount === full.cols(c).nullCount, s"nulls($c)")
      assert(inc.cols(c).min === full.cols(c).min, s"min($c)")
      assert(inc.cols(c).max === full.cols(c).max, s"max($c)")
      assert(inc.cols(c).maxLen === full.cols(c).maxLen, s"maxLen($c)")
      // NDV: the union-of-sketches estimate must sit within sketch
      // error of the EXACT distinct count (the full recompute's own
      // HLL++ estimate carries ~5% rsd too, so truth is the fair bar)
      val truth = spark.table("graft.ts5.t")
        .select(c).na.drop().distinct().count().toDouble
      val i0 = inc.cols(c).ndv.toDouble
      assert(math.abs(i0 - truth) <= math.max(truth * 0.05, 2.0),
        s"ndv($c): incremental $i0 vs exact $truth")
    }
    // the folded sketch persisted — the NEXT fold keeps merging
    assert(inc.cols.values.forall(_.hllB64.isDefined))
  }

  test("incremental ANALYZE: re-observed values are idempotent; no prior stats → full") {
    MergeTable.drop("target/graft_warehouse/ts6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts6")
    spark.sql("""CREATE TABLE graft.ts6.t (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    val t = MergeTable.open(spark, "target/graft_warehouse/ts6/t")
    t.append((0 until 500).map(i => (i.toLong, i.toLong % 50)).toDF("id", "k"))
    // no prior stats: incremental degrades to a full analyze (whose
    // HLL++ ndv carries its own small error — the sketch is the truth
    // carrier from here on)
    val first = t.analyzeIncremental()
    assert(first.rows === 500L)
    assert(math.abs(first.cols("k").ndv - 50L) <= 5L, s"${first.cols("k").ndv}")
    // upsert EXISTING keys with EXISTING k values — the delta
    // supersedes base rows the prior stats still count, so the fold
    // degrades to a full pass: counts stay EXACT (600 would mean the
    // superseded keys were double-counted) and NDV stays ~50
    t.upsert((0 until 100).map(i => (i.toLong, i.toLong % 50)).toDF("id", "k"))
    val folded = t.analyzeIncremental()
    assert(folded.rows === 500L, "superseded keys must not double-count")
    assert(math.abs(folded.cols("k").ndv - 50L) <= 5L,
      "re-observed values must not inflate NDV")
    assert(math.abs(folded.cols("id").ndv - 500L) <= 25L)
    // histograms carry over from the last full pass (documented decay)
    assert(folded.version > first.version)
  }

  test("incremental ANALYZE re-derives histograms from the merged KLL sketch (r14)") {
    MergeTable.drop("target/graft_warehouse/ts7")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts7")
    spark.sql("""CREATE TABLE graft.ts7.t (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    val t = MergeTable.open(spark, "target/graft_warehouse/ts7/t")
    // uniform k over 1..100 at the full pass — no heavy bins
    t.append((0 until 1000).map(i => (i.toLong, (i % 100 + 1).toLong)).toDF("id", "k"))
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ts7.t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val full = t.tableStats().get.cols("k")
    assert(full.kllB64.isDefined, "full ANALYZE must persist the KLL registers")
    val before = full.hist.get
    assert(before.bins.count(b => b.lo == b.hi && b.lo == 7.0) <= 1,
      s"uniform data must not pin k=7: ${before.bins.mkString("|")}")
    // a delta that makes k=7 a 90%+ heavy hitter
    t.append((10000 until 19000).map(i => (i.toLong, 7L)).toDF("id", "k"))
    val folded = t.analyzeIncremental()
    val after = folded.cols("k").hist.get
    assert(after.bins.length === before.bins.length, "bin count must hold")
    val heavy = after.bins.count(b => b.lo == 7.0 && b.hi == 7.0)
    assert(heavy >= 7,
      s"the fold must surface the new heavy hitter: ${after.bins.mkString("|")}")
    assert(after.bins.filter(b => b.lo == 7.0 && b.hi == 7.0).forall(_.ndv === 1L))
    // height tracks the folded row count (10000 non-null rows / 10 bins)
    assert(math.abs(after.height - 1000.0) < 1e-6, s"height ${after.height}")
    // and the merged registers persisted for the NEXT fold
    assert(folded.cols("k").kllB64.isDefined)
    assert(folded.cols("k").kllB64 !== full.kllB64)
  }

  test("the served histogram changes CBO selectivity on the skewed column") {
    MergeTable.drop("target/graft_warehouse/ts4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ts4")
    spark.sql("""CREATE TABLE graft.ts4.t (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L))
      .toDF("id", "k").createOrReplaceTempView("ts4_src")
    spark.sql("INSERT INTO graft.ts4.t SELECT * FROM ts4_src")
    def estimate(filter: String): BigInt = withSQLConf("spark.sql.cbo.enabled" -> "true") {
      spark.sql(s"SELECT * FROM graft.ts4.t WHERE $filter")
        .queryExecution.optimizedPlan.stats.rowCount.get
    }
    // WITHOUT a histogram: uniform-NDV selectivity treats k=7 like any
    // other value — a wildly low estimate for the heavy hitter
    withSQLConf("graft.mergetable.histogramBins" -> "0") {
      spark.sql("ANALYZE TABLE graft.ts4.t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val flat = estimate("k = 7")
    // WITH the histogram the heavy bins pin k=7 near its true 900 rows
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ts4.t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val skewAware = estimate("k = 7")
    assert(skewAware > flat * 10,
      s"histogram must lift the heavy-hitter estimate: flat=$flat hist=$skewAware")
    assert(skewAware >= 700 && skewAware <= 1000,
      s"hist estimate should approach the true 900: $skewAware")
  }
}
