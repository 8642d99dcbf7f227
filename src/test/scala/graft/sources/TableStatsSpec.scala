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
