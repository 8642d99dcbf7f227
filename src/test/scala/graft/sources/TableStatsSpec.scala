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
}
