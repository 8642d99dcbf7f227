package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The composed (PARTITIONED BY + buckets) layout through the DSv2
  * catalog: DDL declares both dimensions, the first INSERT seeds
  * through the true v2 write (engine-planned clustering over
  * identity(partition) + bucket(n, keys)), snapshots serve through
  * the Batch scan, co-bucketed composed tables storage-partition-join
  * with zero shuffles, SQL DML rides the scoped cell merge, and the
  * maintenance surface (SHOW PARTITIONS, OPTIMIZE WHERE, metadata-only
  * aggregation) understands the cell dirs.
  */
class ComposedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  test("CREATE TABLE with PARTITIONED BY + buckets seeds pb cells through the v2 write") {
    fresh("pbc0")
    spark.sql("""CREATE TABLE graft.pbc0.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')
                 PARTITIONED BY (day)""")
    val rows = (1 to 100).map(i => (i.toLong, s"d${i % 3}", i.toLong))
    rows.toDF("id", "day", "v").createOrReplaceTempView("pbc0_src")
    spark.sql("INSERT INTO graft.pbc0.t SELECT * FROM pbc0_src")
    // the seed landed as pb manifest entries (the composed layout)
    val m = latestManifestLines("target/graft_warehouse/pbc0/t")
    assert(m.forall(e => e.startsWith("pb:") || e.startsWith("txn:")), m.mkString("|"))
    assert(m.exists(e => e.contains("_graft_p_day=") && e.contains("_graft_bucket=")))
    // snapshot reads serve through the Batch scan with correct results
    val df = spark.table("graft.pbc0.t")
    assert(df.queryExecution.executedPlan.toString.contains("MergeTableBatchScan"))
    assert(df.as[(Long, String, Long)].collect().sorted === rows.sorted)
    // partition predicate prunes whole partition dirs in the scan
    val red = spark.sql("SELECT id FROM graft.pbc0.t WHERE day = 'd1'")
    assert(red.as[Long].collect().sorted === rows.filter(_._2 == "d1").map(_._1).sorted)
  }

  test("SQL MERGE/UPDATE/DELETE ride the scoped cell merge") {
    fresh("pbc1")
    spark.sql("""CREATE TABLE graft.pbc1.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')
                 PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft.pbc1.t VALUES
                 (1,'a',10), (2,'a',20), (3,'b',30), (4,'b',40)""")
    Seq((2L, "a", 25L), (5L, "b", 50L)).toDF("id", "day", "v")
      .createOrReplaceTempView("pbc1_src")
    spark.sql("""MERGE INTO graft.pbc1.t t USING pbc1_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("UPDATE graft.pbc1.t SET v = v + 1 WHERE id = 3")
    spark.sql("DELETE FROM graft.pbc1.t WHERE id = 1")
    assert(spark.table("graft.pbc1.t").as[(Long, String, Long)].collect().sorted ===
      Seq((2L, "a", 25L), (3L, "b", 31L), (4L, "b", 40L), (5L, "b", 50L)))
  }

  test("co-bucketed COMPOSED tables join with ZERO shuffles on the bucket keys") {
    fresh("pbc2")
    for (t <- Seq("facts", "dims")) {
      spark.sql(s"""CREATE TABLE graft.pbc2.$t (id BIGINT, day STRING, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')
                    PARTITIONED BY (day)""")
    }
    val n = 400
    (1 to n).map(i => (i.toLong, s"d${i % 4}", s"f$i")).toDF("id", "day", "v")
      .createOrReplaceTempView("pbc2_f")
    (1 to n).map(i => (i.toLong, s"d${i % 4}", s"d$i")).toDF("id", "day", "v")
      .createOrReplaceTempView("pbc2_d")
    spark.sql("INSERT INTO graft.pbc2.facts SELECT * FROM pbc2_f")
    spark.sql("INSERT INTO graft.pbc2.dims SELECT * FROM pbc2_d")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT f.id, f.v AS fv, d.v AS dv
          |FROM graft.pbc2.facts f JOIN graft.pbc2.dims d ON f.id = d.id""".stripMargin)
      assert(shuffles(j) === 0,
        s"expected a shuffle-free storage-partitioned join:\n${j.queryExecution.executedPlan}")
      assert(j.count() === n)
    }
  }

  test("metadata-only aggregation answers partition-filtered counts on pb cells") {
    fresh("pbc3")
    spark.sql("""CREATE TABLE graft.pbc3.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='4')
                 PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft.pbc3.t VALUES
                 (1,'a',10), (2,'a',20), (3,'b',30), (4,'b',40), (5,'b',50)""")
    val q = spark.sql("SELECT count(*) AS n FROM graft.pbc3.t WHERE day = 'b'")
    assert(q.queryExecution.executedPlan.toString.contains("MergeTableMetadataAggScan"),
      s"partition-filtered count must fold from footer stats:\n${q.queryExecution.executedPlan}")
    assert(q.as[Long].head() === 3L)
  }

  test("SHOW PARTITIONS reports the value partitions; OPTIMIZE WHERE scopes cells") {
    fresh("pbc4")
    spark.sql("""CREATE TABLE graft.pbc4.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='2')
                 PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft.pbc4.t VALUES
                 (1,'a',10), (2,'a',20), (3,'b',30), (4,'b',40)""")
    val parts = spark.sql("SHOW PARTITIONS graft.pbc4.t")
      .select("partition").as[String].collect().toSet
    assert(parts === Set("day=a", "day=b"), parts)
    // partition + bucket predicates conjoin; a non-partition column refuses
    spark.sql("OPTIMIZE graft.pbc4.t WHERE day = 'a' AND bucket = 0")
    val err = intercept[Exception] {
      spark.sql("OPTIMIZE graft.pbc4.t WHERE v = 10")
    }
    assert(err.getMessage.contains("partition columns and 'bucket'"), err.getMessage)
    assert(spark.table("graft.pbc4.t").count() === 4L)
  }
}
