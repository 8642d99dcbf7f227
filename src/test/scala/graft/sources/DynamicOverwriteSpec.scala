package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

/** Dynamic partition overwrite (`INSERT OVERWRITE` under
  * `partitionOverwriteMode=dynamic`): the staged v2 write replaces
  * exactly the partitions present in the source, untouched partitions
  * carry over verbatim, the PK invariant is guarded by a loud
  * refusal, and the static mode keeps its r11 truncate/refusal
  * behavior.
  */
class DynamicOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private def withDynamic[T](body: => T): T = {
    val k = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(k)
    spark.conf.set(k, "dynamic")
    try body finally prior match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  private def lastManifest(db: String, t: String): Seq[String] =
    latestManifestLines(s"target/graft_warehouse/$db/$t")

  test("a source that duplicates a key WITHIN ITSELF refuses (PK invariant)") {
    fresh("dyn9")
    spark.sql("""CREATE TABLE graft.dyn9.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft.dyn9.t VALUES (1,'a',10), (2,'b',20)")
    // partition replacement writes rows VERBATIM — a key duplicated
    // inside the source (here split across two staged partitions)
    // would commit a silent PK violation the untouched-partition
    // clash scan can never see
    val e = intercept[Exception](withDynamic {
      spark.sql("INSERT OVERWRITE graft.dyn9.t VALUES (1L,'a',11L), (1L,'b',12L)")
    })
    assert(e.getMessage.contains("not unique on primary key"), e.getMessage)
    // same-partition duplicates refuse too
    val e2 = intercept[Exception](withDynamic {
      spark.sql("INSERT OVERWRITE graft.dyn9.t VALUES (5L,'a',1L), (5L,'a',2L)")
    })
    assert(e2.getMessage.contains("not unique on primary key"), e2.getMessage)
    // the table is unchanged by both refusals
    assert(spark.table("graft.dyn9.t").count() === 2)
  }

  test("dynamic INSERT OVERWRITE replaces only the partitions present in the source") {
    fresh("dyn0")
    spark.sql("""CREATE TABLE graft.dyn0.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft.dyn0.t VALUES
                 (1,'a',10), (2,'a',20), (3,'b',30), (4,'c',40)""")
    val before = lastManifest("dyn0", "t")
    withDynamic {
      // source covers ONLY partition 'a' — with fresh ids, so the PK
      // guard does not fire; b and c must carry over verbatim
      spark.sql("INSERT OVERWRITE graft.dyn0.t VALUES (11L, 'a', 110L)")
    }
    val after = lastManifest("dyn0", "t")
    Seq("b", "c").foreach { d =>
      val entry = before.find(_.contains(s"_graft_p_day=$d")).get
      assert(after.contains(entry), s"partition $d was rewritten: $after")
    }
    assert(!after.exists(before.filter(_.contains("_graft_p_day=a")).contains),
      "partition a must be replaced")
    assert(spark.table("graft.dyn0.t").as[(Long, String, Long)].collect().sorted ===
      Seq((3L, "b", 30L), (4L, "c", 40L), (11L, "a", 110L)))
    // time travel still reads the pre-overwrite snapshot
    assert(spark.sql("SELECT count(*) FROM graft.dyn0.t VERSION AS OF 1")
      .as[Long].head() === 4L)
  }

  test("partition-keyed tables skip the untouched-partition clash scan (r13)") {
    // partition cols ⊆ primary key → a row's partition values are part
    // of its key, so a staged key can only collide inside a partition
    // the source REPLACES: the commit is pure dir replacement and must
    // never read the untouched partitions' (large) data
    fresh("dyn10")
    spark.sql("""CREATE TABLE graft.dyn10.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id,day') PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft.dyn10.t SELECT id, concat('d', id % 5), id " +
      "FROM range(0, 5000)")
    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try withDynamic {
      spark.sql("INSERT OVERWRITE graft.dyn10.t VALUES " +
        "(9001L, 'd1', 1L), (9002L, 'd1', 2L)")
      Thread.sleep(500) // listener bus drains asynchronously
      // only the staged rows (the PK-dup self-check) are read — never
      // the ~4000 rows of the four untouched partitions
      assert(recordsRead < 100L,
        s"clash scan must be skipped on a partition-keyed table: read $recordsRead")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(spark.table("graft.dyn10.t").filter($"day" === "d1").count() === 2L)
    assert(spark.table("graft.dyn10.t").filter($"day" =!= "d1").count() === 4000L)
  }

  test("a staged key living in an untouched partition refuses loudly") {
    fresh("dyn1")
    spark.sql("""CREATE TABLE graft.dyn1.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft.dyn1.t VALUES (1,'a',10), (2,'b',20)")
    val err = intercept[Exception] {
      withDynamic {
        // id=2 lives in partition b; overwriting only partition a with
        // it would leave the key duplicated across partitions
        spark.sql("INSERT OVERWRITE graft.dyn1.t VALUES (2L, 'a', 99L)")
      }
    }
    assert(err.getMessage.contains("duplicate primary key"), err.getMessage)
    // the refused write must not have changed the table
    assert(spark.table("graft.dyn1.t").as[(Long, String, Long)].collect().sorted ===
      Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("dynamic overwrite on a COMPOSED table drops the partition's absent buckets too") {
    fresh("dyn2")
    spark.sql("""CREATE TABLE graft.dyn2.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'buckets'='4') PARTITIONED BY (day)""")
    (1L to 40L).map(i => (i, if (i <= 20) "a" else "b", i)).toDF("id", "day", "v")
      .createOrReplaceTempView("dyn2_src")
    spark.sql("INSERT INTO graft.dyn2.t SELECT * FROM dyn2_src")
    withDynamic {
      // ONE fresh row into partition a: every old cell of a must drop
      // (including buckets the single row does not hash into)
      spark.sql("INSERT OVERWRITE graft.dyn2.t VALUES (100L, 'a', 1000L)")
    }
    val got = spark.table("graft.dyn2.t").as[(Long, String, Long)].collect().sorted
    assert(got === ((21L to 40L).map(i => (i, "b", i)) :+ (100L, "a", 1000L)).sorted)
    val after = lastManifest("dyn2", "t")
    assert(after.forall(_.startsWith("pb:")), after.mkString("|"))
  }

  test("an empty dynamic overwrite replaces nothing; static mode still refuses") {
    fresh("dyn3")
    spark.sql("""CREATE TABLE graft.dyn3.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft.dyn3.t VALUES (1,'a',10)")
    withDynamic {
      spark.sql("""INSERT OVERWRITE graft.dyn3.t
                   SELECT * FROM graft.dyn3.t WHERE id < 0""")
    }
    assert(spark.table("graft.dyn3.t").count() === 1L)
    // static (default) INSERT OVERWRITE on a populated keyed layout
    // keeps refusing at analysis (no TRUNCATE capability)
    val err = intercept[Exception] {
      spark.sql("INSERT OVERWRITE graft.dyn3.t VALUES (9L, 'z', 90L)")
    }
    assert(err.getMessage.toLowerCase.contains("truncate") ||
      err.getMessage.toLowerCase.contains("overwrite"), err.getMessage)
  }

  test("dynamic overwrite on a HIDDEN-DAY layout replaces the source's days (r13)") {
    fresh("dyn11")
    spark.sql("""CREATE TABLE graft.dyn11.t (id BIGINT, v STRING, ts TIMESTAMP_NTZ)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.dyn11.t VALUES
      (1, 'a', TIMESTAMP_NTZ'2024-03-01 08:00:00'),
      (2, 'b', TIMESTAMP_NTZ'2024-03-01 18:00:00'),
      (3, 'c', TIMESTAMP_NTZ'2024-03-02 09:00:00')""")
    withDynamic {
      // the source covers ONLY day 2024-03-01 (fresh ids) — day 02
      // carries over verbatim, the derived granule computed
      // executor-side routes the staged rows
      spark.sql("INSERT OVERWRITE graft.dyn11.t VALUES " +
        "(11, 'x', TIMESTAMP_NTZ'2024-03-01 01:00:00')")
    }
    assert(spark.table("graft.dyn11.t").orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
      === Seq((3L, "c"), (11L, "x")))
    val lines = lastManifest("dyn11", "t")
    assert(lines.exists(_.contains("_graft_p_ts_day=2024-03-02")), lines.mkString("|"))
  }

  test("MOR pending deltas refuse dynamic overwrite until compaction") {
    fresh("dyn4")
    spark.sql("""CREATE TABLE graft.dyn4.t (id BIGINT, day STRING, v BIGINT)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')
                 PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft.dyn4.t VALUES (1,'a',10)")
    spark.sql("INSERT INTO graft.dyn4.t VALUES (2,'b',20)") // flat delta
    val path = "target/graft_warehouse/dyn4/t"
    if (lastManifest("dyn4", "t").exists(_.startsWith("delta:"))) {
      val err = intercept[Exception] {
        withDynamic {
          spark.sql("INSERT OVERWRITE graft.dyn4.t VALUES (3L, 'a', 30L)")
        }
      }
      assert(err.getMessage.contains("compaction"), err.getMessage)
      MergeTable.open(spark, path).compact()
    }
    withDynamic {
      spark.sql("INSERT OVERWRITE graft.dyn4.t VALUES (3L, 'a', 30L)")
    }
    assert(spark.table("graft.dyn4.t").as[(Long, String, Long)].collect().sorted ===
      Seq((2L, "b", 20L), (3L, "a", 30L)))
  }
}
