package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

class MergeTableCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit =
    MergeTable.drop(s"target/graft_warehouse/$db")

  test("create, insert, select, merge, delete, drop through SQL identifiers") {
    fresh("cat1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat1")
    spark.sql("""CREATE TABLE graft.cat1.users (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    assert(spark.sql("SHOW TABLES IN graft.cat1").count() === 1)

    spark.sql("INSERT INTO graft.cat1.users VALUES (1, 'a'), (2, 'b')")
    assert(spark.table("graft.cat1.users").as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "b")))

    Seq((2L, "B"), (3L, "c")).toDF("id", "v").createOrReplaceTempView("cat_src")
    spark.sql("""MERGE INTO graft.cat1.users t USING cat_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("graft.cat1.users").as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))

    spark.sql("DELETE FROM graft.cat1.users WHERE v = 'a'")
    assert(spark.table("graft.cat1.users").as[(Long, String)].collect().sorted ===
      Seq((2L, "B"), (3L, "c")))

    spark.sql("DROP TABLE graft.cat1.users")
    assert(spark.sql("SHOW TABLES IN graft.cat1").count() === 0)
  }

  test("CREATE TABLE AS SELECT seeds a mergetable in one statement") {
    fresh("cat14")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat14")
    spark.sql("""CREATE TABLE graft.cat14.c TBLPROPERTIES('keys'='id')
                 AS SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, v)""")
    assert(spark.table("graft.cat14.c").as[(Int, String)].collect().sorted ===
      Seq((1, "a"), (2, "b")))
    // the CTAS result is a first-class mergetable: DML keeps working
    spark.sql("""MERGE INTO graft.cat14.c t
                 USING (SELECT 2 AS id, 'B' AS v) s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("graft.cat14.c").as[(Int, String)].collect().sorted ===
      Seq((1, "a"), (2, "B")))
    spark.sql("DROP TABLE graft.cat14.c")
  }

  test("VERSION AS OF reads committed snapshots; TIMESTAMP AS OF resolves latest") {
    fresh("cat2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat2")
    spark.sql("""CREATE TABLE graft.cat2.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat2.t VALUES (1, 'v1')") // version 1
    Seq((1L, "v2")).toDF("id", "v").createOrReplaceTempView("cat2_src")
    spark.sql("""MERGE INTO graft.cat2.t t USING cat2_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""") // version 2
    assert(spark.sql("SELECT v FROM graft.cat2.t VERSION AS OF 1").as[String].head() === "v1")
    assert(spark.sql("SELECT v FROM graft.cat2.t VERSION AS OF 2").as[String].head() === "v2")
    assert(spark.sql("SELECT v FROM graft.cat2.t TIMESTAMP AS OF now()")
      .as[String].head() === "v2")
  }

  test("catalog reads push filters and prune columns through to parquet") {
    fresh("cat3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat3")
    spark.sql("""CREATE TABLE graft.cat3.wide (id BIGINT, a STRING, b STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat3.wide VALUES (1,'x','y'), (2,'p','q')")
    val df = spark.sql("SELECT a FROM graft.cat3.wide WHERE id = 2")
    assert(df.as[String].collect() === Seq("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || df.count() == 1) // scan reached
  }

  test("filters the relation cannot translate are still applied (LIKE)") {
    fresh("cat5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat5")
    spark.sql("""CREATE TABLE graft.cat5.s (id BIGINT, name STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat5.s VALUES (1,'apple'), (2,'banana'), (3,'apricot')")
    // LIKE 'a%' → StringStartsWith, which the relation can't translate;
    // the ScanBuilder must hand it back to the engine, not swallow it
    val got = spark.sql("SELECT name FROM graft.cat5.s WHERE name LIKE 'a%'")
      .as[String].collect().sorted
    assert(got === Seq("apple", "apricot"))
  }

  test("MERGE with duplicate source keys fails instead of corrupting the table") {
    fresh("cat6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat6")
    spark.sql("""CREATE TABLE graft.cat6.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat6.t VALUES (1, 'a')")
    Seq((2L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("dup_src")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO graft.cat6.t t USING dup_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e.getMessage.contains("multiple rows"), e.getMessage)
  }

  test("UPDATE SET with a target-side value keeps the target value, not SET * semantics") {
    fresh("cat7")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat7")
    spark.sql("""CREATE TABLE graft.cat7.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat7.t VALUES (1, 'keep')")
    Seq((1L, "overwrite")).toDF("id", "v").createOrReplaceTempView("tv_src")
    // `SET v = t.v` shares the column name with the source but takes
    // the TARGET's value — the general-merge compiler must run it as a
    // read-modify-write no-op, never silently as SET *
    spark.sql("""MERGE INTO graft.cat7.t t USING tv_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = t.v""")
    assert(spark.table("graft.cat7.t").as[(Long, String)].head() === (1L, "keep"))
  }

  test("VACUUM and COMPACT maintenance SQL") {
    fresh("cat8")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat8")
    spark.sql("""CREATE TABLE graft.cat8.m (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.cat8.m VALUES (1,'a')") // base
    spark.sql("INSERT INTO graft.cat8.m VALUES (2,'b')") // delta
    spark.sql("INSERT INTO graft.cat8.m VALUES (1,'A')") // delta
    spark.sql("COMPACT graft.cat8.m") // folds the deltas into one base
    val root = "target/graft_warehouse/cat8/m"
    val last = latestManifestLines(root).mkString("\n")
    assert(last.linesIterator.forall(_.startsWith("base:")), last)
    // old versions' data dirs become unreferenced → vacuum removes them
    val removed = spark.sql("VACUUM graft.cat8.m").as[Long].head()
    assert(removed >= 2, s"expected >=2 expired dirs, got $removed")
    assert(spark.table("graft.cat8.m").as[(Long, String)].collect().sorted ===
      Seq((1L, "A"), (2L, "b")))
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) === 2)
  }

  test("RESTORE TABLE rolls back by committing the old snapshot forward") {
    fresh("cat11")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat11")
    spark.sql("""CREATE TABLE graft.cat11.r (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat11.r VALUES (1,'a'), (2,'b')") // v1
    spark.sql("INSERT INTO graft.cat11.r VALUES (3,'c')")          // v2
    spark.sql("DELETE FROM graft.cat11.r WHERE id = 1")            // v3
    val newV = spark.sql("RESTORE TABLE graft.cat11.r TO VERSION AS OF 1").as[Long].head()
    assert(newV === 4L, s"restore should commit a NEW version, got $newV")
    assert(spark.table("graft.cat11.r").as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "b")))
    // history rolled forward, not rewritten: the undone snapshot is
    // still readable via time travel
    assert(spark.sql("SELECT * FROM graft.cat11.r VERSION AS OF 3")
      .as[(Long, String)].collect().sorted === Seq((2L, "b"), (3L, "c")))
    // a timestamp at-or-after the last commit restores the latest state
    val t = MergeTable.open(spark, "target/graft_warehouse/cat11/r")
    assert(t.versions() === Seq(1L, 2L, 3L, 4L))
    val e = intercept[Exception](
      spark.sql("RESTORE TABLE graft.cat11.r TO VERSION AS OF 99"))
    assert(e.getMessage.contains("no version 99"))
  }

  test("EXPIRE SNAPSHOTS KEEP n trims history through SQL") {
    fresh("cat15")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat15")
    spark.sql("""CREATE TABLE graft.cat15.e (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat15.e VALUES (1,'a')") // v1
    spark.sql("INSERT INTO graft.cat15.e VALUES (2,'b')") // v2
    spark.sql("INSERT INTO graft.cat15.e VALUES (3,'c')") // v3
    val n = spark.sql("EXPIRE SNAPSHOTS graft.cat15.e KEEP 1")
      .as[Long].head()
    assert(n === 2)
    assert(spark.sql("DESCRIBE HISTORY graft.cat15.e")
      .selectExpr("version").as[Long].collect().toSeq === Seq(3L))
    assert(spark.table("graft.cat15.e").count() === 3) // state intact
  }

  test("DESCRIBE HISTORY lists the commit log newest first") {
    fresh("cat12")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat12")
    spark.sql("""CREATE TABLE graft.cat12.h (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.cat12.h VALUES (1,'a')") // v1: one delta
    spark.sql("INSERT INTO graft.cat12.h VALUES (2,'b')") // v2: two deltas
    spark.sql("COMPACT graft.cat12.h")                    // v3: folded base
    val h = spark.sql("DESCRIBE HISTORY graft.cat12.h")
      .selectExpr("version", "base_entries", "delta_entries")
      .as[(Long, Long, Long)].collect().toSeq
    assert(h === Seq((3L, 1L, 0L), (2L, 0L, 2L), (1L, 0L, 1L)))
    // committed_at carries the manifest mtime TIMESTAMP AS OF resolves
    // against: monotone non-decreasing along versions, none in the future
    val ts = spark.sql("DESCRIBE HISTORY graft.cat12.h")
      .selectExpr("version", "cast(committed_at AS LONG)")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(ts === ts.sorted && ts.forall(_ <= System.currentTimeMillis() / 1000 + 1))
  }

  test("OPTIMIZE ZORDER BY rewrites the table clustered and keeps results") {
    fresh("cat9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat9")
    spark.sql("""CREATE TABLE graft.cat9.z (id BIGINT, v BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.range(1000).selectExpr("id", "id * 3 AS v")
      .createOrReplaceTempView("cat9_seed")
    spark.sql("INSERT INTO graft.cat9.z SELECT id, v FROM cat9_seed")
    val files = spark.sql("OPTIMIZE graft.cat9.z ZORDER BY (id, v)").as[Long].head()
    assert(files >= 1, s"optimize reported $files files")
    assert(spark.table("graft.cat9.z").count() === 1000L)
    assert(spark.table("graft.cat9.z").where("id = 77").selectExpr("v")
      .as[Long].collect().toSeq === Seq(231L))
  }

  test("catalog table honors MOR and bucketed properties") {
    fresh("cat4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat4")
    spark.sql("""CREATE TABLE graft.cat4.m (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.cat4.m VALUES (1,'a')")
    spark.sql("INSERT INTO graft.cat4.m VALUES (1,'b')") // MOR delta, latest wins
    assert(spark.table("graft.cat4.m").as[(Long, String)].collect() === Seq((1L, "b")))
    val meta = MergeTable.readMeta("target/graft_warehouse/cat4/m").get
    assert(meta.mode === MergeTable.MergeOnRead)
  }

  test("CREATE TABLE PARTITIONED BY declares the value-partitioned layout") {
    fresh("cat5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat5")
    spark.sql("""CREATE TABLE graft.cat5.p (id BIGINT, grp STRING, v BIGINT)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    val root = "target/graft_warehouse/cat5/p"
    assert(MergeTable.readMeta(root).get.partitionCols === Seq("grp"))
    spark.sql("INSERT INTO graft.cat5.p VALUES (1,'red',10), (2,'blue',20)")
    // the insert landed partition-scoped: pv entries, per-value dirs
    val manifest = latestManifestLines(root).mkString("\n")
    assert(manifest.linesIterator.forall(_.startsWith("pv:")), manifest)
    assert(manifest.contains("_graft_p_grp=red") && manifest.contains("_graft_p_grp=blue"))
    // MERGE through SQL keeps the layout partition-scoped
    spark.sql("""MERGE INTO graft.cat5.p t
                 USING (SELECT CAST(2 AS BIGINT) AS id, 'blue' AS grp,
                               CAST(25 AS BIGINT) AS v) s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("graft.cat5.p").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "red", 10L), (2L, "blue", 25L)))
    // unsupported transforms are rejected loudly, not ignored
    // (identity, days() and months() are the supported set —
    // HiddenPartitionSpec covers the derived pair)
    val bad = intercept[Exception](spark.sql(
      """CREATE TABLE graft.cat5.bad (id BIGINT, ts TIMESTAMP)
         PARTITIONED BY (hours(ts)) TBLPROPERTIES('keys'='id')"""))
    assert(bad.getMessage.contains("identity"), bad.getMessage)
  }

  test("DESCRIBE DETAIL reports layout, mapping, and drop state") {
    fresh("cat6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cat6")
    spark.sql("""CREATE TABLE graft.cat6.d (id BIGINT, grp STRING, v BIGINT, junk INT)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.cat6.d VALUES (1,'red',10,5)")
    spark.sql("ALTER TABLE graft.cat6.d RENAME COLUMN v TO amount")
    spark.sql("ALTER TABLE graft.cat6.d DROP COLUMN junk")
    val row = spark.sql("DESCRIBE DETAIL graft.cat6.d").head()
    val byName = row.schema.fieldNames.zipWithIndex.toMap
    assert(row.getString(byName("partition_columns")) === "grp")
    assert(row.getString(byName("column_mapping")) === "amount->v")
    assert(row.getString(byName("dropped_columns")) === "junk")
    assert(row.getString(byName("keys")) === "id")
  }

  test("OPTIMIZE WHERE tokenizer: quoted values may contain AND") {
    import GraftSqlParser.parsePartitionEqualities
    // a quoted literal containing " AND " is ONE equality, not a
    // conjunction — a raw split on AND would shred it mid-literal
    assert(parsePartitionEqualities("grp = 'a AND b'") ===
      Seq("grp" -> "a AND b"))
    assert(parsePartitionEqualities("a = '1' AND b = x.y AND c = 'z w'") ===
      Seq("a" -> "1", "b" -> "x.y", "c" -> "z w"))
    assert(parsePartitionEqualities("a='x'AND b='y'") ===
      Seq("a" -> "x", "b" -> "y"))
    intercept[IllegalArgumentException](parsePartitionEqualities("a > '1'"))
    intercept[IllegalArgumentException](
      parsePartitionEqualities("a = '1' OR b = '2'"))
    intercept[IllegalArgumentException](parsePartitionEqualities("a = '1' AND"))
    intercept[IllegalArgumentException](parsePartitionEqualities("   "))
  }
}
