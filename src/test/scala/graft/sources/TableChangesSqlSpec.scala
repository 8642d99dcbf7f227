package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable

/** The `table_changes` TVF: SQL surface of the per-version change
  * feed, resolving both catalog identifiers and raw paths.
  */
class TableChangesSqlSpec extends SparkSpec {
  import spark.implicits._

  test("path target replays per-version changes with bounded windows") {
    val root = "target/test_tmp/tvf_path"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))
    val full = spark.sql(s"SELECT * FROM table_changes('$root', 0)")
      .as[(Long, String, String)].collect().sorted
    assert(full === Seq((1L, "a", "D"), (2L, "B", "U"), (3L, "c", "I")))
    // explicit endingVersion bounds the window; composes with WHERE
    val win = spark.sql(
      s"SELECT * FROM table_changes('$root', 1, 2) WHERE _change = 'I'")
      .as[(Long, String, String)].collect().sorted
    assert(win === Seq((3L, "c", "I")))
  }

  test("timestamp bounds: strings resolve against the commit log") {
    val root = "target/test_tmp/tvf_ts"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    Thread.sleep(5)
    t.upsert(Seq((2L, "b")).toDF("id", "v"))
    val times = t.history().map { case (v, ms, _, _, _) => v -> ms }.toMap
    def fmt(ms: Long): String = {
      val f = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f.format(new java.util.Date(ms))
    }
    // start at v2's commit time: v2 is INCLUDED (at-or-after rule)
    val fromTs = spark.sql(
      s"SELECT * FROM table_changes('$root', '${fmt(times(2L))}')")
      .as[(Long, String, String)].collect().sorted
    assert(fromTs === Seq((2L, "b", "I")))
    // ending timestamp at v1's commit time bounds the window to v1
    val toTs = spark.sql(
      s"SELECT * FROM table_changes('$root', 0, '${fmt(times(1L))}')")
      .as[(Long, String, String)].collect().sorted
    assert(toTs === Seq((1L, "a", "I")))
    // pre-history end bound is a loud error (Delta parity)
    val err = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$root', 0, '1970-01-02 00:00:00')").collect())
    assert(err.getMessage.contains("no commit"))
  }

  test("catalog identifier target resolves through the mergetable catalog") {
    spark.sql("DROP TABLE IF EXISTS graft.db.tvf_cat")
    spark.sql("CREATE TABLE graft.db.tvf_cat (id BIGINT, v STRING) TBLPROPERTIES (keys = 'id')")
    spark.sql("INSERT INTO graft.db.tvf_cat VALUES (1, 'x'), (2, 'y')")
    spark.sql("INSERT INTO graft.db.tvf_cat VALUES (2, 'Y2')")
    val out = spark.sql("SELECT * FROM table_changes('graft.db.tvf_cat', 1)")
      .as[(Long, String, String)].collect().sorted
    assert(out === Seq((2L, "Y2", "U")))
  }

  test("ALTER TABLE ADD COLUMNS declares schema; reads backfill nulls; writes persist") {
    spark.sql("DROP TABLE IF EXISTS graft.db.addcol")
    spark.sql("CREATE TABLE graft.db.addcol (id BIGINT, v STRING) TBLPROPERTIES (keys = 'id')")
    spark.sql("INSERT INTO graft.db.addcol VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("ALTER TABLE graft.db.addcol ADD COLUMNS (score INT, tag STRING)")
      .collect().head.getLong(0) === 2L)
    // existing rows read the new columns as typed nulls immediately
    val rows = spark.sql("SELECT id, v, score, tag FROM graft.db.addcol ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.isNullAt(2), r.isNullAt(3)))
    assert(rows === Array((1L, "a", true, true), (2L, "b", true, true)))
    // the first write carrying the column persists real values
    spark.sql("INSERT INTO graft.db.addcol VALUES (3, 'c', 7, 'x')")
    val after = spark.sql(
      "SELECT id, score FROM graft.db.addcol WHERE score IS NOT NULL").collect()
    assert(after.map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((3L, 7)))
    // duplicate names are rejected against the live snapshot schema
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.addcol ADD COLUMNS (v STRING)").collect())
    assert(dup.getMessage.contains("already exists"))
  }

  test("ALTER TABLE DROP COLUMN hides immediately, guards keys/constraints, compaction reclaims") {
    spark.sql("DROP TABLE IF EXISTS graft.db.dropcol")
    spark.sql("CREATE TABLE graft.db.dropcol (id BIGINT, v STRING, junk INT) TBLPROPERTIES (keys = 'id')")
    spark.sql("INSERT INTO graft.db.dropcol VALUES (1, 'a', 5), (2, 'b', 6)")
    spark.sql("ALTER TABLE graft.db.dropcol DROP COLUMN junk")
    // hidden from current-snapshot reads immediately
    assert(spark.sql("SELECT * FROM graft.db.dropcol").columns.toSeq === Seq("id", "v"))
    // time travel still sees history
    assert(spark.read.format("mergetable")
      .option("path", spark.sql("DESCRIBE DETAIL graft.db.dropcol").head().getString(0))
      .option("versionAsOf", "1").load().columns.contains("junk"))
    // guards: key and constraint references refuse to drop
    assert(intercept[Exception](
      spark.sql("ALTER TABLE graft.db.dropcol DROP COLUMN id").collect())
      .getMessage.contains("key column"))
    spark.sql("ALTER TABLE graft.db.dropcol ADD CONSTRAINT vlen CHECK (length(v) > 0)")
    assert(intercept[Exception](
      spark.sql("ALTER TABLE graft.db.dropcol DROP COLUMN v").collect())
      .getMessage.contains("constraint"))
    // re-adding a dropped name is legal under the column mapping: the
    // fresh physical id reads NULL, never the old values
    spark.sql("ALTER TABLE graft.db.dropcol ADD COLUMNS (junk INT)")
    assert(spark.sql("SELECT junk FROM graft.db.dropcol").collect()
      .forall(_.isNullAt(0)))
    spark.sql("ALTER TABLE graft.db.dropcol DROP COLUMN junk")
    // the next rewrite physically removes the column
    spark.sql("INSERT INTO graft.db.dropcol VALUES (3, 'c')")
    spark.sql("COMPACT graft.db.dropcol")
    val root = spark.sql("DESCRIBE DETAIL graft.db.dropcol").head().getString(0)
    val latest = MergeTable.open(spark, root)
    assert(!latest.readVersion(latest.versions().max).columns.contains("junk"))
  }

  test("RENAME COLUMN maps the name across reads, writes, time travel, change feed") {
    spark.sql("DROP TABLE IF EXISTS graft.db.ren")
    spark.sql("CREATE TABLE graft.db.ren (id BIGINT, v STRING) TBLPROPERTIES (keys = 'id')")
    spark.sql("INSERT INTO graft.db.ren VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("ALTER TABLE graft.db.ren RENAME COLUMN v TO label")
      .collect().head.getLong(0) === 1L)
    // current read: new name, old values; old name gone
    assert(spark.sql("SELECT id, label FROM graft.db.ren ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    intercept[Exception](spark.sql("SELECT v FROM graft.db.ren").collect())
    // writes through the NEW name translate back to the physical column
    spark.sql("INSERT INTO graft.db.ren VALUES (3, 'c')")
    assert(spark.sql("SELECT id, label FROM graft.db.ren ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val root = GraftSqlParser.mergetablePath(spark, "graft", Seq("db", "ren"), "spec")
    // no data file was touched by the rename: physical files still
    // carry the old name
    val t = MergeTable.open(spark, root)
    // time travel of a PRE-rename version surfaces the new name
    val v1 = spark.read.format("mergetable").option("path", root)
      .option("versionAsOf", "1").load()
    assert(v1.columns.contains("label") && !v1.columns.contains("v"))
    assert(v1.orderBy("id").select("label").as[String].collect().toSeq ===
      Seq("a", "b"))
    // the change feed (TVF) also speaks the new name, across the rename
    val feed = spark.sql("SELECT * FROM table_changes('graft.db.ren', 0)")
    assert(feed.columns.contains("label") && !feed.columns.contains("v"))
    assert(feed.orderBy("id").select("id", "label", "_change")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "a", "I"), (2L, "b", "I"), (3L, "c", "I")))
    // a COW rewrite keeps physical names: reads after compaction are
    // unchanged (the mapping is permanent, like Delta's)
    t.compact()
    assert(spark.sql("SELECT id, label FROM graft.db.ren ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("RENAME COLUMN guards: keys, existing targets, constraints, chains") {
    spark.sql("DROP TABLE IF EXISTS graft.db.ren_guard")
    spark.sql("CREATE TABLE graft.db.ren_guard (id BIGINT, v STRING, w STRING) " +
      "TBLPROPERTIES (keys = 'id')")
    spark.sql("INSERT INTO graft.db.ren_guard VALUES (1, 'a', 'x')")
    val key = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ren_guard RENAME COLUMN id TO key2").collect())
    assert(key.getMessage.contains("key column"))
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ren_guard RENAME COLUMN v TO w").collect())
    assert(dup.getMessage.contains("already exists"))
    spark.sql("ALTER TABLE graft.db.ren_guard ADD CONSTRAINT cv CHECK (v IS NOT NULL)")
    val con = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ren_guard RENAME COLUMN v TO vv").collect())
    assert(con.getMessage.contains("constraint"))
    spark.sql("ALTER TABLE graft.db.ren_guard DROP CONSTRAINT cv")
    // rename chains: v -> vv -> vvv keeps resolving to the original
    // physical column
    spark.sql("ALTER TABLE graft.db.ren_guard RENAME COLUMN v TO vv")
    spark.sql("ALTER TABLE graft.db.ren_guard RENAME COLUMN vv TO vvv")
    assert(spark.sql("SELECT vvv FROM graft.db.ren_guard").as[String].collect()
      .toSeq === Seq("a"))
    // and the ORIGINAL name is free again for a new column
    spark.sql("ALTER TABLE graft.db.ren_guard ADD COLUMNS (v INT)")
    val r = spark.sql("SELECT vvv, v FROM graft.db.ren_guard").collect().head
    assert(r.getString(0) === "a" && r.isNullAt(1))
  }

  test("re-adding a dropped name maps to a fresh physical id — no resurrection") {
    spark.sql("DROP TABLE IF EXISTS graft.db.readd")
    spark.sql("CREATE TABLE graft.db.readd (id BIGINT, v STRING) TBLPROPERTIES (keys = 'id')")
    spark.sql("INSERT INTO graft.db.readd VALUES (1, 'old1'), (2, 'old2')")
    spark.sql("ALTER TABLE graft.db.readd DROP COLUMN v")
    // legal now: the new logical 'v' maps to a fresh physical id
    assert(spark.sql("ALTER TABLE graft.db.readd ADD COLUMNS (v STRING)")
      .collect().head.getLong(0) === 1L)
    // the dropped values are still in the data files, but the new 'v'
    // reads NULL — never the old values
    assert(spark.sql("SELECT id, v FROM graft.db.readd ORDER BY id")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq ===
      Seq((1L, true), (2L, true)))
    // writes through the re-added name land under the fresh id
    spark.sql("INSERT INTO graft.db.readd VALUES (3, 'new3')")
    assert(spark.sql("SELECT id, v FROM graft.db.readd ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ===
      Seq((1L, None), (2L, None), (3L, Some("new3"))))
    // a rewrite reclaims the OLD physical column while keeping the new
    val root = GraftSqlParser.mergetablePath(spark, "graft", Seq("db", "readd"), "spec")
    MergeTable.open(spark, root).compact()
    assert(spark.sql("SELECT id, v FROM graft.db.readd ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ===
      Seq((1L, None), (2L, None), (3L, Some("new3"))))
  }

  test("bad arguments fail loudly") {
    val e1 = intercept[Exception](spark.sql("SELECT * FROM table_changes('x')").collect())
    assert(e1.getMessage.contains("table_changes") || e1.getMessage.contains("startingVersion"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('unqualified', 0)").collect())
    assert(e2.getMessage.toLowerCase.contains("catalog"))
  }
}
