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
    // re-adding a dropped name is rejected (would resurrect old values)
    assert(intercept[Exception](
      spark.sql("ALTER TABLE graft.db.dropcol ADD COLUMNS (junk INT)").collect())
      .getMessage.contains("previously dropped"))
    // the next rewrite physically removes the column
    spark.sql("INSERT INTO graft.db.dropcol VALUES (3, 'c')")
    spark.sql("COMPACT graft.db.dropcol")
    val root = spark.sql("DESCRIBE DETAIL graft.db.dropcol").head().getString(0)
    val latest = MergeTable.open(spark, root)
    assert(!latest.readVersion(latest.versions().max).columns.contains("junk"))
  }

  test("bad arguments fail loudly") {
    val e1 = intercept[Exception](spark.sql("SELECT * FROM table_changes('x')").collect())
    assert(e1.getMessage.contains("table_changes") || e1.getMessage.contains("startingVersion"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('unqualified', 0)").collect())
    assert(e2.getMessage.toLowerCase.contains("catalog"))
  }
}
