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

  test("bad arguments fail loudly") {
    val e1 = intercept[Exception](spark.sql("SELECT * FROM table_changes('x')").collect())
    assert(e1.getMessage.contains("table_changes") || e1.getMessage.contains("startingVersion"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('unqualified', 0)").collect())
    assert(e2.getMessage.toLowerCase.contains("catalog"))
  }
}
