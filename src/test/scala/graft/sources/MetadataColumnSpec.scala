package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The `_graft_file` metadata column (Iceberg's `_file`): row-level
  * file lineage on batch-readable snapshots — the handle for targeted
  * rewrites and compaction forensics. Hidden (absent from SELECT *),
  * appended per file by the reader, consistent with the `files`
  * inspection table, mask-aware on deletion-vector snapshots, and not
  * advertised where a row has no single source file (MOR).
  */
class MetadataColumnSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    graft.cdc.MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  test("_graft_file is hidden from SELECT * but selectable, one value per file") {
    fresh("mc1")
    spark.sql("""CREATE TABLE graft.mc1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.mc1.t VALUES (1,'a')")
    spark.sql("INSERT INTO graft.mc1.t VALUES (2,'b')")
    assert(spark.table("graft.mc1.t").columns.toSeq === Seq("id", "v"))
    val rows = spark.sql("SELECT id, _graft_file FROM graft.mc1.t")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows.values.forall(_.endsWith(".parquet")), rows)
    assert(rows(1L) !== rows(2L)) // two appends → two files
    // lineage agrees with the files inspection table
    val declared = spark.table("graft.mc1.t.files")
      .select("file_path").as[String].collect().map(_.split("/").last).toSet
    assert(rows.values.map(_.split("/").last).toSet === declared)
  }

  test("filtering and grouping by _graft_file work (GDPR-targeting shape)") {
    fresh("mc2")
    spark.sql("""CREATE TABLE graft.mc2.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.mc2.t VALUES (1,'a'), (2,'b')")
    spark.sql("INSERT INTO graft.mc2.t VALUES (3,'c')")
    val perFile = spark.sql(
      "SELECT _graft_file, count(*) AS n FROM graft.mc2.t GROUP BY 1")
      .as[(String, Long)].collect().toMap
    // a multi-row INSERT may fan out over several write tasks — the
    // invariant is per-file counts folding back to the table total
    assert(perFile.values.sum === 3L && perFile.size >= 2, perFile)
    val target = spark.sql(
      "SELECT _graft_file FROM graft.mc2.t WHERE id = 3").as[String].head()
    assert(spark.table("graft.mc2.t")
      .select(col("id"), col("_graft_file")).as[(Long, String)]
      .filter(_._2 == target).map(_._1).collect().toSeq === Seq(3L))
  }

  test("dv snapshot: masked rows are gone, survivors keep their file") {
    fresh("mc3")
    spark.sql("""CREATE TABLE graft.mc3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='deletion-vectors')""")
    spark.sql("INSERT INTO graft.mc3.t VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("DELETE FROM graft.mc3.t WHERE id = 2")
    val rows = spark.sql("SELECT id, _graft_file FROM graft.mc3.t")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet === Set(1L, 3L))
    assert(rows.values.forall(_.endsWith(".parquet")))
  }

  test("MOR snapshots do not advertise the column; compaction restores it") {
    fresh("mc4")
    spark.sql("""CREATE TABLE graft.mc4.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id','mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.mc4.t VALUES (1,'a')")
    spark.sql("INSERT INTO graft.mc4.t VALUES (1,'A')") // delta: reconciliation
    val e = intercept[Exception](
      spark.sql("SELECT _graft_file FROM graft.mc4.t").collect())
    assert(e.getMessage.contains("_graft_file"), e.getMessage)
    spark.sql("COMPACT graft.mc4.t")
    assert(spark.sql("SELECT _graft_file FROM graft.mc4.t")
      .as[String].head().endsWith(".parquet"))
  }
}
