package graft.cdc

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class CdcCodecSpec extends SparkSpec {
  import spark.implicits._

  test("debezium round trip preserves every event") {
    val ev = Tables.events(spark, sfDir)
    val parsed = Debezium.parse(Debezium.synthesizeFromEvents(ev))
    assert(parsed.count() === ev.count())
    val classes = parsed.groupBy("opclass").count().as[(String, Long)].collect().toMap
    assert(classes.keySet === Set("I", "U", "D"))
  }

  test("debezium delete rows carry the before-image payload") {
    val ev = Tables.events(spark, sfDir).filter($"event_type" === "error").limit(5)
    val parsed = Debezium.parse(Debezium.synthesizeFromEvents(ev))
    assert(parsed.filter($"opclass" === "D").count() === ev.count())
    assert(parsed.filter($"payload".isNull).count() === 0)
  }

  test("dms round trip matches debezium normal form") {
    val ev = Tables.events(spark, sfDir)
    val d1 = Debezium.parse(Debezium.synthesizeFromEvents(ev))
      .select("opclass", "db", "tbl", "ts_ms", "payload")
    val d2 = Dms.parse(Dms.synthesizeFromEvents(ev))
      .select("opclass", "db", "tbl", "ts_ms", "payload")
    assert(d1.exceptAll(d2).isEmpty && d2.exceptAll(d1).isEmpty)
  }

  test("inferPayloadSchema unions fields across rows (beats first-row inference)") {
    val mixed = Seq("""{"a": 1}""", """{"b": "x"}""").toDF("payload")
    val schema = CdcModel.inferPayloadSchema(spark, mixed, "payload")
    assert(schema.fieldNames.toSet === Set("a", "b"))
  }

  test("precombine keeps exactly one latest row per key with tiebreak") {
    val df = Seq(
      (1L, 100L, 1L, "old"),
      (1L, 200L, 2L, "new"),
      (1L, 200L, 3L, "newer-tiebreak"),
      (2L, 50L, 4L, "only"),
    ).toDF("k", "ts_ms", "seq", "v")
    val out = Precombine.latestByKey(df, Seq("k"), Seq("ts_ms", "seq"))
      .select("k", "v").as[(Long, String)].collect().sorted
    assert(out === Seq((1L, "newer-tiebreak"), (2L, "only")))
  }

  test("tableconfig parses the reference tables.json shape") {
    val json =
      """[
        |  {"db":"d","table":"t1","primary_key":"id,seq","format-version":2,
        |   "write.merge.mode":"merge-on-read","write.update.mode":"merge-on-read",
        |   "write.delete.mode":"merge-on-read",
        |   "timestamp.fields":["created_at","updated_at"],"precombine_key":"updated_at"}
        |]""".stripMargin
    val confs = TableConfig.parseJson(json)
    assert(confs.head.primaryKey === Seq("id", "seq"))
    assert(confs.head.precombineKey === Some("updated_at"))
    assert(confs.head.timestampFields === Seq("created_at", "updated_at"))
    assert(confs.head.writeMergeMode === "merge-on-read")
    // missing table falls back to reference defaults
    val dflt = TableConfig.forTable(confs, "d", "nope")
    assert(dflt.primaryKey === Seq("id") && dflt.writeMergeMode === "copy-on-write")
  }

  test("timestamp field coercion converts configured string columns") {
    val conf = TableConfig(db = "d", table = "t", timestampFields = Seq("created_at"))
    val df = Seq(("2024-01-01 10:00:00", "x")).toDF("created_at", "other")
    val out = TableConfig.applyTimestampFields(df, conf)
    assert(out.schema("created_at").dataType.typeName.startsWith("timestamp"))
    assert(out.schema("other").dataType.typeName === "string")
  }
}
