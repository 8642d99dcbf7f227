package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Per-table ingestion config, mirroring the reference's
  * `tables.json` (aws-emr-serverless/iceberg/config/tables.json and
  * the lookup loops at transaction_log_util.py:186-244): primary key
  * (comma-separated multi-column supported), optional precombine key,
  * timestamp fields to coerce, format version and write modes.
  */
final case class TableConfig(
    db: String,
    table: String,
    primaryKey: Seq[String] = Seq("id"),
    precombineKey: Option[String] = None,
    timestampFields: Seq[String] = Nil,
    formatVersion: Int = 2,
    writeMergeMode: String = "copy-on-write",
    writeUpdateMode: String = "copy-on-write",
    writeDeleteMode: String = "copy-on-write")

object TableConfig {
  private val mapper = new ObjectMapper()

  /** Parse a tables.json document (array of per-table objects). */
  def parseJson(json: String): Seq[TableConfig] = {
    val root = mapper.readTree(json)
    root.elements().asScala.map(fromNode).toSeq
  }

  private def fromNode(n: JsonNode): TableConfig = {
    def opt(field: String): Option[JsonNode] = Option(n.get(field))
    // accept both the array and comma-string forms for every
    // multi-valued field (an array reaching asText() would silently
    // become "")
    def multi(f: JsonNode): Seq[String] =
      if (f.isArray) f.elements().asScala.map(_.asText()).toSeq
      else f.asText().split(",").map(_.trim).toSeq
    val tsFields = opt("timestamp.fields").map(multi).getOrElse(Nil)
    def required(field: String): String = opt(field).map(_.asText()).getOrElse(
      throw new IllegalArgumentException(
        s"tables.json entry missing required field '$field': $n"))
    TableConfig(
      db = required("db"),
      table = required("table"),
      primaryKey = opt("primary_key").map(multi).getOrElse(Seq("id")),
      precombineKey = opt("precombine_key").map(_.asText()),
      timestampFields = tsFields,
      formatVersion = opt("format-version").map(_.asInt()).getOrElse(2),
      writeMergeMode = opt("write.merge.mode").map(_.asText()).getOrElse("copy-on-write"),
      writeUpdateMode = opt("write.update.mode").map(_.asText()).getOrElse("copy-on-write"),
      writeDeleteMode = opt("write.delete.mode").map(_.asText()).getOrElse("copy-on-write"))
  }

  /** Find the config for (db, table), with reference-matching defaults
    * when absent (transaction_log_util.py:180-193).
    */
  def forTable(configs: Seq[TableConfig], db: String, table: String): TableConfig =
    configs.find(c => c.db == db && c.table == table)
      .getOrElse(TableConfig(db = db, table = table))

  /** Coerce configured timestamp string fields, as the reference does
    * before writing (transaction_log_util.py:195-200).
    */
  def applyTimestampFields(df: org.apache.spark.sql.DataFrame, conf: TableConfig): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    conf.timestampFields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f)) acc.withColumn(f, to_timestamp(col(f))) else acc
    }
  }
}
