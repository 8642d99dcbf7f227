package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AWS DMS CDC envelope codec.
  *
  * Envelope shape (reference: transcation_log_dms.py:75-139):
  * `{data, metadata}` where `data` is the row image JSON and
  * `metadata` carries `{timestamp, record-type, operation,
  * schema-name, table-name, ...}`. Ops: `load`,`insert` → insert;
  * `update` → upsert; `delete` → delete
  * (transcation_log_dms.py:145-149).
  */
object Dms {

  val rootSchema: StructType = StructType(Seq(
    StructField("data", StringType),
    StructField("metadata", StringType)))

  val metadataSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("record-type", StringType),
    StructField("operation", StringType),
    StructField("partition-key-type", StringType),
    StructField("schema-name", StringType),
    StructField("table-name", StringType),
    StructField("transaction-id", LongType)))

  private val isoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** Parse DMS envelope JSON into the normalized change model. The DMS
    * metadata timestamp (ISO-8601 micros) becomes `ts_ms`.
    */
  def parse(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"), rootSchema).as("r"))
      .select(
        col("r.data").as("payload"),
        from_json(col("r.metadata"), metadataSchema).as("m"))
      .select(
        when(col("m.operation").isin("load", "insert"), CdcModel.OpInsert)
          .when(col("m.operation") === "update", CdcModel.OpUpsert)
          .when(col("m.operation") === "delete", CdcModel.OpDelete).as("opclass"),
        col("m.`schema-name`").as("db"),
        col("m.`table-name`").as("tbl"),
        unix_millis(to_timestamp(col("m.timestamp"), isoFmt)).as("ts_ms"),
        col("payload"))
      .filter(col("opclass").isNotNull && col("payload").isNotNull)

  /** Deterministic DMS envelope synthesis from `events` (see
    * Debezium.synthesizeFromEvents for the role this plays in the
    * correctness gate). Mapping: signup→insert, error→delete,
    * else→update.
    */
  def synthesizeFromEvents(events: DataFrame): DataFrame = {
    val payload = to_json(struct(col("event_id"), col("user_id"), col("event_type"), col("value")))
    val op = when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "error", "delete")
      .otherwise("update")
    val metadata = to_json(struct(
      date_format(col("ts").cast("timestamp"), isoFmt).as("timestamp"),
      lit("data").as("record-type"),
      op.as("operation"),
      lit("primary-key").as("partition-key-type"),
      lit("graftdb").as("schema-name"),
      concat(lit("events_"), (col("user_id") % 3).cast("string")).as("table-name")))
    events.select(to_json(struct(payload.as("data"), metadata.as("metadata"))).as("value"))
  }
}
