package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope codec.
  *
  * Envelope shape (reference: transaction_log_util.py:60-67):
  * `{before, after, source, op, ts_ms, transaction}` where
  * before/after/source are nested JSON text. Ops: `r` (snapshot read),
  * `c` (create) → insert; `u` → upsert; `d` → delete
  * (transaction_log_util.py:80-84). For deletes the row image is in
  * `before` (transaction_log_util.py:150-167), otherwise `after`.
  */
object Debezium {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", StringType),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("transaction", StringType)))

  val sourceSchema: StructType = StructType(Seq(
    StructField("db", StringType),
    StructField("table", StringType)))

  /** Parse a column of Debezium envelope JSON into the normalized
    * change model. One narrow projection, no shuffle; everything is
    * codegen-friendly `from_json`.
    */
  def parse(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"), envelopeSchema).as("e"))
      .select(
        from_json(col("e.source"), sourceSchema).as("src"),
        col("e.op").as("op"), col("e.ts_ms").as("ts_ms"),
        col("e.before").as("before"), col("e.after").as("after"))
      .select(
        when(col("op").isin("r", "c"), CdcModel.OpInsert)
          .when(col("op") === "u", CdcModel.OpUpsert)
          .when(col("op") === "d", CdcModel.OpDelete).as("opclass"),
        col("src.db").as("db"),
        col("src.table").as("tbl"),
        col("ts_ms"),
        when(col("op") === "d", col("before")).otherwise(col("after")).as("payload"))
      .filter(col("opclass").isNotNull && col("payload").isNotNull)

  /** Deterministically synthesize Debezium envelopes from the `events`
    * table (used by the correctness gate — the DuckDB oracle computes
    * the expected *parsed* result straight from `events`, so any
    * serialize/parse defect shows up as a mismatch).
    *
    * Mapping: signup→c, error→d, everything else→u;
    * db = 'graftdb', table = events_{user_id % 3}.
    */
  def synthesizeFromEvents(events: DataFrame): DataFrame = {
    val payload = to_json(struct(col("event_id"), col("user_id"), col("event_type"), col("value")))
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val source = to_json(struct(
      lit("graftdb").as("db"),
      concat(lit("events_"), (col("user_id") % 3).cast("string")).as("table")))
    events.select(
      to_json(struct(
        when(op === "d", payload).as("before"),
        when(op =!= "d", payload).as("after"),
        source.as("source"),
        op.as("op"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"))).as("value"))
  }

  /** Payload schema used by the synthesized-events round trip. */
  val eventsPayloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))
}
