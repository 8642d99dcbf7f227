package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Normalized change-event model.
  *
  * Both CDC formats the reference consumes (Debezium and AWS DMS) are
  * reduced to one normal form so everything downstream — precombine,
  * demux, merge apply — is format-agnostic:
  *
  *   opclass  'I' | 'U' | 'D'   (insert / upsert / delete)
  *   db, tbl  routing keys for multi-table topics
  *   ts_ms    change timestamp (precombine ordering)
  *   payload  row image as JSON text (after-image; before-image for D)
  *
  * Reference behavior: op split at
  * transaction_log_util.py:80-84 (`r`,`c` → insert; `u` → upsert;
  * `d` → delete) and transcation_log_dms.py:145-149 (`load`,`insert` /
  * `update` / `delete`).
  */
object CdcModel {
  val OpInsert = "I"
  val OpUpsert = "U"
  val OpDelete = "D"

  val normalizedColumns: Seq[String] =
    Seq("opclass", "db", "tbl", "ts_ms", "payload")

  /** Distributed JSON schema inference for a payload column — the
    * Spark-first replacement for the reference's first-row
    * `schema_of_json` (transaction_log_util.py:89-110), which silently
    * drops fields absent from the sampled row. Reading the whole
    * column through the JSON datasource unions schemas across rows
    * (and across executors), so it stays correct when a batch mixes
    * old- and new-schema rows.
    */
  def inferPayloadSchema(spark: SparkSession, df: DataFrame, column: String,
                         sampleRows: Option[Int] = None): org.apache.spark.sql.types.StructType = {
    import spark.implicits._
    // default: union schemas across the WHOLE batch, so a field that
    // appears in any row is never silently dropped (the reference's
    // first-row sampling loses such fields). Micro-batches are already
    // bounded by the source's rate limit, so full-batch inference is
    // one extra bounded pass; pass sampleRows to cap it explicitly
    // when the schema is known to be stable.
    val payloads = df.select(col(column)).na.drop()
    val sampled = sampleRows.fold(payloads)(n => payloads.limit(n))
    // DROPMALFORMED: one truncated payload must not grow a
    // _corrupt_record column that schema-evolves into the target
    // table; the defensive filter covers readers that record the
    // corrupt column anyway
    val corruptCol = spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    val inferred = spark.read.option("mode", "DROPMALFORMED").json(sampled.as[String]).schema
    org.apache.spark.sql.types.StructType(inferred.filterNot(_.name == corruptCol))
  }

  /** Decode the JSON payload of a normalized change stream with an
    * explicit schema (e.g. the target table's schema, mirroring
    * transaction_log_util.py:143-145 which reads the schema from the
    * live table for MERGE).
    */
  def decodePayload(df: DataFrame, schema: org.apache.spark.sql.types.StructType, keep: Seq[String] = Nil): DataFrame =
    df.select(keep.map(col) :+ from_json(col("payload"), schema).as("_row"): _*)
      .select(keep.map(col) :+ col("_row.*"): _*)

  /** The distinct (db, tbl) routing set — multi-table demux, as in
    * transaction_log_util.py:87-98.
    */
  def routes(df: DataFrame): DataFrame =
    df.select("db", "tbl").distinct()
}
