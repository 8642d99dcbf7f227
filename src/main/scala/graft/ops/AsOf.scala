package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the right row with the
  * latest timestamp at or before the left row's timestamp, within the
  * same key.
  *
  * Spark has no native ASOF JOIN; the scalable formulation is the
  * union-and-carry trick: tag both sides, union them, and per key do
  * ONE ordered window pass carrying the last seen right-side value
  * forward. That is a single shuffle + sort over left+right — no
  * range-join explosion, no per-row probe — and it's exactly how
  * you'd MERGE two time-ordered streams at 100 TB.
  */
object AsOf {

  /** Attach `right`'s `valueCol` (its value as of the latest
    * `rightTs` <= `leftTs`) to every left row; null when no right row
    * precedes. Right side should have at most one row per (key, ts)
    * for deterministic results. Output: all left columns +
    * `asofCol`.
    */
  def joinLatestAtOrBefore(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      valueCol: String, asofCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    // the carried value is WRAPPED in a struct: the struct is non-null
    // for every right row even when the value itself is null, so
    // "latest right row carries a null value" stays distinguishable
    // from "no preceding right row" (a bare column would let
    // ignoreNulls skip past the newest row to an older stale value)
    val rvType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", right.schema(valueCol).dataType)))
    val tagged =
      left.withColumn("_ts", col(leftTs)).withColumn("_tag", lit(1))
        .withColumn("_rv", lit(null).cast(rvType))
        .select((keyCols ++ Seq("_ts", "_tag", "_rv") ++ leftCols.filterNot(keyCols.contains)).map(col): _*)
    val riders =
      right.select(
        keyCols.map(col) ++ Seq(
          col(rightTs).as("_ts"), lit(0).as("_tag"),
          struct(col(valueCol).as("v")).as("_rv")): _*)
    val unioned = tagged.unionByName(riders, allowMissingColumns = true)
    // right rows sort before left rows at equal ts, so "at or before"
    // includes exact-timestamp matches
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_carried", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .withColumn(asofCol, col("_carried.v"))
      .select((leftCols :+ asofCol).map(col): _*)
  }
}
