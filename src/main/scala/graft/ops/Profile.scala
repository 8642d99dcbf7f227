package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiler: per-column null count, exact distinct
  * count, and (for numeric columns) min/max — the table-health report
  * every ingest pipeline runs before promoting a batch.
  *
  * Scale shape: ONE aggregation over one scan. The multi-distinct is
  * Spark's expand-based plan — the map side expands each row once per
  * profiled column but partial-aggregates to DISTINCT (column, value)
  * pairs before the shuffle, so shuffle volume is bounded by the sum
  * of per-column cardinalities, not by row count. The 44-expression
  * result is a single row that pivots to one row per column with a
  * `stack` projection — no second scan, no driver loop.
  */
object Profile {

  /** Profile `numericCols` ++ `otherCols` of `df`. Output one row per
    * column: (column_name, null_cnt, n_distinct, min_num, max_num) —
    * min/max are null for non-numeric columns (their string/date
    * rendering is engine-specific; counts are not).
    */
  def columns(df: DataFrame, numericCols: Seq[String], otherCols: Seq[String]): DataFrame = {
    val all = numericCols ++ otherCols
    val aggs = all.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd")) ++
        (if (numericCols.contains(c))
           Seq(min(col(c)).cast("double").as(s"${c}__min"),
               max(col(c)).cast("double").as(s"${c}__max"))
         else
           Seq(lit(null).cast("double").as(s"${c}__min"),
               lit(null).cast("double").as(s"${c}__max")))
    }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = all.map { c =>
      s"'$c', `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    onerow.selectExpr(
      s"stack(${all.size}, $stackArgs) AS (column_name, null_cnt, n_distinct, min_num, max_num)")
      .orderBy("column_name")
  }
}
