package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch precombine: reduce a change batch to the latest row per
  * primary key, so MERGE sources never carry duplicate keys
  * (reference: the row_number()-over-ts_ms dedup at
  * transaction_log_util.py:264-273, guarding against
  * MERGE_CARDINALITY_VIOLATION).
  *
  * Spark-first design note: the reference sorts every key group with a
  * window (`row_number() OVER (PARTITION BY pk ORDER BY ts_ms DESC)`),
  * which shuffles AND sorts. Here it is a hash aggregation with
  * `max_by(struct(<row>), struct(<ordering>))`: one shuffle, partial
  * aggregation map-side, no sort — each mapper keeps only one
  * candidate row per key, so at 100 TB the shuffle carries ≤ one row
  * per (mapper, key) instead of every change.
  */
object Precombine {

  /** Latest row per `keys`, ordered by `ordering` columns
    * (lexicographic struct comparison; later = greater). All non-key
    * columns are carried through unchanged.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    val ord = struct(ordering.map(col): _*)
    val packed = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), ord).as("_latest"))
    packed.select(keys.map(col) ++ others.map(c => col(s"_latest.$c").as(c)): _*)
  }
}
