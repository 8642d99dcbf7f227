package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed band join: pair each left row with the right rows of the
  * same key whose timestamp falls in a bounded window BEFORE the left
  * timestamp — "clicks in the hour before this purchase".
  *
  * Spark plans a raw inequality join as a nested loop per key-group
  * (O(n·m) pairs per key); this operator makes the window length the
  * bucket width of an EQUI-join key instead: every right row is
  * published into its own bucket and the next one (2 slim rows), every
  * left row probes exactly its own bucket. A right ts in
  * [lt − W, lt) lies in bucket(lt) or bucket(lt) − 1, so exactly one
  * of the two published copies matches — coverage is complete and no
  * pair is produced twice. Work is one shuffled equi-join on
  * (key, bucket) with the range residual as a join-condition filter:
  * linear in input, the shape that survives 100 TB.
  */
object RangeJoin {

  /** Left rows joined (left-outer) to same-key right rows with
    * `rightTs` in `[leftTs - windowSeconds, leftTs)`. Output: all
    * left columns plus `matchedCol` = the matched right timestamp
    * (null when the window holds nothing) — aggregate downstream
    * (`count(matchedCol)` keeps zero-match left rows).
    */
  def joinWindowBefore(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String, windowSeconds: Long,
                       matchedCol: String): DataFrame = {
    val wMs = windowSeconds * 1000L
    def bucketOf(c: Column): Column = floor(unix_millis(c.cast("timestamp")) / wMs)
    val l = left.withColumn("_rj_lb", bucketOf(col(leftTs)))
    val r = right.select(
        keyCols.zipWithIndex.map { case (k, i) => col(k).as(s"_rj_k$i") } :+
          col(rightTs).as(matchedCol): _*)
      .withColumn("_rj_b0", bucketOf(col(matchedCol)))
      .withColumn("_rj_rb", explode(array(col("_rj_b0"), col("_rj_b0") + 1)))
      .drop("_rj_b0")
    val cond = keyCols.zipWithIndex.map { case (k, i) => l(k) === r(s"_rj_k$i") }
      .reduce(_ && _) &&
      l("_rj_lb") === r("_rj_rb") &&
      r(matchedCol) >= l(leftTs) - expr(s"INTERVAL $windowSeconds SECOND") &&
      r(matchedCol) < l(leftTs)
    l.join(r, cond, "left")
      .drop("_rj_lb", "_rj_rb")
      .drop(keyCols.indices.map(i => s"_rj_k$i"): _*)
  }

  /** Same bucketed band join, inner form, carrying right-side payload
    * columns alongside the matched timestamp. Each output row is one
    * (left row, in-window right row) pair; left rows with an empty
    * window produce nothing — the attribution/correlation form, where
    * downstream picks min/max over the matched payloads.
    */
  def pairsWindowBefore(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                        leftTs: String, rightTs: String, windowSeconds: Long,
                        matchedCol: String, payloadCols: Seq[String]): DataFrame = {
    val wMs = windowSeconds * 1000L
    def bucketOf(c: Column): Column = floor(unix_millis(c.cast("timestamp")) / wMs)
    val l = left.withColumn("_rj_lb", bucketOf(col(leftTs)))
    val r = right.select(
        keyCols.zipWithIndex.map { case (k, i) => col(k).as(s"_rj_k$i") } ++
          (col(rightTs).as(matchedCol) +: payloadCols.map(col)): _*)
      .withColumn("_rj_b0", bucketOf(col(matchedCol)))
      .withColumn("_rj_rb", explode(array(col("_rj_b0"), col("_rj_b0") + 1)))
      .drop("_rj_b0")
    val cond = keyCols.zipWithIndex.map { case (k, i) => l(k) === r(s"_rj_k$i") }
      .reduce(_ && _) &&
      l("_rj_lb") === r("_rj_rb") &&
      r(matchedCol) >= l(leftTs) - expr(s"INTERVAL $windowSeconds SECOND") &&
      r(matchedCol) < l(leftTs)
    l.join(r, cond, "inner")
      .drop("_rj_lb", "_rj_rb")
      .drop(keyCols.indices.map(i => s"_rj_k$i"): _*)
  }
}
