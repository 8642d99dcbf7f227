package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row

/** The v1 streaming `Source` contract requires `getBatch` to return a
  * DataFrame flagged `isStreaming = true`; the only way to mint one is
  * the `private[sql]` `internalCreateDataFrame` that Spark's own file
  * and socket sources use. This one-method shim lives under
  * `org.apache.spark.sql` solely to reach that API — no other Spark
  * internals are touched, and nothing else in graft depends on being
  * inside this package.
  */
object StreamingShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }

  /** The inverse problem on the sink side: the DataFrame handed to a
    * v1 `Sink.addBatch` still wraps the streaming logical plan, so any
    * new query over it trips the batch-analysis check. Re-expose the
    * micro-batch's physical result as a plain batch DataFrame (the
    * technique Spark's own FileStreamSink uses via executedPlan).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }
}
