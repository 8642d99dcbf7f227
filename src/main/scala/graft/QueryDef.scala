package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over an sf directory plus an
  * optional DuckDB oracle SQL the driver hash-compares against.
  * Oracle-less entries get the driver's weaker rows-only check and are
  * semantically asserted in ScalaTest instead.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def defs: Seq[QueryDef]
}
