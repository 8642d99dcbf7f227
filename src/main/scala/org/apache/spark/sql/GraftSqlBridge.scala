package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to `private[sql]` constructors the public API does
  * not expose: building a DataFrame from a custom LogicalPlan and
  * unwrapping a Column to its Catalyst Expression. This is the
  * standard extension seam for libraries that add their own logical
  * operators (Spark's own connectors use the same package-scoped
  * access); everything else in graft stays on public API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst Expression as a public Column — for expressions
    * whose constants are computed at plan-build time (e.g. a trained
    * PQ codebook) and so can't go through the function registry.
    */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def catalogPlugin(spark: SparkSession, name: String): connector.catalog.CatalogPlugin =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager.catalog(name)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.logical

  def buildPlannerStrategies(ext: SparkSessionExtensions, spark: SparkSession): Seq[execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  def registerFunctions(ext: SparkSessionExtensions,
                        registry: catalyst.analysis.FunctionRegistry): catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)
}
