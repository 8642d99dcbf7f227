package graft.analytics

import graft.{Caches, QueryDef, QueryModule}
import graft.plans.MaterializedViews
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized-view gate query: register + refresh an aggregate MV
  * over orders, then run a query that embeds the same aggregate —
  * the analyzer rule swaps the subtree for the materialization, so
  * the hashed result certifies the MV pipeline end to end
  * (definition replay, parquet round trip, attribute re-aliasing).
  * `MaterializedViewSpec` separately proves the executed plan reads
  * the MV, not the fact table.
  */
object MvQueries extends QueryModule {

  private val tmpBase: String = sys.props.get("graft.tmp.dir")
    .getOrElse(java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."))
      .toAbsolutePath.resolve("target").resolve("graft_tmp").toString)

  // one idempotent staleness hook for the whole module (Caches hooks
  // persist across clears — registering per query run would pile up)
  private lazy val staleOnClear: Unit =
    Caches.onClear(() => MaterializedViews.markStale("mv_orders_by_priority"))

  /** The MV definition AND the query's inner subtree — built by one
    * function so the exact-plan match is honest about its contract.
    */
  private def ordersByPriority(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2)
          .as("total"))

  private def mvRewrite(s: SparkSession, dir: String): DataFrame = {
    staleOnClear
    val path = s"$tmpBase/mvstore_${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    MaterializedViews.register("mv_orders_by_priority",
      () => ordersByPriority(s, dir), path)
    MaterializedViews.refresh("mv_orders_by_priority")
    // analysis of this DataFrame fires the rewrite: the groupBy
    // subtree is answered by the parquet materialization
    ordersByPriority(s, dir)
      .filter(col("n") >= 1)
      .orderBy("o_orderpriority")
  }

  private val mvRewriteSql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
      |FROM orders GROUP BY 1 HAVING count(*) >= 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("mv_rewrite", mvRewrite, Some(mvRewriteSql)),
  )
}
