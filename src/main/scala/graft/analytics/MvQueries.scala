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
    Caches.onClear(() => {
      MaterializedViews.markStale("mv_orders_by_priority")
      MaterializedViews.markStale("mv_orders_by_pri_status")
    })

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

  /** Incremental MV end to end: seed a MergeTable with a slice of
    * events, materialize the per-type count/sum aggregate, push
    * insert + update + delete commits, refresh by FOLDING THE CHANGE
    * FEED (O(changes), no table rescan), and read the aggregate back
    * through the transparent rewrite. The oracle recomputes the same
    * aggregate from the reconstructed final state, so the hash
    * certifies the retraction algebra (U_pre/-, U_post/+, D/-) and
    * the feed-fold refresh — not just the rewrite plumbing.
    */
  private def mvIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.cdc.MergeTable
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "event_type", "value")
    val root = s"$tmpBase/mv_inc_${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(s, root, Seq("event_id"),
      initial = Some(ev.filter(col("event_id") % 3 =!= 0)))
    val store = s"$tmpBase/mv_inc_store_${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    MaterializedViews.registerIncremental("mv_events_by_type", t,
      Seq("event_type"), Seq("value"), store)
    MaterializedViews.refreshIncremental("mv_events_by_type") // full seed agg
    t.upsert(ev.filter(col("event_id") % 3 === 0))            // inserts
    t.upsert(ev.filter(col("event_id") % 5 === 0)             // value updates
      .withColumn("value", col("value") * 2))
    t.delete(ev.filter(col("event_id") % 7 === 0).select("event_id"))
    MaterializedViews.refreshIncremental("mv_events_by_type") // feed fold
    MaterializedViews.incrementalDefinition("mv_events_by_type")
      .select(col("event_type"), col("n_rows"),
        round(col("sum_value").cast("double"), 3).as("total_value"))
      .orderBy("event_type")
  }

  private val mvIncrementalSql =
    """WITH updated AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END AS value
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 3) AS total_value
      |FROM updated WHERE event_id % 7 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Aggregate-rollup rewrite gate: the registered view groups by
    * (priority, status); the query groups by priority ALONE, so no
    * exact plan match exists — the rule must answer it by
    * RE-AGGREGATING the materialization (count → sum of counts,
    * decimal sum → sum of sums). The oracle recomputes the coarse
    * aggregate directly from the fact table, so the hash certifies
    * the rollup algebra; `MaterializedViewSpec` separately proves the
    * plan reads the store, not the base.
    */
  private def ordersByPriorityStatus(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"))

  private def mvRollup(s: SparkSession, dir: String): DataFrame = {
    staleOnClear
    val path = s"$tmpBase/mvstore_rollup_${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    MaterializedViews.register("mv_orders_by_pri_status",
      () => ordersByPriorityStatus(s, dir), path)
    MaterializedViews.refresh("mv_orders_by_pri_status")
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2)
          .as("total"))
      .orderBy("o_orderpriority")
  }

  private val mvRollupSql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("mv_rewrite", mvRewrite, Some(mvRewriteSql)),
    QueryDef("mv_incremental", mvIncremental, Some(mvIncrementalSql)),
    QueryDef("mv_rollup", mvRollup, Some(mvRollupSql)),
  )
}
