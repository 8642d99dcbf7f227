package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the trade network: iterative PageRank on the
  * customer–supplier bipartite graph (an edge per distinct trading
  * pair from lineitem ⋈ orders, walked both directions so the chain
  * has no dangling nodes).
  *
  * Scale design: the edge derivation is the only data-scaled stage
  * (one join + distinct). Each PageRank iteration is one edge⋈rank
  * shuffle + one aggregation — the canonical distributed power-method
  * shape; ranks and edges carry only (type, id, long) rows. The
  * iteration count is fixed (3) and unrolled, so the whole training
  * loop is declarative and the oracle replays it round for round.
  *
  * Cross-engine exactness: ranks live in integer MICRO-UNITS
  * (10^12 total mass). Per-edge contributions are `rank div outdeg`,
  * the damping update is `(15·base) div 100 + (85·Σcontrib) div 100`
  * — floor divisions leak tiny mass (standard in integer PageRank)
  * but every operation is order-independent integer arithmetic, so
  * the final ranks hash-match DuckDB bit for bit with no float
  * accumulation anywhere.
  */
object GraphQueries extends QueryModule {

  private val Mass = 1000000000000L // 10^12 micro-units of total rank
  private val Rounds = 3

  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("su")).distinct()
    val fwd = pairs.select(lit("c").as("src_t"), col("c").as("src_id"),
      lit("s").as("dst_t"), col("su").as("dst_id"))
    val rev = pairs.select(lit("s").as("src_t"), col("su").as("src_id"),
      lit("c").as("dst_t"), col("c").as("dst_id"))
    val edges = graft.Caches.register(fwd.unionAll(rev))
    val deg = graft.Caches.register(
      edges.groupBy("src_t", "src_id").agg(count(lit(1)).as("outdeg")))
    val n = deg.count() // node count: every node has out-edges by symmetry
    val base = Mass / n
    var rank = deg.select(col("src_t").as("node_t"), col("src_id").as("node_id"),
      lit(base).as("r"))
    for (_ <- 1 to Rounds) {
      val contrib = edges
        .join(rank, col("src_t") === col("node_t") && col("src_id") === col("node_id"))
        .join(deg, Seq("src_t", "src_id"))
        .select(col("dst_t"), col("dst_id"), expr("r div outdeg").as("give"))
        .groupBy("dst_t", "dst_id").agg(sum("give").as("in_sum"))
      rank = contrib.select(col("dst_t").as("node_t"), col("dst_id").as("node_id"),
        (lit(15L * base / 100L) + expr("(85 * in_sum) div 100")).as("r"))
    }
    rank.orderBy(col("r").desc, col("node_t"), col("node_id")).limit(20)
      .select(col("node_t"), col("node_id"), col("r").as("rank_micro"))
  }

  private val pagerankSql = {
    val base =
      """WITH pairs AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS su
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (
        |  SELECT 'c' AS src_t, c AS src_id, 's' AS dst_t, su AS dst_id FROM pairs
        |  UNION ALL
        |  SELECT 's' AS src_t, su AS src_id, 'c' AS dst_t, c AS dst_id FROM pairs),
        |deg AS (
        |  SELECT src_t, src_id, CAST(count(*) AS BIGINT) AS outdeg
        |  FROM edges GROUP BY 1, 2),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |r0 AS (
        |  SELECT src_t AS node_t, src_id AS node_id,
        |    (SELECT 1000000000000 // n FROM nn) AS r
        |  FROM deg)""".stripMargin
    val rounds = (1 to Rounds).map { k =>
      s"""r$k AS (
         |  SELECT e.dst_t AS node_t, e.dst_id AS node_id,
         |    (SELECT (15 * (1000000000000 // n)) // 100 FROM nn)
         |      + (85 * CAST(sum(p.r // d.outdeg) AS BIGINT)) // 100 AS r
         |  FROM edges e
         |  JOIN r${k - 1} p ON e.src_t = p.node_t AND e.src_id = p.node_id
         |  JOIN deg d ON e.src_t = d.src_t AND e.src_id = d.src_id
         |  GROUP BY e.dst_t, e.dst_id)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"""
         |SELECT node_t, node_id, CAST(r AS BIGINT) AS rank_micro
         |FROM r$Rounds
         |ORDER BY r DESC, node_t, node_id LIMIT 20""".stripMargin
  }

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("graph_pagerank", pagerank, Some(pagerankSql)),
  )
}
