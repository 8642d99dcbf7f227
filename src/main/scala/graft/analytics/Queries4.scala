package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth analytics block: the remaining join-heavy TPC-H shapes the
  * testdata schema supports — bi-directional nation trade (Q7),
  * market share with a two-role dimension (Q8), and the
  * anti-join + scalar-subquery prospect scan (Q22). Scale shape:
  * every SF-scaled table (lineitem, orders, customer, supplier,
  * part) shuffles on its join keys under AQE; only the fixed-size
  * dims (nation, region) carry broadcast hints.
  */
object Queries4 extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -- Q7: volume shipping between two nations -----------------------------

  /** Q7 with nation GROUPS (nationkey mod 5) instead of a single
    * nation pair — 25 nations over small SFs make any one pair
    * near-empty, and a 0-row gate row verifies nothing.
    */
  private def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1997-12-31"))
    val n1 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"),
        pmod(col("n_nationkey"), lit(5)).as("s_grp")))
    val n2 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"),
        pmod(col("n_nationkey"), lit(5)).as("c_grp")))
    li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nkey"))
      .join(n2, col("c_nationkey") === col("c_nkey"))
      .filter((col("s_grp") === 1 && col("c_grp") === 2) ||
              (col("s_grp") === 2 && col("c_grp") === 1))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      // decimal accumulation: float sums depend on partition order and
      // can flip the cent-rounding between engines on large groups
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double"), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  round(CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year,
      |    l_extendedprice * (1 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
      |    AND ((n1.n_nationkey % 5 = 1 AND n2.n_nationkey % 5 = 2)
      |      OR (n1.n_nationkey % 5 = 2 AND n2.n_nationkey % 5 = 1)))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -- Q8: market share of one nation in one region ------------------------

  private def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = broadcast(t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("n_nationkey").as("c_nkey")))
    val suppNation = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
    val promoParts = t(s, dir, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
    t(s, dir, "lineitem")
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(asiaNations, col("c_nationkey") === col("c_nkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nkey"))
      .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0.0)
            .cast("decimal(18,6)")).cast("double") /
          sum(col("volume").cast("decimal(18,6)")).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  private val q8Sql =
    """SELECT o_year,
      |  round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
      |  / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume,
      |    n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  // -- Q13: customer order-count distribution ------------------------------

  /** Left-outer join with an extra join-side predicate, then a
    * two-level aggregation (count per customer → distribution of
    * counts). Zero-order customers must survive the outer join — the
    * shape that breaks if the filter is wrongly pushed below the
    * join's null-producing side.
    */
  private def q13OrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
    t(s, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -- Q22: prospects (above-average balance, never ordered) ---------------

  /** Anti-join + scalar aggregate: customers whose balance beats the
    * positive-balance average and who have gone dormant (no orders
    * since 2000 — "never ordered" is empty at every SF because the
    * generator gives all customers early orders, which would make the
    * gate row vacuous). The threshold is one value (bounded driver
    * fetch); the NOT EXISTS is a left-anti shuffle join on custkey.
    */
  private def q22Prospects(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val avgRow = cust.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal")).head() // scalar, bounded
    // null average (no positive balances) → empty result, matching
    // the oracle's NULL scalar subquery, not an NPE
    if (avgRow.isNullAt(0))
      return cust.filter(lit(false))
        .groupBy(col("c_nationkey").as("nation_key"))
        .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
    val threshold = avgRow.getDouble(0)
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "2000-01-01")
      .select(col("o_custkey").as("c_custkey"))
    cust.filter(col("c_acctbal") > threshold)
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation_key"))
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("nation_key")
  }

  private val q22Sql =
    """SELECT c_nationkey AS nation_key, CAST(count(*) AS BIGINT) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= DATE '2000-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q7_volume_shipping", q7VolumeShipping, Some(q7Sql)),
    QueryDef("q8_market_share", q8MarketShare, Some(q8Sql)),
    QueryDef("q13_order_distribution", q13OrderDistribution, Some(q13Sql)),
    QueryDef("q22_prospects", q22Prospects, Some(q22Sql)),
  )
}
