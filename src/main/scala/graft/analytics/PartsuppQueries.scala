package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The four TPC-H shapes that need `partsupp` (Q2 min-cost supplier,
  * Q9 product-type profit, Q11 important stock, Q20 potential part
  * promotion) — previously environment-blocked because TESTDATA
  * generates no partsupp table. Unblocked the same way the CDC
  * queries unblock Kafka envelopes: partsupp is SYNTHESIZED
  * deterministically inside the query from `part` × `supplier`-count
  * with pure integer arithmetic, and the DuckDB oracle re-derives the
  * identical rows in SQL — so the join/aggregate shapes are fully
  * oracle-gated without new inputs. Supply costs live in integer
  * CENTS end to end (no float anywhere near an aggregation), so
  * every engine pair agrees bit for bit.
  *
  * Scale shape: partsupp is 4×|part| rows of three longs, derived in
  * one narrow pass over `part` (no shuffle to build); each query then
  * shuffles on its join keys like any SF-scaled fact. Only the
  * fixed-size dims (nation, region) carry broadcast hints — supplier
  * scales with SF and stays on the shuffle path for AQE to decide.
  */
object PartsuppQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Deterministic synthetic partsupp: 4 suppliers per part
    * (`(p_partkey·97 + i·stride) mod |supplier| + 1`, i ∈ 0..3 with
    * stride = max(1, |supplier| div 4) — 3·stride < |supplier|, so the
    * four draws are distinct for ANY supplier count ≥ 4; a fixed
    * stride would collide whenever the count divides it), integer
    * availqty and supply cost in cents. Mirrored verbatim by
    * [[partsuppSql]].
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sCount = t(s, dir, "supplier").agg(count(lit(1)).as("s_total"))
    t(s, dir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(sCount))
      .select(col("p_partkey"), col("s_total"),
        explode(array((0 to 3).map(lit(_)): _*)).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") * 97 +
          col("i") * greatest(lit(1L), (col("s_total") / 4).cast("long")))
          % col("s_total") + 1)
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        ((col("p_partkey") * 7 + col("ps_suppkey") * 13) % 9999 + 1)
          .as("ps_availqty"),
        ((col("p_partkey") * 31 + col("ps_suppkey") * 7) % 10000 + 100)
          .as("ps_cost_cents"))
  }

  private val partsuppSql =
    """sc AS (SELECT count(*) AS s_total, greatest(1, count(*) // 4) AS stride
      |       FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey * 97 + i.i * stride) % s_total + 1 AS ps_suppkey,
      |    (p_partkey * 7 +
      |     ((p_partkey * 97 + i.i * stride) % s_total + 1)
      |       * 13) % 9999 + 1 AS ps_availqty,
      |    (p_partkey * 31 +
      |     ((p_partkey * 97 + i.i * stride) % s_total + 1)
      |       * 7) % 10000 + 100 AS ps_cost_cents
      |  FROM part CROSS JOIN sc CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i)""".stripMargin

  // -- Q2: minimum-cost supplier per part in a region ----------------------

  private def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val euSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // cand feeds BOTH the per-part minimum and the match-back join —
    // cache it or the three-table synthesis subtree runs twice
    val cand = graft.Caches.register(
      t(s, dir, "part").filter(col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand"))
        .join(partsupp(s, dir), col("p_partkey") === col("ps_partkey"))
        .join(euSupp, col("ps_suppkey") === col("s_suppkey")))
    val minCost = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("ps_cost_cents")).as("min_cents"))
    cand.join(minCost,
        col("p_partkey") === col("mk") && col("ps_cost_cents") === col("min_cents"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        col("ps_cost_cents").as("supplycost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    s"""WITH $partsuppSql,
       |eu AS (
       |  SELECT s_suppkey, s_name, s_acctbal, n_name
       |  FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'),
       |cand AS (
       |  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_cost_cents
       |  FROM part
       |  JOIN partsupp ON p_partkey = ps_partkey
       |  JOIN eu ON ps_suppkey = s_suppkey
       |  WHERE p_type = 'LARGE'),
       |mn AS (
       |  SELECT p_partkey AS mk, min(ps_cost_cents) AS min_cents
       |  FROM cand GROUP BY 1)
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       |  CAST(ps_cost_cents AS BIGINT) AS supplycost_cents
       |FROM cand JOIN mn ON p_partkey = mk AND ps_cost_cents = min_cents
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // -- Q9: product-type profit by nation and year --------------------------

  private def q9ProductProfit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_name").like("%widget%"))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(partsupp(s, dir),
        col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
        (round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long") -
          col("ps_cost_cents") * col("l_quantity").cast("long")).as("amount_cents"))
      .groupBy("nation", "o_year")
      .agg(sum("amount_cents").as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)

  private val q9Sql =
    s"""WITH $partsuppSql
       |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
       |      - ps_cost_cents * CAST(l_quantity AS BIGINT)) AS BIGINT)
       |    AS profit_cents
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // -- Q11: important stock (above-average inventory value) ----------------

  /** Q11 with a nation GROUP (`n_nationkey mod 5 = 2`, the Q7 trick —
    * one nation over a 10-supplier SF is near-empty) and an
    * average-relative threshold (`value > 2·avg`) instead of TPC-H's
    * SF-dependent fraction, so selectivity is stable across SFs.
    * All-integer compare: `value·n_parts > 2·total`.
    */
  private def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val grpSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .filter(pmod(col("n_nationkey"), lit(5)) === 2)
      .select(col("s_suppkey"))
    // perPart feeds both the grand total and the threshold filter —
    // cache it or the synthesis + join + aggregation runs twice
    val perPart = graft.Caches.register(partsupp(s, dir)
      .join(grpSupp, col("ps_suppkey") === col("s_suppkey"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("value_cents")))
    val tot = perPart.agg(sum("value_cents").as("total_cents"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("value_cents") * col("n_parts") > col("total_cents") * 2)
      .select(col("ps_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  private val q11Sql =
    s"""WITH $partsuppSql,
       |grp AS (
       |  SELECT s_suppkey FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_nationkey % 5 = 2),
       |per_part AS (
       |  SELECT ps_partkey,
       |    CAST(sum(ps_cost_cents * ps_availqty) AS BIGINT) AS value_cents
       |  FROM partsupp JOIN grp ON ps_suppkey = s_suppkey
       |  GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
       |    count(*) AS n_parts FROM per_part)
       |SELECT ps_partkey, value_cents
       |FROM per_part CROSS JOIN tot
       |WHERE value_cents * n_parts > total_cents * 2
       |ORDER BY value_cents DESC, ps_partkey""".stripMargin

  // -- Q20: potential part promotion ---------------------------------------

  /** Suppliers holding surplus stock of the promoted parts: availqty
    * exceeds half of what they actually shipped of that part in 1996
    * (`2·availqty > qty`, all-integer — quantities are integral).
    */
  private def q20PotentialPromotion(s: SparkSession, dir: String): DataFrame = {
    val coldParts = t(s, dir, "part").filter(col("p_name").like("cold%"))
      .select("p_partkey")
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    val qualifying = partsupp(s, dir)
      .join(coldParts, col("ps_partkey") === col("p_partkey"))
      .join(shipped,
        col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"),
        "left")
      .filter(col("ps_availqty") * 2 > coalesce(col("qty"), lit(0L)))
      .select(col("ps_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_name", "s_suppkey")
  }

  private val q20Sql =
    s"""WITH $partsuppSql,
       |shipped AS (
       |  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
       |  FROM lineitem
       |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
       |  GROUP BY 1, 2),
       |qualifying AS (
       |  SELECT DISTINCT ps_suppkey
       |  FROM partsupp
       |  JOIN part ON ps_partkey = p_partkey
       |  LEFT JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
       |  WHERE p_name LIKE 'cold%' AND ps_availqty * 2 > coalesce(qty, 0))
       |SELECT s_suppkey, s_name, n_name
       |FROM supplier
       |JOIN qualifying ON s_suppkey = ps_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |ORDER BY s_name, s_suppkey""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q2_min_cost_supplier", q2MinCostSupplier, Some(q2Sql)),
    QueryDef("q9_product_profit", q9ProductProfit, Some(q9Sql)),
    QueryDef("q11_important_stock", q11ImportantStock, Some(q11Sql)),
    QueryDef("q20_potential_promotion", q20PotentialPromotion, Some(q20Sql)),
  )
}
