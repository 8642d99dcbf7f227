package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second analytics block: semi-join EXISTS, distinct-count
  * aggregation, disjunctive predicate pushdown, cohort retention, and
  * element-wise vector aggregation (label centroids).
  */
object Queries2 extends QueryModule {

  // -- q4 shape: EXISTS semi-join ------------------------------------------
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00") &&
        col("o_orderdate") < lit("1997-07-01 00:00:00"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -- q16 shape: distinct-count aggregation -------------------------------
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir).filter(col("p_size") >= 20)
      .select("p_partkey", "p_brand", "p_type")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
      .limit(20)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_size >= 20
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type
      |LIMIT 20""".stripMargin

  // -- q19 shape: disjunctive multi-attribute predicates -------------------
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir).select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, dir).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 20) && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 30) && col("p_size").between(1, 15)) ||
        (col("p_type") === "PROMO" && col("l_quantity") >= 25))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
  }

  private val q19Sql =
    """SELECT round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size BETWEEN 1 AND 15)
      |   OR (p_type = 'PROMO' AND l_quantity >= 25)""".stripMargin

  // -- cohort retention ----------------------------------------------------
  private def retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val w1 = ev.filter(col("ts") >= lit("2024-01-01 00:00:00") && col("ts") < lit("2024-01-08 00:00:00"))
      .select("user_id").distinct()
    val w2 = ev.filter(col("ts") >= lit("2024-01-08 00:00:00") && col("ts") < lit("2024-01-15 00:00:00"))
      .select("user_id").distinct()
    w1.agg(count(lit(1)).as("week1_users"))
      .crossJoin(w1.join(w2, "user_id").agg(count(lit(1)).as("retained")))
  }

  /** The full cohort retention triangle (the matrix behind every
    * product-analytics retention chart): users cohorted by first-seen
    * week, each (cohort, week-offset) cell counting the distinct
    * users active that many weeks later. Scale shape: one distinct
    * (user, week) projection, a per-user min, one equi-join on the
    * unbounded user key — the output is bounded by weeks², and no
    * window ever partitions on a bounded key. Offsets are exact
    * integer day-diffs over week-truncated dates (multiples of 7, so
    * the division is IEEE-exact in any engine).
    */
  private def cohortMatrix(s: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(s, dir)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val first = activity.groupBy("user_id").agg(min("week").as("cohort_week"))
    activity.join(first, "user_id")
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private val cohortMatrixSql =
    """WITH activity AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |first AS (SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY 1)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM activity JOIN first USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val retentionSql =
    """WITH w1 AS (SELECT DISTINCT user_id FROM events
      |            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'),
      |w2 AS (SELECT DISTINCT user_id FROM events
      |       WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00')
      |SELECT (SELECT count(*) FROM w1) AS week1_users,
      |       (SELECT count(*) FROM w1 JOIN w2 USING (user_id)) AS retained""".stripMargin

  // -- element-wise vector aggregation: per-label centroids ----------------
  private def centroids(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "e")))
      .groupBy("label", "i")
      .agg(avg(col("e").cast("double")).as("m"))
    val norms = dims.groupBy("label")
      .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
    val counts = Tables.embeddings(s, dir).groupBy("label").agg(count(lit(1)).as("n_vecs"))
    counts.join(norms, "label")
      .select(col("label"), col("n_vecs"), col("centroid_norm"))
      .orderBy("label")
  }

  private val centroidsSql =
    """WITH u AS (
      |  SELECT label,
      |    unnest(range(1, len(embedding)+1)) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS e
      |  FROM embeddings),
      |c AS (SELECT label, i, avg(e) AS m FROM u GROUP BY 1, 2),
      |norms AS (SELECT label, round(sqrt(sum(m*m)),6) AS centroid_norm FROM c GROUP BY label),
      |counts AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
      |SELECT counts.label, n_vecs, centroid_norm
      |FROM counts JOIN norms ON counts.label = norms.label
      |ORDER BY counts.label""".stripMargin

  // -- custom top-k-per-key physical operator ------------------------------
  private def topkCustom(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perKey(Tables.orders(s, dir),
        keyCols = Seq("o_orderpriority"),
        ordering = Seq(col("o_totalprice"), -col("o_orderkey")), k = 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("rank"),
        round(col("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority", "rank")

  private val topkCustomSql =
    """SELECT o_orderpriority, o_orderkey, rank, round(o_totalprice,2) AS total_price
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
      |  FROM orders)
      |WHERE rank <= 3
      |ORDER BY o_orderpriority, rank""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q4_order_priority", q4, Some(q4Sql)),
    QueryDef("q16_supplier_counts", q16, Some(q16Sql)),
    QueryDef("q19_disjunctive_preds", q19, Some(q19Sql)),
    QueryDef("events_retention", retention, Some(retentionSql)),
    QueryDef("events_cohort_matrix", cohortMatrix, Some(cohortMatrixSql)),
    QueryDef("embed_centroids", centroids, Some(centroidsSql)),
    QueryDef("topk_custom_operator", topkCustom, Some(topkCustomSql)),
  )
}
