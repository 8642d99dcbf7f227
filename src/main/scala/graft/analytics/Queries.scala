package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics block: TPC-H-shaped queries over the star schema plus
  * event-log analytics (windows, sessions, JSON, funnels).
  *
  * Scale notes (100 TB): explicit `broadcast()` only on TRUE
  * dimensions — region (5 rows) and nation (25 rows), whose
  * cardinality is fixed by the schema. EVERY generated table —
  * lineitem, orders, customer, part, supplier — grows linearly with
  * SF, so their joins shuffle on the join key and AQE is left to
  * broadcast at runtime when a (possibly filtered) side is genuinely
  * small — a forced broadcast there is a guaranteed driver/executor
  * OOM at scale. Aggregates are declarative so Catalyst does map-side
  * partial aggregation; all numeric outputs are rounded so results
  * are stable across summation orders.
  *
  * Capability parity target: the analytics surface a lake populated by
  * the reference pipeline (norrishuang/cdc-data-lake-pyspark) would be
  * queried with downstream.
  */
object Queries extends QueryModule {

  // -- q1: full-scan aggregate (TPC-H Q1 shape) ----------------------------
  private def q1(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity),2) AS sum_qty,
      |  round(sum(l_extendedprice),2) AS sum_base_price,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      |  round(avg(l_quantity),4) AS avg_qty,
      |  round(avg(l_extendedprice),4) AS avg_price,
      |  round(avg(l_discount),4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- q3: selective 3-way join + top-k ------------------------------------
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-03-15 00:00:00"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // orders and customer scale with SF: shuffle joins (AQE may still
    // broadcast the filtered sides at runtime when actually small)
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // -- q5: star join with all dims broadcast -------------------------------
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") && col("o_orderdate") < lit("1997-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    // facts (lineitem, orders, customer) shuffle on their keys; only
    // the true dims (supplier, nation, region) are forced broadcasts
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // -- q6: selective filter aggregate (pushdown showcase) ------------------
  private def q6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n"))

  private val q6Sql =
    """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // -- q10: returned items ranked by revenue -------------------------------
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nation = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") && col("o_orderdate") < lit("1996-07-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      |  round(c_acctbal,2) AS acctbal, n_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // -- q12: conditional counts by priority (Q12 shape on available cols) ---
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") && col("l_shipdate") < lit("1997-01-01 00:00:00"))
      .select("l_orderkey", "l_linestatus")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("l_linestatus") === "F", 1).otherwise(0)).as("f_lines"),
        sum(when(col("l_linestatus") === "O", 1).otherwise(0)).as("o_lines"))
      .orderBy("o_orderpriority")
  }

  private val q12Sql =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_lines,
      |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_lines
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -- q14: promo revenue ratio --------------------------------------------
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir).select("p_partkey", "p_type")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") && col("l_shipdate") < lit("1997-01-01 00:00:00"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO", col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0))
          / sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("promo_revenue"))
  }

  private val q14Sql =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END)
      |        / sum(l_extendedprice*(1-l_discount)), 4) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'""".stripMargin

  // -- q18: large-quantity orders (agg + having + join) --------------------
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 120)
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name")
    bigOrders.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("total_price"), round(col("qty"), 2).as("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  round(o_totalprice,2) AS total_price, round(sum(l_quantity),2) AS sum_qty
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |HAVING sum(l_quantity) > 120
      |ORDER BY total_price DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // -- top-k per group via the bounded-heap TopKPerKey operator ------------
  // NOT a row_number window: partitionBy("c_mktsegment") has <= 5
  // distinct values, so the window would sort EVERY customer on <= 5
  // reducers at any scale. TopK.perKey keeps a k-row heap per key with
  // map-side pruning, so the shuffle carries <= mappers*keys*k rows.
  private def topCustomers(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(round(sum("o_totalprice"), 2).as("total_spend"))
    // descending lexicographic ordering: spend desc, custkey asc
    graft.plans.TopK.perKey(spend, Seq("c_mktsegment"),
        Seq(col("total_spend"), -col("c_custkey")), k = 3, rankCol = "rnk")
      .select("c_mktsegment", "c_custkey", "total_spend", "rnk")
      .orderBy("c_mktsegment", "rnk")
  }

  private val topCustomersSql =
    """SELECT c_mktsegment, c_custkey, total_spend, rnk FROM (
      |  SELECT c_mktsegment, c_custkey, total_spend,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY total_spend DESC, c_custkey) AS rnk
      |  FROM (
      |    SELECT c_mktsegment, c_custkey, round(sum(o_totalprice),2) AS total_spend
      |    FROM orders JOIN customer ON o_custkey = c_custkey
      |    GROUP BY c_mktsegment, c_custkey))
      |WHERE rnk <= 3
      |ORDER BY c_mktsegment, rnk""".stripMargin

  // -- events: tumbling hourly aggregation ---------------------------------
  private def eventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_ts", "event_type")

  private val eventsHourlySql =
    """SELECT date_trunc('hour', ts) AS hour_ts, event_type,
      |  count(*) AS n, round(sum(value),2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // -- events: 30-minute-gap sessionization (batch form) -------------------
  private def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStart = Tables.events(s, dir)
      .select("user_id", "ts", "event_id")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > expr("INTERVAL '30' MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum("is_start").over(cum))
    withStart.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max("n").as("max_session_events"), sum("n").as("n_events"))
      .orderBy("user_id")
  }

  private val eventsSessionizeSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged
      |), per_session AS (
      |  SELECT user_id, session_id, count(*) AS n FROM sessions GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events,
      |  CAST(sum(n) AS BIGINT) AS n_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- events: JSON property extraction ------------------------------------
  private def eventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  private val eventsJsonSql =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- events: ordered funnel ----------------------------------------------
  private def eventsFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        sum(when(col("t_click") > col("t_signup"), 1).otherwise(0)).as("n_signup_click"),
        sum(when(col("t_purchase") > col("t_click") && col("t_click") > col("t_signup"), 1).otherwise(0)).as("n_full_funnel"))

  private val eventsFunnelSql =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users, count(t_signup) AS n_signup,
      |  CAST(sum(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
      |  CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM f""".stripMargin

  // -- skew-salted join (5 hot keys spread over 16 salts) ------------------
  private def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id", "event_type", "value")
    val dim = Tables.events(s, dir).groupBy("event_type")
      .agg(round(avg("value"), 4).as("type_avg"))
    graft.ops.Skew.saltedJoin(ev, dim, "event_type", col("event_id"), salts = 16)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum(abs(col("value") - col("type_avg"))), 2).as("sum_abs_dev"))
      .orderBy("event_type")
  }

  private val skewSaltedJoinSql =
    """WITH dim AS (
      |  SELECT event_type, round(avg(value),4) AS type_avg FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  round(sum(abs(e.value - d.type_avg)),2) AS sum_abs_dev
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", q1, Some(q1Sql)),
    QueryDef("q3_shipping_priority", q3, Some(q3Sql)),
    QueryDef("q5_local_supplier", q5, Some(q5Sql)),
    QueryDef("q6_revenue_change", q6, Some(q6Sql)),
    QueryDef("q10_returned_items", q10, Some(q10Sql)),
    QueryDef("q12_priority_shipping", q12, Some(q12Sql)),
    QueryDef("q14_promo_revenue", q14, Some(q14Sql)),
    QueryDef("q18_large_orders", q18, Some(q18Sql)),
    QueryDef("top_customers_by_spend", topCustomers, Some(topCustomersSql)),
    QueryDef("events_hourly", eventsHourly, Some(eventsHourlySql)),
    QueryDef("events_sessionize", eventsSessionize, Some(eventsSessionizeSql)),
    QueryDef("events_json_extract", eventsJson, Some(eventsJsonSql)),
    QueryDef("events_funnel", eventsFunnel, Some(eventsFunnelSql)),
    QueryDef("skew_salted_join", skewSaltedJoin, Some(skewSaltedJoinSql)),
  )
}
