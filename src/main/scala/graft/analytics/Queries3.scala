package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.ops.AsOf
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third analytics block: as-of join, exact percentiles, rollup
  * subtotals, pivot, and gap-filled time series.
  */
object Queries3 extends QueryModule {

  // -- as-of join: ms since the user's latest signup -----------------------
  private def asofSignup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val left = ev.filter(col("event_type") =!= "signup")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    AsOf.joinLatestAtOrBefore(left, signups,
        keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        valueCol = "signup_ts", asofCol = "signup_ts")
      .select(col("event_id"), col("user_id"),
        (unix_millis(col("ts").cast("timestamp")) -
          unix_millis(col("signup_ts").cast("timestamp"))).as("ms_since_signup"))
      .orderBy("event_id")
  }

  private val asofSignupSql =
    """SELECT e.event_id, e.user_id,
      |  epoch_ms(e.ts) - epoch_ms(s.ts) AS ms_since_signup
      |FROM (SELECT * FROM events WHERE event_type <> 'signup') e
      |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin

  // -- bucketed range join: clicks in the hour before each purchase --------
  private def windowJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
    graft.ops.RangeJoin.joinWindowBefore(purchases, clicks,
        keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        windowSeconds = 3600, matchedCol = "click_ts")
      .groupBy("user_id", "event_id")
      .agg(count("click_ts").as("n_clicks_1h"))
      .orderBy("user_id", "event_id")
  }

  private val windowJoinSql =
    """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.user_id, p.event_id, CAST(count(c.ts) AS BIGINT) AS n_clicks_1h
      |FROM p LEFT JOIN c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- exact percentiles ---------------------------------------------------
  private def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  private val percentilesSql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- rollup subtotals ----------------------------------------------------
  private def ordersRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  private val ordersRollupSql =
    """SELECT o_orderpriority, o_orderstatus,
      |  round(sum(o_totalprice),2) AS total, count(*) AS n
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // -- pivot ---------------------------------------------------------------
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def eventsPivot(s: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .count()
    EventTypes.foldLeft(pivoted) { (df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L)))
      }
      .orderBy("user_id")
  }

  private val eventsPivotSql = {
    val cases = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(",\n  ")
    s"""SELECT user_id,
       |  $cases
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // -- gap-filled daily series ---------------------------------------------
  private def dailyGapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val days = ev.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    days.join(daily, Seq("d"), "left")
      .select(col("d"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("d")
  }

  private val dailyGapfillSql =
    """WITH bounds AS (
      |  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
      |days AS (
      |  SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM bounds),
      |daily AS (
      |  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT days.d, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n
      |FROM days LEFT JOIN daily ON days.d = daily.d
      |ORDER BY days.d""".stripMargin

  /** Inter-arrival gap distribution per event type — the cadence /
    * rate-anomaly signal (bot cadences are tight, human ones heavy-
    * tailed): per-user consecutive gaps in seconds (lag window over
    * user_id — key cardinality scales with the data, never a bounded-
    * key window), exact percentiles per the type of the LATER event.
    * Gaps are EXACT integer microseconds (`unix_micros` ↔ DuckDB
    * `epoch_us` — the events ts carries sub-second precision, so
    * whole-second truncation would disagree between engines);
    * percentiles report in seconds at 4 dp.
    */
  private def interArrival(s: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp"))
          - unix_micros(lag("ts", 1).over(byUser).cast("timestamp")))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(gap_us, 0.5)") / 1000000.0, 4).as("p50"),
        round(expr("percentile(gap_us, 0.9)") / 1000000.0, 4).as("p90"),
        round(expr("percentile(gap_us, 0.99)") / 1000000.0, 4).as("p99"),
        count(lit(1)).as("n_gaps"))
      .orderBy("event_type")
  }

  private val interArrivalSql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      |  FROM events)
      |SELECT event_type,
      |  round(quantile_cont(gap_us, 0.5) / 1000000.0, 4) AS p50,
      |  round(quantile_cont(gap_us, 0.9) / 1000000.0, 4) AS p90,
      |  round(quantile_cont(gap_us, 0.99) / 1000000.0, 4) AS p99,
      |  CAST(count(gap_us) AS BIGINT) AS n_gaps
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("events_inter_arrival", interArrival, Some(interArrivalSql)),
    QueryDef("events_asof_signup", asofSignup, Some(asofSignupSql)),
    QueryDef("events_window_join", windowJoin, Some(windowJoinSql)),
    QueryDef("events_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("orders_rollup", ordersRollup, Some(ordersRollupSql)),
    QueryDef("events_pivot", eventsPivot, Some(eventsPivotSql)),
    QueryDef("events_daily_gapfill", dailyGapfill, Some(dailyGapfillSql)),
  )
}
