package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth analytics block: marketing/ops queries a production events
  * pipeline runs daily — multi-touch attribution, time-decayed
  * activity scoring, and the column-profile health report.
  */
object Queries6 extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -- multi-touch attribution ---------------------------------------------

  /** First-touch / last-touch attribution: each purchase credits the
    * campaign (the `props.k` tag) of its earliest and latest
    * click/view touch in the 72h before it. The purchase↔touch
    * pairing is the bucketed band join ([[graft.ops.RangeJoin]]) — an
    * EQUI-join on (user, 72h-bucket), linear in input, not the
    * per-key nested loop Spark plans for a raw inequality join. The
    * per-purchase argmin/argmax is `min/max(struct(ts, campaign))`
    * (lexicographic, deterministic under ties); the final per-campaign
    * matrix is two bounded-cardinality counts full-outer-joined.
    */
  private def attribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val touches = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("touch_ts"),
        get_json_object(col("props"), "$.k").cast("int").as("campaign"))
    val pairs = graft.ops.RangeJoin.pairsWindowBefore(
      purchases, touches, Seq("user_id"),
      "ts", "touch_ts", 72 * 3600L, "t_ts", Seq("campaign"))
    val attr = pairs.groupBy("event_id")
      .agg(
        min(struct(col("t_ts"), col("campaign"))).getField("campaign").as("first_c"),
        max(struct(col("t_ts"), col("campaign"))).getField("campaign").as("last_c"))
    val first = attr.groupBy(col("first_c").as("campaign"))
      .agg(count(lit(1)).as("first_touch"))
    val last = attr.groupBy(col("last_c").as("campaign"))
      .agg(count(lit(1)).as("last_touch"))
    first.join(last, Seq("campaign"), "full_outer")
      .select(col("campaign"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
      .orderBy("campaign")
  }

  private val attributionSql =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts AS touch_ts, CAST(props->>'k' AS INT) AS campaign
      |      FROM events WHERE event_type IN ('click','view')),
      |pairs AS (
      |  SELECT p.event_id, t.touch_ts, t.campaign FROM p JOIN t
      |  ON p.user_id = t.user_id
      |    AND t.touch_ts >= p.ts - INTERVAL 72 HOUR AND t.touch_ts < p.ts),
      |ranked AS (
      |  SELECT event_id, campaign,
      |    row_number() OVER (PARTITION BY event_id ORDER BY touch_ts ASC,  campaign ASC)  AS rf,
      |    row_number() OVER (PARTITION BY event_id ORDER BY touch_ts DESC, campaign DESC) AS rl
      |  FROM pairs),
      |attr AS (SELECT event_id,
      |    max(CASE WHEN rf = 1 THEN campaign END) AS first_c,
      |    max(CASE WHEN rl = 1 THEN campaign END) AS last_c
      |  FROM ranked GROUP BY 1),
      |f AS (SELECT first_c AS campaign, CAST(count(*) AS BIGINT) AS first_touch FROM attr GROUP BY 1),
      |l AS (SELECT last_c  AS campaign, CAST(count(*) AS BIGINT) AS last_touch  FROM attr GROUP BY 1)
      |SELECT campaign,
      |  coalesce(first_touch, 0) AS first_touch,
      |  coalesce(last_touch, 0)  AS last_touch
      |FROM f FULL JOIN l USING (campaign)
      |ORDER BY campaign""".stripMargin

  // -- time-decayed activity scores ----------------------------------------

  /** Half-life-decayed campaign activity (the "trending" score):
    * events are aggregated to (campaign, day) counts FIRST — at 100 TB
    * the decay math runs over a campaigns×days table, not raw events —
    * then each day is weighted by 2^(-weeks_ago) relative to the
    * newest day in the data (a 1-row broadcast aggregate, no window).
    * Weights are computed in INTEGER arithmetic (cnt·2^(10−wk), then
    * one exact dyadic division by 2^10 at the report edge) so no
    * float rounding can differ between engines. Days older than the
    * 10-week horizon are dropped OUTRIGHT (weight < 1/1024 ≈ noise)
    * — which also keeps the shift exponent in [0, 10]; without the
    * horizon a >70-day corpus would wrap the JVM's mod-64 shift.
    */
  private def decayedScores(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("campaign"),
        to_date(col("ts")).as("d"))
    val daily = e.groupBy("campaign", "d").agg(count(lit(1)).as("cnt"))
    val anchor = daily.agg(max(col("d")).as("maxd"))
    daily.crossJoin(broadcast(anchor))
      .withColumn("wk", expr("datediff(maxd, d) div 7"))
      .filter(col("wk") <= 10)
      .groupBy("campaign")
      .agg((sum(expr("cnt * shiftleft(cast(1 as bigint), cast(10 - wk as int))"))
        .cast("double") / 1024.0).as("decayed_score"))
      .orderBy("campaign")
  }

  private val decayedScoresSql =
    """WITH e AS (SELECT CAST(props->>'k' AS INT) AS campaign, CAST(ts AS DATE) AS d FROM events),
      |daily AS (SELECT campaign, d, count(*) AS cnt FROM e GROUP BY 1, 2),
      |anchor AS (SELECT max(d) AS maxd FROM daily)
      |SELECT campaign,
      |  CAST(sum(cnt * (CAST(1 AS BIGINT) << CAST(10 - date_diff('day', d, maxd) // 7 AS INT))) AS DOUBLE)
      |    / 1024.0 AS decayed_score
      |FROM daily, anchor
      |WHERE date_diff('day', d, maxd) // 7 <= 10
      |GROUP BY campaign ORDER BY campaign""".stripMargin

  // -- column profile --------------------------------------------------------

  /** The lineitem column-health profile ([[graft.ops.Profile]]): one
    * scan, one expand-based multi-distinct aggregation, stacked to a
    * row per column. Non-numeric min/max stay null — their rendering
    * is engine-specific; the counts are not.
    */
  private def profileLineitem(s: SparkSession, dir: String): DataFrame =
    // parallel(): the expand-based multi-distinct multiplies every row
    // 11× BEFORE the first exchange, and the single-file testdata scan
    // pins that to 3 splits — restore worker parallelism ahead of it
    // (no-op at production split counts)
    graft.ops.Profile.columns(
      Tables.parallel(t(s, dir, "lineitem")),
      numericCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      otherCols = Seq("l_returnflag", "l_linestatus", "l_shipdate"))

  private val profileLineitemSql = {
    val numeric = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val others = Seq("l_returnflag", "l_linestatus", "l_shipdate")
    val parts = (numeric.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(count(*) - count($c) AS BIGINT) AS null_cnt,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num
         |FROM lineitem""".stripMargin
    } ++ others.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(count(*) - count($c) AS BIGINT) AS null_cnt,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
         |FROM lineitem""".stripMargin
    })
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // -- windowed sequential funnel ------------------------------------------

  /** Time-constrained SEQUENTIAL funnel (the windowFunnel semantic):
    * the first click within 72h AFTER the user's first signup, then
    * the first purchase within 72h after THAT click — unlike
    * `events_funnel`'s independent per-type minima, each step is
    * anchored on the previous step's achieved timestamp. Each step is
    * one equi-join on the unbounded user key + a min aggregation —
    * no per-user event array ever materializes, no window function.
    */
  private def funnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 72 HOUR"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 72 HOUR"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_click_72h")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase_72h")))
  }

  private val funnelWindowedSql =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click'
      |         AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 72 HOUR GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase'
      |         AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 72 HOUR GROUP BY 1)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
      |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_72h,
      |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_72h""".stripMargin

  // -- top session paths ---------------------------------------------------

  /** Top-20 session paths (the product-analytics "user flows" view):
    * 30-min-gap sessionization, each session reduced to its first 5
    * event types joined `a>b>c`, paths counted globally. The
    * per-session prefix is cut by a row_number BEFORE any array forms
    * — per-group state is ≤5 structs no matter how long a session
    * runs; the sessionizing windows partition on the unbounded
    * user key. Final top-20 is a TakeOrdered with a total-order
    * tiebreak on the path string.
    */
  private def topPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, dir)
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > expr("INTERVAL '30' MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum("is_start").over(cum))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")))
      .filter(col("rn") <= 5)
    sess.groupBy("user_id", "session_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"),
        ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path")).limit(20)
  }

  private val topPathsSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
      |                               ORDER BY ts, event_id) AS rn
      |  FROM sessions),
      |paths AS (
      |  SELECT user_id, session_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 5 GROUP BY 1, 2)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      |FROM paths GROUP BY 1
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  // -- deterministic A/B split lift ----------------------------------------

  /** A/B experiment readout on a deterministic hash split: users are
    * assigned variant = ascii(md5(user_id)[0]) mod 2 — the same
    * engine-portable md5-bucket trick as `docs_split`, so assignment
    * is reproducible anywhere, no stored assignment table. Conversion
    * = user has a purchase event. One per-user aggregation, then a
    * 2-row variant rollup; the rate divides two small exact counts.
    */
  private def abLift(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max((col("event_type") === "purchase").cast("int")).as("converted"))
      .withColumn("variant",
        expr("ascii(substring(md5(cast(user_id as string)), 1, 1)) % 2"))
    per.groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum("converted").cast("bigint").as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_users"), 6))
      .orderBy("variant")
  }

  private val abLiftSql =
    """WITH per AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
      |    ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS variant
      |  FROM events GROUP BY user_id)
      |SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(converted) AS BIGINT) AS n_converted,
      |  round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conv_rate
      |FROM per GROUP BY variant ORDER BY variant""".stripMargin

  // -- time-series similarity ----------------------------------------------

  /** Top-10 most-similar campaign pairs by squared euclidean distance
    * between their daily activity series (time-series similarity
    * search over aggregated series, cf. EDBT'19 streaming-series
    * search). The distance uses the norm+dot decomposition —
    * d²(a,b) = ‖a‖² + ‖b‖² − 2⟨a,b⟩ — so the cross-term equi-joins
    * only on days where BOTH series are active (sparse dot product;
    * absent days contribute zero by construction), and the pairwise
    * stage is bounded by campaigns², never days×campaigns². All
    * arithmetic is exact BIGINT on integer counts.
    */
  private def tsSimilarityPairs(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("campaign"),
        to_date(col("ts")).as("d"))
      .groupBy("campaign", "d").agg(count(lit(1)).as("cnt"))
    val norms = daily.groupBy("campaign").agg(sum(col("cnt") * col("cnt")).as("n2"))
    val dots = daily.as("a").join(daily.as("b"),
        col("a.d") === col("b.d") && col("a.campaign") < col("b.campaign"))
      .groupBy(col("a.campaign").as("ca"), col("b.campaign").as("cb"))
      .agg(sum(col("a.cnt") * col("b.cnt")).as("dot"))
    val na = norms.select(col("campaign").as("ca"), col("n2").as("n2a"))
    val nb = norms.select(col("campaign").as("cb"), col("n2").as("n2b"))
    na.join(nb, col("ca") < col("cb"))
      .join(dots, Seq("ca", "cb"), "left")
      .select(col("ca"), col("cb"),
        (col("n2a") + col("n2b") - lit(2) * coalesce(col("dot"), lit(0L))).as("dist2"))
      .orderBy(col("dist2"), col("ca"), col("cb")).limit(10)
  }

  private val tsSimilarityPairsSql =
    """WITH daily AS (
      |  SELECT CAST(props->>'k' AS INT) AS campaign, CAST(ts AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |norms AS (SELECT campaign, sum(cnt * cnt) AS n2 FROM daily GROUP BY 1),
      |dots AS (
      |  SELECT a.campaign AS ca, b.campaign AS cb, sum(a.cnt * b.cnt) AS dot
      |  FROM daily a JOIN daily b ON a.d = b.d AND a.campaign < b.campaign
      |  GROUP BY 1, 2)
      |SELECT na.campaign AS ca, nb.campaign AS cb,
      |  CAST(na.n2 + nb.n2 - 2 * coalesce(dot, 0) AS BIGINT) AS dist2
      |FROM norms na JOIN norms nb ON na.campaign < nb.campaign
      |LEFT JOIN dots ON dots.ca = na.campaign AND dots.cb = nb.campaign
      |ORDER BY dist2, ca, cb LIMIT 10""".stripMargin

  // -- OLS trend via sufficient statistics ---------------------------------

  /** Per-campaign linear trend of daily spend (least-squares slope):
    * regression at scale is ONE aggregation of sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) — no iterative solver, no per-group sort.
    * x is an integer day index off a 1-row broadcast anchor; y
    * accumulates in decimal, so every statistic is exact and the
    * single closed-form division (with a round at the report edge) is
    * the only float op. Campaigns with <2 active days are excluded —
    * their slope is undefined (zero denominator).
    */
  private def valueTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("campaign"),
        to_date(col("ts")).as("d"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("campaign", "d").agg(sum("v").as("y"))
    val anchor = daily.agg(min("d").as("d0"))
    daily.crossJoin(broadcast(anchor))
      .withColumn("x", datediff(col("d"), col("d0")).cast("long"))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"))
      .filter(col("n_days") >= 2)
      .select(col("campaign"), col("n_days"),
        round(
          (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n_days") * col("sx2") - col("sx") * col("sx")).cast("double"),
          6).as("slope"))
      .orderBy("campaign")
  }

  private val valueTrendSql =
    """WITH daily AS (
      |  SELECT CAST(props->>'k' AS INT) AS campaign, CAST(ts AS DATE) AS d,
      |    sum(CAST(value AS DECIMAL(18,6))) AS y
      |  FROM events GROUP BY 1, 2),
      |anchor AS (SELECT min(d) AS d0 FROM daily),
      |stats AS (
      |  SELECT campaign, CAST(count(*) AS BIGINT) AS n_days,
      |    sum(date_diff('day', d0, d)) AS sx, sum(y) AS sy,
      |    sum(date_diff('day', d0, d) * y) AS sxy,
      |    sum(date_diff('day', d0, d) * date_diff('day', d0, d)) AS sx2
      |  FROM daily, anchor GROUP BY 1)
      |SELECT campaign, n_days,
      |  round(CAST(n_days * sxy - sx * sy AS DOUBLE) /
      |        CAST(n_days * sx2 - sx * sx AS DOUBLE), 6) AS slope
      |FROM stats WHERE n_days >= 2 ORDER BY campaign""".stripMargin

  // -- CUBE lattice ---------------------------------------------------------

  /** Full CUBE over (order-year, status): every cell of the 2-D
    * rollup lattice plus both marginals and the grand total, with
    * `grouping_id` disambiguating real NULLs from aggregated-out
    * dims. CUBE compiles to one Expand + one aggregation — 4× the
    * agg input here, never 4 scans. Money sums in decimal, rounded
    * once at the edge.
    */
  private def ordersCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(year(to_date(col("o_orderdate"))).as("yr"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(18,6)").as("price"))
      .cube("yr", "status")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        round(sum("price").cast("double"), 2).as("total_price"))
      .select("gid", "yr", "status", "n_orders", "total_price")
      .orderBy(col("gid"), col("yr").asc_nulls_first, col("status").asc_nulls_first)

  private val ordersCubeSql =
    """SELECT CAST(GROUPING(yr, status) AS BIGINT) AS gid, yr, status,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(CAST(sum(price) AS DOUBLE), 2) AS total_price
      |FROM (SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
      |        o_orderstatus AS status,
      |        CAST(o_totalprice AS DECIMAL(18,6)) AS price FROM orders)
      |GROUP BY CUBE (yr, status)
      |ORDER BY gid, yr NULLS FIRST, status NULLS FIRST""".stripMargin

  // -- backlog burndown -----------------------------------------------------

  /** Monthly order-backlog burndown (event-sourced open-order curve):
    * orders "open" at month M = opened up to M minus completed up to
    * M, where an order completes when its LAST lineitem ships. Both
    * event streams aggregate to the bounded month domain FIRST; the
    * cumulative net is the distributed prefix sum
    * ([[graft.ops.PrefixSum]]) — no global-order window, no single
    * reducer holding the whole timeline even if the domain were not
    * bounded.
    */
  private def ordersBacklog(s: SparkSession, dir: String): DataFrame = {
    val opened = t(s, dir, "orders")
      .select(date_trunc("month", to_date(col("o_orderdate"))).cast("date").as("m"))
      .groupBy("m").agg(count(lit(1)).as("opened"))
    val completed = t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(max(to_date(col("l_shipdate"))).as("done"))
      .select(date_trunc("month", col("done")).cast("date").as("m"))
      .groupBy("m").agg(count(lit(1)).as("completed"))
    val monthly = opened.join(completed, Seq("m"), "full_outer")
      .select(col("m"),
        coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("completed"), lit(0L)).as("completed"))
      .withColumn("_net", col("opened") - col("completed"))
      .withColumn("_g", lit(1))
    graft.ops.PrefixSum.runningTotal(monthly, "_g", Seq("m"), "_net", "backlog")
      .select("m", "opened", "completed", "backlog")
      .orderBy("m")
  }

  private val ordersBacklogSql =
    """WITH opened AS (
      |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m,
      |    CAST(count(*) AS BIGINT) AS opened
      |  FROM orders GROUP BY 1),
      |done AS (
      |  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS done
      |  FROM lineitem GROUP BY 1),
      |completed AS (
      |  SELECT CAST(date_trunc('month', done) AS DATE) AS m,
      |    CAST(count(*) AS BIGINT) AS completed
      |  FROM done GROUP BY 1),
      |monthly AS (
      |  SELECT coalesce(o.m, c.m) AS m,
      |    coalesce(opened, 0) AS opened, coalesce(completed, 0) AS completed
      |  FROM opened o FULL JOIN completed c ON o.m = c.m)
      |SELECT m, opened, completed,
      |  CAST(sum(opened - completed) OVER (ORDER BY m
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
      |FROM monthly ORDER BY m""".stripMargin

  // -- referential-integrity audit -----------------------------------------

  /** Referential-integrity audit across the star schema (the
    * batch-promote gate), both directions per child→parent relation:
    * `orphans` = child rows whose non-null FK has no parent row, and
    * `unreferenced_parents` = parent keys no child ever references
    * (dead dimension rows — the metric that is genuinely non-zero
    * here: TPC-H-shaped data always has customers with no orders).
    * The child side pre-aggregates to DISTINCT keys with row counts
    * BEFORE the join, so the per-relation full-outer join carries
    * key cardinality, never fact rows, and collapses straight into
    * three counts — no row-level output materializes.
    */
  private def auditReferential(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, fk: String,
            parent: DataFrame, pk: String): DataFrame =
      child.select(col(fk).as("_k")).groupBy("_k").agg(count(lit(1)).as("_n"))
        .join(parent.select(col(pk).as("_k")).distinct()
          .withColumn("_hit", lit(1)), Seq("_k"), "full_outer")
        .agg(sum(coalesce(col("_n"), lit(0L))).as("child_rows"),
          sum(when(col("_hit").isNull && col("_k").isNotNull, col("_n"))
            .otherwise(lit(0L))).as("orphans"),
          sum((col("_n").isNull).cast("long")).as("unreferenced_parents"))
        .select(lit(name).as("relation"), col("child_rows"), col("orphans"),
          col("unreferenced_parents"))
    val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
    val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
    val p = t(s, dir, "part"); val n = t(s, dir, "nation")
    val r = t(s, dir, "region"); val e = Tables.events(s, dir)
    Seq(
      rel("customer.nation", c, "c_nationkey", n, "n_nationkey"),
      rel("events.customer", e, "user_id", c, "c_custkey"),
      rel("lineitem.orders", li, "l_orderkey", o, "o_orderkey"),
      rel("lineitem.part", li, "l_partkey", p, "p_partkey"),
      rel("lineitem.supplier", li, "l_suppkey", su, "s_suppkey"),
      rel("nation.region", n, "n_regionkey", r, "r_regionkey"),
      rel("orders.customer", o, "o_custkey", c, "c_custkey"),
      rel("supplier.nation", su, "s_nationkey", n, "n_nationkey"),
    ).reduce(_ unionByName _).orderBy("relation")
  }

  private val auditReferentialSql = {
    val rels = Seq(
      ("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("events.customer", "events", "user_id", "customer", "c_custkey"),
      ("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
    rels.map { case (name, child, fk, parent, pk) =>
      s"""SELECT '$name' AS relation,
         |  CAST(sum(coalesce(c._n, 0)) AS BIGINT) AS child_rows,
         |  CAST(sum(CASE WHEN p._k IS NULL AND c._k IS NOT NULL THEN c._n ELSE 0 END) AS BIGINT) AS orphans,
         |  CAST(sum(CASE WHEN c._n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unreferenced_parents
         |FROM (SELECT $fk AS _k, count(*) AS _n FROM $child GROUP BY 1) c
         |FULL JOIN (SELECT DISTINCT $pk AS _k FROM $parent) p ON c._k = p._k""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  /** DAU/MAU engagement rollup (the product-analytics stickiness
    * readout): per month, the monthly-active count, active-day count,
    * and summed daily-active counts, with stickiness = avg-DAU / MAU
    * as an EXACT parts-per-million integer ratio
    * `(10^6·dau_sum + D/2) div D`, `D = n_days·mau` — no float
    * division to drift between engines. Scale shape: one distinct
    * projection to (day, user) — the only row-scaled shuffle — then
    * a month-bounded multi-distinct aggregation; output is one row
    * per month at any SF.
    */
  private def dauMau(s: SparkSession, dir: String): DataFrame = {
    val dayUser = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
      .distinct()
    dayUser
      .groupBy(date_trunc("month", col("day")).cast("date").as("month"))
      .agg(countDistinct(col("user_id")).as("mau"),
        countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("dau_sum"))
      .select(col("month"), col("mau"), col("n_days"), col("dau_sum"),
        expr("CAST(((1000000 * dau_sum) + ((n_days * mau) DIV 2)) DIV (n_days * mau) AS BIGINT)")
          .as("stickiness_ppm"))
      .orderBy("month")
  }

  private val dauMauSql =
    """WITH du AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      |  FROM events),
      |m AS (
      |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
      |    CAST(count(DISTINCT day) AS BIGINT) AS n_days,
      |    CAST(count(*) AS BIGINT) AS dau_sum
      |  FROM du GROUP BY 1)
      |SELECT month, mau, n_days, dau_sum,
      |  CAST(((1000000 * dau_sum) + ((n_days * mau) // 2)) // (n_days * mau) AS BIGINT)
      |    AS stickiness_ppm
      |FROM m ORDER BY month""".stripMargin

  /** ABC / Pareto inventory classification over part revenue: parts
    * ranked by revenue descending, classified by INCLUSIVE cumulative
    * share (A ≤ 80%, B ≤ 95%, C above). The global running total
    * comes from the distributed [[graft.ops.PrefixSum]] — not a
    * partitionless window, which would serialize every part through
    * one reducer. Revenue is held as exact micro-units
    * (`decimal × 10^6` → BIGINT, values have ≤ 4 fractional digits)
    * and class boundaries are integer cross-products
    * (`5·cum ≤ 4·total`), so the classification cannot drift between
    * engines. Output is 3 bounded rows.
    */
  private def abcAnalysis(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      // decimal-exact money: the parquet columns are doubles of 2 dp
      // values; cast to cents before any arithmetic so the micro-unit
      // conversion is exact in both engines
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .select(col("l_partkey"),
        (col("rev") * lit(1000000)).cast("long").as("rev_micros"))
      .withColumn("_g", lit(1))
      // PrefixSum orders ascending; revenue-descending = ascending on
      // the negation, part key as the unique tie-break
      .withColumn("_negrev", -col("rev_micros"))
    val cum = graft.ops.PrefixSum.runningTotal(rev, "_g",
      Seq("_negrev", "l_partkey"), "rev_micros", "cum_micros")
    val total = cum.agg(max("cum_micros").as("total")).select(col("total"))
    cum.crossJoin(broadcast(total))
      .select(col("l_partkey"), col("rev_micros"),
        when(col("cum_micros") * 5 <= col("total") * 4, "A")
          .when(col("cum_micros") * 20 <= col("total") * 19, "B")
          .otherwise("C").as("abc_class"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum("rev_micros").as("class_rev_micros"))
      .orderBy("abc_class")
  }

  private val abcAnalysisSql =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (1 - CAST(l_discount AS DECIMAL(18,2)))) * 1000000 AS BIGINT) AS rev_micros
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT l_partkey, rev_micros,
      |    sum(rev_micros) OVER (ORDER BY rev_micros DESC, l_partkey
      |      ROWS UNBOUNDED PRECEDING) AS cum_micros,
      |    sum(rev_micros) OVER () AS total
      |  FROM rev)
      |SELECT CASE WHEN cum_micros * 5 <= total * 4 THEN 'A'
      |            WHEN cum_micros * 20 <= total * 19 THEN 'B'
      |            ELSE 'C' END AS abc_class,
      |  CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(rev_micros) AS BIGINT) AS class_rev_micros
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bot/abuse detection over the event stream — per-user cadence
    * stats with an exact integer rate test. The corpus is decorated
    * with one synthetic high-rate user (500 events at 1 s cadence
    * anchored to the stream's min timestamp) so BOTH outcomes are
    * non-vacuous at every SF; real users sit orders of magnitude
    * under the 100-events/hour flag line. One row-scaled aggregation;
    * rate is milli-events-per-hour computed as
    * `(n·3600000 + span/2) div span` — pure integers, no float drift.
    */
  private def botFlags(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val anchor = ev.agg(min("ts").as("t0"))
    val bot = anchor.select(explode(sequence(lit(0), lit(499))).as("i"), col("t0"))
      .select(lit(999999L).as("user_id"),
        (col("t0") + expr("make_interval(0, 0, 0, 0, 0, 0, i)")).as("ts"))
    val stats = ev.unionByName(bot)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("span_secs"))
    stats.select(col("user_id"), col("n_events"), col("span_secs"),
        when(col("span_secs") > 0,
          expr("CAST(((n_events * 3600000) + (span_secs DIV 2)) DIV span_secs AS BIGINT)"))
          .otherwise(lit(-1L)).as("rate_mph"))
      .withColumn("is_bot", col("rate_mph") >= 100000 || col("rate_mph") === -1L)
      .orderBy("user_id")
  }

  private val botFlagsSql =
    """WITH ev AS (
      |  SELECT user_id, ts FROM events
      |  UNION ALL
      |  SELECT 999999 AS user_id, (SELECT min(ts) FROM events) + to_seconds(i) AS ts
      |  FROM generate_series(0, 499) AS g(i)),
      |stats AS (
      |  -- per-timestamp floor BEFORE subtracting: Spark's
      |  -- unix_timestamp truncates each endpoint to whole seconds
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(floor(epoch(max(ts))) AS BIGINT)
      |      - CAST(floor(epoch(min(ts))) AS BIGINT) AS span_secs
      |  FROM ev GROUP BY 1)
      |SELECT user_id, n_events, span_secs,
      |  CASE WHEN span_secs > 0
      |       THEN ((n_events * 3600000) + (span_secs // 2)) // span_secs
      |       ELSE -1 END AS rate_mph,
      |  (CASE WHEN span_secs > 0
      |        THEN ((n_events * 3600000) + (span_secs // 2)) // span_secs
      |        ELSE -1 END >= 100000
      |   OR span_secs = 0) AS is_bot
      |FROM stats ORDER BY user_id""".stripMargin

  /** Hopping (sliding) window aggregation — the overlap semantics
    * tumbling windows can't express: each event lands in
    * length/slide = 4 one-hour windows that hop by 15 minutes, so
    * adjacent windows share 45 minutes of events (the
    * moving-average/trend shape). Spark's `window(ts, len, slide)`
    * explodes each row into its slots BEFORE the aggregation —
    * shuffle carries (slot, type) partials, output is bounded by
    * time-range/slide × |types|. The oracle reconstructs the same
    * epoch-aligned slots with integer arithmetic.
    */
  private def hoppingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type")

  private val hoppingWindowSql =
    """WITH slots AS (
      |  SELECT event_type,
    |    -- the 4 hop-aligned 1h windows covering ts: epoch-aligned
      |    -- 15-min buckets, k = 0..3 hops back. floor() before the
      |    -- BIGINT cast: DuckDB's double->int cast ROUNDS, which
      |    -- would push a .9999-second timestamp into the next bucket
      |    to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - k * 900)::TIMESTAMP AS window_start
      |  FROM events, generate_series(0, 3) AS g(k)
      |  WHERE ts IS NOT NULL)
      |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
      |FROM slots
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- growth accounting ----------------------------------------------------

  /** Weekly growth accounting (r12b) — the canonical user-base
    * decomposition every growth team runs: each week's active users
    * split EXACTLY into new (first-ever activity), retained (active
    * last week too), and resurrected (returning after a gap), plus
    * churned (active last week, absent this week) — with the identity
    * actives(w) = new + retained + resurrected certified by the hash.
    * Weeks are epoch-day/7 buckets (integer arithmetic, identical on
    * both engines — calendar week functions differ across engines).
    * Scale shape: one distinct (user, week) aggregation over raw
    * events, then self-joins over the |users|×|weeks| activity frame
    * on (user, week) — partial-aggregated, no windows.
    */
  private def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    // NOT cached although act feeds four consumers: AQE's runtime
    // exchange reuse already serves all four from one map output
    // (measured: 0.27 task-s uncached vs 8.2 with a cache — the cache
    // only added a materialization barrier; tried and reverted r16)
    val act = Tables.events(s, dir)
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")), lit("1970-01-05").cast("date")) / 7)
          .cast("long").as("week"))
      .distinct()
    val first = act.groupBy("user_id").agg(min("week").as("first_week"))
    val a = act.join(first, "user_id")
    val prev = act.select(col("user_id"), (col("week") + 1).as("week"))
      .withColumn("_active_prev", lit(1))
    val cur = a.join(prev, Seq("user_id", "week"), "left")
      .groupBy("week")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("_active_prev").isNotNull &&
          col("week") =!= col("first_week"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("_active_prev").isNull &&
          col("week") =!= col("first_week"), 1L).otherwise(0L)).as("n_resurrected"))
    val churned = act.select(col("user_id"), (col("week") + 1).as("week"))
      .join(act, Seq("user_id", "week"), "left_anti")
      .groupBy("week").agg(count(lit(1)).as("n_churned"))
    cur.join(churned, Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("week")
  }

  private val growthAccountingSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) / 7.0)
      |      AS BIGINT) AS week
      |  FROM events),
      |fw AS (SELECT user_id, min(week) AS first_week FROM act GROUP BY 1),
      |cur AS (
      |  SELECT a.week,
      |    count(*)::BIGINT AS n_active,
      |    CAST(sum(CASE WHEN a.week = fw.first_week THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(sum(CASE WHEN p.user_id IS NOT NULL AND a.week <> fw.first_week
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(sum(CASE WHEN p.user_id IS NULL AND a.week <> fw.first_week
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM act a
      |  JOIN fw ON fw.user_id = a.user_id
      |  LEFT JOIN act p ON p.user_id = a.user_id AND p.week = a.week - 1
      |  GROUP BY 1),
      |ch AS (
      |  SELECT a.week + 1 AS week, count(*)::BIGINT AS n_churned
      |  FROM act a LEFT JOIN act n ON n.user_id = a.user_id AND n.week = a.week + 1
      |  WHERE n.user_id IS NULL GROUP BY 1)
      |SELECT cur.week, n_active, n_new, n_retained, n_resurrected,
      |  coalesce(n_churned, 0) AS n_churned
      |FROM cur LEFT JOIN ch ON ch.week = cur.week
      |ORDER BY cur.week""".stripMargin

  // -- equi-height histogram bin edges (ANALYZE's CBO histogram math) -------

  /** The bin-edge computation behind `ANALYZE TABLE`'s equi-height CBO
    * histograms ([[graft.cdc.MergeTable.analyzeColumns]]), run with
    * EXACT percentiles so the oracle can replay it: edges at
    * probabilities 0, 1/n, …, 1 over `l_quantity` (linear
    * interpolation — Spark's `percentile` and DuckDB's `quantile_cont`
    * are both type-7 quantiles). The engine's ANALYZE swaps in
    * `approx_percentile` at scale; this gate certifies the edge
    * FORMULATION the histogram rests on.
    */
  private def histogramEdges(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val probs = (0 to n).map(i => i.toDouble / n)
    t(s, dir, "lineitem")
      .agg(expr(s"percentile(CAST(l_quantity AS DOUBLE), array(${probs.mkString(", ")}))").as("qs"))
      .select(posexplode(col("qs")))
      .select(col("pos").cast("long").as("bin"), round(col("col"), 6).as("edge"))
      .orderBy("bin")
  }

  private val histogramEdgesSql =
    """WITH q AS (SELECT quantile_cont(CAST(l_quantity AS DOUBLE),
      |                 [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS qs
      |           FROM lineitem)
      |SELECT CAST(t.i AS BIGINT) AS bin, ROUND(qs[t.i + 1], 6) AS edge
      |FROM q, range(9) AS t(i) ORDER BY bin""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("stats_histogram_edges", histogramEdges, Some(histogramEdgesSql)),
    QueryDef("events_growth_accounting", growthAccounting, Some(growthAccountingSql)),
    QueryDef("events_hopping_window", hoppingWindow, Some(hoppingWindowSql)),
    QueryDef("events_dau_mau", dauMau, Some(dauMauSql)),
    QueryDef("orders_abc_analysis", abcAnalysis, Some(abcAnalysisSql)),
    QueryDef("events_bot_flags", botFlags, Some(botFlagsSql)),
    QueryDef("events_attribution", attribution, Some(attributionSql)),
    QueryDef("events_decayed_scores", decayedScores, Some(decayedScoresSql)),
    QueryDef("profile_lineitem", profileLineitem, Some(profileLineitemSql)),
    QueryDef("audit_referential", auditReferential, Some(auditReferentialSql)),
    QueryDef("events_funnel_windowed", funnelWindowed, Some(funnelWindowedSql)),
    QueryDef("events_top_paths", topPaths, Some(topPathsSql)),
    QueryDef("events_ab_lift", abLift, Some(abLiftSql)),
    QueryDef("ts_similarity_pairs", tsSimilarityPairs, Some(tsSimilarityPairsSql)),
    QueryDef("events_value_trend", valueTrend, Some(valueTrendSql)),
    QueryDef("orders_cube", ordersCube, Some(ordersCubeSql)),
    QueryDef("orders_backlog", ordersBacklog, Some(ordersBacklogSql)),
  )
}
