package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series operators over the event stream: recurrence smoothing
  * (EWMA) and integer-exact change-point detection — the sequence-
  * shaped analytics the window/aggregation blocks don't cover.
  */
object SeriesQueries extends QueryModule {

  /** Hard per-user history cap for the ordered-recurrence family.
    * These folds necessarily hold one user's own events as aggregate
    * state; a pathological hot key (a bot with 10⁸ events) must
    * refuse LOUDLY ([[graft.functions.BoundedCollectList]] throws in
    * the map-side partial, before the memory is spent) rather than
    * OOM a task. 2²⁰ events × ~24 B/row ≈ 25 MB worst-case buffer —
    * far above any real user, far below task memory.
    */
  private[analytics] val MaxEventsPerUser: Int = 1 << 20

  /** `sort_array(graft_bounded_collect(...))` over the per-user
    * (ts, event_id)-ordered sequence — the capped twin of
    * `sort_array(collect_list(...))`, identical under the cap.
    */
  private def boundedSeq(s: SparkSession, inner: String): org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.register(s)
    expr(s"sort_array(graft_bounded_collect($inner, $MaxEventsPerUser))")
  }

  // -- per-user EWMA (ordered-fold recurrence) -----------------------------

  /** Exponentially-weighted moving average of each user's event
    * values — a RECURRENCE (s ← s·¾ + x·¼), which has no
    * order-independent aggregate form. Cross-engine exactness comes
    * from evaluating the identical left-fold over the identical
    * ordered sequence: values collect per user ordered by (ts,
    * event_id) and fold with dyadic-rational constants (¾, ¼ — exact
    * in binary), so every intermediate double is bit-identical in
    * Spark's `aggregate` HOF and DuckDB's `list_reduce`.
    *
    * 100 TB shape: one shuffle by user_id; per-user state is the
    * user's own event list (the same bound sessionization carries).
    * A streaming deployment maintains s in mapGroupsWithState — this
    * is the batch twin.
    */
  private def ewma(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        boundedSeq(s, "struct(ts, event_id, v)").as("seq"))
      .select(col("user_id"), col("n_events"),
        round(expr(
          "aggregate(transform(seq, r -> r.v), CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE))"),
          6).as("ewma"))
      .orderBy("user_id")

  private val ewmaSql =
    """WITH s AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events,
      |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), seq),
      |    (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)), 6) AS ewma
      |FROM s ORDER BY user_id""".stripMargin

  // -- Holt linear-trend smoothing (two-state recurrence) ------------------

  /** Holt double exponential smoothing per user — the level+trend
    * RECURRENCE between EWMA (no trend) and seasonal-naive
    * (no smoothing): `l ← ½x + ½(l+b); b ← ½(l'−l) + ½b`, one-step
    * forecast `l+b`. A TWO-component state has no order-independent
    * aggregate form either; exactness comes from the identical
    * two-component left fold over the identical (ts, event_id)-ordered
    * sequence with dyadic constants — Spark's `aggregate` HOF with a
    * named-struct accumulator ≡ DuckDB's `list_reduce` over [l, b]
    * LIST state, bit-identical intermediates (`l'` is inlined twice
    * with the same expression tree on both engines; the oracle uses
    * list state because DuckDB 1.0's struct-building lambda folds
    * drift from the recurrence after the first step). Same 100 TB
    * shape as EWMA: one user_id shuffle, per-user state = the user's
    * own events; the streaming twin keeps (l, b) in
    * mapGroupsWithState.
    */
  private def holtLinear(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        boundedSeq(s, "struct(ts, event_id, v)").as("seq"))
      .select(col("user_id"), col("n_events"),
        expr(
          "aggregate(transform(seq, r -> r.v), " +
            "named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)), " +
            "(acc, x) -> named_struct(" +
            "'l', x * CAST(0.5 AS DOUBLE) + (acc.l + acc.b) * CAST(0.5 AS DOUBLE), " +
            "'b', (x * CAST(0.5 AS DOUBLE) + (acc.l + acc.b) * CAST(0.5 AS DOUBLE)" +
            " - acc.l) * CAST(0.5 AS DOUBLE) + acc.b * CAST(0.5 AS DOUBLE)))")
          .as("st"))
      .select(col("user_id"), col("n_events"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast_1"))
      .orderBy("user_id")

  private val holtLinearSql =
    """WITH s AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY user_id),
      |f AS (
      |  SELECT user_id, n_events,
      |    list_reduce(
      |      list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
      |        list_transform(seq, x -> [x, CAST(0.0 AS DOUBLE)])),
      |      (acc, e) -> [
      |        e[1] * CAST(0.5 AS DOUBLE) + (acc[1] + acc[2]) * CAST(0.5 AS DOUBLE),
      |        (e[1] * CAST(0.5 AS DOUBLE) + (acc[1] + acc[2]) * CAST(0.5 AS DOUBLE)
      |         - acc[1]) * CAST(0.5 AS DOUBLE) + acc[2] * CAST(0.5 AS DOUBLE)
      |      ]) AS st
      |  FROM s)
      |SELECT user_id, n_events,
      |  round(st[1], 6) AS level, round(st[2], 6) AS trend,
      |  round(st[1] + st[2], 6) AS forecast_1
      |FROM f ORDER BY user_id""".stripMargin

  // -- change-point detection (integer CUSUM argmax) -----------------------

  /** Change-point scan over the daily event-count series: the CUSUM
    * deviation statistic `D_k = |n·S_k − k·S_n|` (S = running count,
    * k = day index, n = days) peaks where the arrival rate shifts.
    * Entirely integer cross-multiplication — no float means, so the
    * statistic is exact on both engines. Running totals ride the
    * distributed [[graft.ops.PrefixSum]] (no partitionless window);
    * the report is the top-5 candidate days.
    */
  private def changepoint(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.PrefixSum
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("_g", lit(1)).withColumn("_one", lit(1L))
    // cumulative count AND day index share one prefix-sum pass (same
    // order): one range shuffle + one subtotal collect, not two each
    val run = PrefixSum.runningTotals(daily, "_g", Seq("day"),
      Seq("cnt" -> "s_k", "_one" -> "k"))
    val tot = run.agg(max(col("s_k")).as("s_n"), max(col("k")).as("n"))
    run.crossJoin(broadcast(tot))
      .select(col("day"), col("cnt"), col("s_k"), col("k"),
        abs(col("n") * col("s_k") - col("k") * col("s_n")).as("d_stat"))
      .orderBy(col("d_stat").desc, col("day")).limit(5)
  }

  private val changepointSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1),
      |run AS (
      |  SELECT day, cnt,
      |    CAST(sum(cnt) OVER (ORDER BY day) AS BIGINT) AS s_k,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k
      |  FROM daily),
      |tot AS (SELECT max(s_k) AS s_n, max(k) AS n FROM run)
      |SELECT day, cnt, s_k, k,
      |  abs(n * s_k - k * s_n) AS d_stat
      |FROM run CROSS JOIN tot
      |ORDER BY d_stat DESC, day LIMIT 5""".stripMargin

  // -- seasonal-naive forecast backtest ------------------------------------

  /** Seasonal-naive forecast backtest over daily order arrivals:
    * forecast(d) = actual(d − 7), scored by MAE per weekday over the
    * last-28-day holdout — the baseline every production forecaster
    * must beat, and the backtest harness shape (point-in-time joins,
    * no leakage) is the real deliverable. Counts and error sums are
    * exact integers; the weekday key is epoch-day mod 7 (identical
    * arithmetic on both engines — named weekday functions disagree on
    * 0- vs 1-based). Two bounded aggregations + one self-join on the
    * shifted day; 7 output rows.
    */
  private def seasonalNaive(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val fc = daily.select(date_add(col("day"), 7).as("day"), col("cnt").as("fc"))
    val dmax = daily.agg(max(col("day")).as("dmax"))
    daily.join(fc, "day")
      .crossJoin(broadcast(dmax))
      .filter(col("day") > date_sub(col("dmax"), 28))
      .withColumn("dow", expr("datediff(day, DATE'1970-01-01') % 7"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cnt") - col("fc"))).as("sum_abs_err"))
      .select(col("dow"), col("n_days"), col("sum_abs_err"),
        round(col("sum_abs_err").cast("double") / col("n_days"), 4).as("mae"))
      .orderBy("dow")
  }

  private val seasonalNaiveSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |fc AS (SELECT day + INTERVAL 7 DAY AS day, cnt AS fc FROM daily),
      |mx AS (SELECT max(day) AS dmax FROM daily),
      |h AS (
      |  SELECT d.day, d.cnt, f.fc
      |  FROM daily d JOIN fc f ON d.day = f.day CROSS JOIN mx
      |  WHERE d.day > dmax - INTERVAL 28 DAY)
      |SELECT CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow,
      |  CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(abs(cnt - fc)) AS BIGINT) AS sum_abs_err,
      |  round(CAST(sum(abs(cnt - fc)) AS DOUBLE) / count(*), 4) AS mae
      |FROM h GROUP BY 1 ORDER BY dow""".stripMargin

  // -- trimmed mean (robust central tendency) ------------------------------

  /** Per-user 10% trimmed mean of event values — the robust central
    * tendency that completes the despiking family (Hampel flags
    * outliers; the trimmed mean reports THROUGH them): drop the
    * lowest and highest `n div 10` values, mean the rest. Exactness:
    * the kept slice sums in ASCENDING sorted order on both engines
    * (Spark `aggregate` fold ≡ DuckDB `list_reduce`), so every
    * intermediate double is bit-identical before the 6 dp round.
    * One shuffle by user_id; per-user state is the user's own values
    * (the sessionization bound) — never a low-cardinality collect.
    */
  private def trimmedMean(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value").cast("double").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        boundedSeq(s, "v").as("vs"))
      .withColumn("k", expr("n_events div 10"))
      .withColumn("kept",
        expr("slice(vs, CAST(k + 1 AS INT), CAST(n_events - 2 * k AS INT))"))
      .select(col("user_id"), col("n_events"),
        round(expr("aggregate(kept, CAST(0.0 AS DOUBLE), (a, x) -> a + x)") /
          (col("n_events") - lit(2) * col("k")), 6).as("trimmed_mean"))
      .orderBy("user_id")

  private val trimmedMeanSql =
    """WITH s AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    list_sort(list(CAST(value AS DOUBLE))) AS vs
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |t AS (
      |  SELECT user_id, n_events, n_events // 10 AS k,
      |    vs[(n_events // 10) + 1 : n_events - (n_events // 10)] AS kept
      |  FROM s)
      |SELECT user_id, n_events,
      |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), kept), (a, x) -> a + x)
      |        / (n_events - 2 * k), 6) AS trimmed_mean
      |FROM t ORDER BY user_id""".stripMargin

  // -- sequence pattern matching (CEP-lite / MATCH_RECOGNIZE shape) --------

  /** Regex pattern matching over each user's ordered event-type
    * SEQUENCE — the complex-event-processing shape (Flink CEP /
    * MATCH_RECOGNIZE) reduced to its batch core: the per-user history
    * collapses to a compact symbol string (one char per event, in
    * (ts, event_id) order — the same deterministic ordering the EWMA
    * recurrence uses) and business patterns become ordinary regexes
    * over it: eventual sequences (`v.*c.*p`), strict adjacency
    * (`vcp`), anchors (`^s`).
    *
    * 100 TB shape: one shuffle by user_id; per-user state is the
    * user's own symbol string (bytes, not rows — 1 char/event);
    * pattern evaluation is per-row regex inside codegen. A streaming
    * deployment keeps the tail of the symbol string in
    * mapGroupsWithState; this is the batch twin.
    */
  private def patternMatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .groupBy("user_id")
      .agg(concat_ws("", expr("transform(" +
        s"sort_array(graft_bounded_collect(struct(ts, event_id, ch), $MaxEventsPerUser)), " +
        "r -> r.ch)")).as("seq"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("seq").rlike("v.*c.*p").cast("long")).as("browse_to_buy"),
        sum(col("seq").rlike("vcp").cast("long")).as("strict_checkout"),
        sum(col("seq").rlike("e.*p").cast("long")).as("error_then_purchase"),
        sum(col("seq").rlike("^s").cast("long")).as("signup_first"))

  private val patternMatchSql =
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY user_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END) AS BIGINT) AS browse_to_buy,
      |  CAST(sum(CASE WHEN regexp_matches(seq, 'vcp') THEN 1 ELSE 0 END) AS BIGINT) AS strict_checkout,
      |  CAST(sum(CASE WHEN regexp_matches(seq, 'e.*p') THEN 1 ELSE 0 END) AS BIGINT) AS error_then_purchase,
      |  CAST(sum(CASE WHEN regexp_matches(seq, '^s') THEN 1 ELSE 0 END) AS BIGINT) AS signup_first
      |FROM s""".stripMargin

  // -- Hampel filter (moving-median outlier detection) ---------------------

  /** Hampel outlier scan over the daily order-arrival series: each
    * day with a FULL ±3-day calendar window gets the window median
    * and the median absolute deviation, and is flagged when
    * `|cnt − med| > 3·MAD` — the robust despiking filter (median/MAD
    * shrug off the very outliers a mean/σ filter would absorb).
    *
    * Exactness: a 7-element median is the 4th sorted value and MAD
    * the 4th sorted absolute deviation — pure integer selection, no
    * quantile interpolation, so both engines agree bit-for-bit.
    *
    * 100 TB shape: NO partitionless ordered window — each day's count
    * is EXPLODED to the 7 windows it participates in (bounded ×7
    * fan-out) and windows assemble with one groupBy(day) shuffle;
    * per-group state is 7 longs. The same shape handles any bounded
    * window width on an unbounded series.
    */
  private def hampel(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val contrib = daily.select(explode(array((-3 to 3).map(o =>
        struct(date_add(col("day"), o).as("d2"), col("cnt").as("v"))): _*)).as("c"))
      .select(col("c.d2").as("day"), col("c.v").as("v"))
    val win = contrib.groupBy("day")
      .agg(count(lit(1)).as("nw"), array_sort(collect_list(col("v"))).as("vs"))
      .filter(col("nw") === 7)
    daily.join(win, "day")
      .withColumn("med", element_at(col("vs"), 4))
      .withColumn("mad", element_at(
        array_sort(transform(col("vs"), x => abs(x - col("med")))), 4))
      .select(col("day"), col("cnt"), col("med"), col("mad"),
        (abs(col("cnt") - col("med")) > col("mad") * 3).cast("int").as("is_outlier"))
      .orderBy("day")
  }

  private val hampelSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |contrib AS (
      |  SELECT day + CAST(o.off AS INT) AS day, cnt AS v
      |  FROM daily, (SELECT unnest(range(-3, 4)) AS off) o),
      |win AS (
      |  SELECT day, count(*) AS nw, list_sort(list(v)) AS vs
      |  FROM contrib GROUP BY day HAVING count(*) = 7),
      |scored AS (
      |  SELECT d.day, d.cnt, vs[4] AS med,
      |    list_sort(list_transform(vs, x -> abs(x - vs[4])))[4] AS mad
      |  FROM daily d JOIN win w ON d.day = w.day)
      |SELECT day, cnt, CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
      |  CAST(abs(cnt - med) > 3 * mad AS INT) AS is_outlier
      |FROM scored ORDER BY day""".stripMargin

  // -- autocorrelation function (exact integer form) -----------------------

  /** ACF of the daily event-count series at lags 1–7 (r12) — the
    * seasonality probe: a weekly cycle shows as a lag-7 peak. The
    * textbook r_k = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)² divides by the float
    * mean, so instead each deviation is scaled by n: dₜ = n·xₜ − S is
    * an exact BIGINT (Σxₜ = S), and the reported (acf_num, acf_den) =
    * (Σ dₜ·dₜ₊ₖ, Σ dₜ²) carry the n² factor in BOTH terms — their
    * ratio IS r_k, every intermediate is integer, hash-stable across
    * engines. Magnitudes: |d| ≤ n·max(x) and the series length is
    * #days, so even 10⁹ events/day over 10 years stays inside int64.
    * Scale shape: one date aggregation over the raw events (the only
    * data-sized stage), then windows over the #days-row series — the
    * post-aggregate frame is bounded by calendar length, not data.
    */
  private def acf(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .withColumn("_one", lit(1L))
    val tot = daily.agg(count(lit(1)).as("n"), sum("x").as("s"))
    // t = position of day in ascending order — a distributed running
    // count (PrefixSum), not a partition-less row_number window
    val dev = graft.ops.PrefixSum.runningTotalGlobal(daily, Seq("day"), "_one", "t")
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("n") * col("x") - col("s")).as("dev"))
    val den = dev.agg(sum(col("dev") * col("dev")).as("acf_den"))
    val lags = s.range(1, 8).select(col("id").cast("int").as("lag_k"))
    broadcast(lags).join(dev.as("a"), lit(true))
      .join(dev.as("b"), col("b.t") === col("a.t") + col("lag_k"))
      .groupBy("lag_k")
      .agg(sum(col("a.dev") * col("b.dev")).as("acf_num"))
      .crossJoin(broadcast(den))
      .select(col("lag_k"), col("acf_num"), col("acf_den"))
      .orderBy("lag_k")
  }

  private val acfSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS x
      |  FROM events GROUP BY 1),
      |tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM daily),
      |dev AS (
      |  SELECT row_number() OVER (ORDER BY day) AS t, (t2.n * d.x - t2.s) AS dev
      |  FROM daily d CROSS JOIN tot t2),
      |den AS (SELECT sum(dev * dev)::BIGINT AS acf_den FROM dev),
      |lags AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS lag_k)
      |SELECT l.lag_k, sum(a.dev * b.dev)::BIGINT AS acf_num,
      |  any_value(den.acf_den) AS acf_den
      |FROM lags l
      |JOIN dev a ON true
      |JOIN dev b ON b.t = a.t + l.lag_k
      |CROSS JOIN den
      |GROUP BY l.lag_k ORDER BY lag_k""".stripMargin

  // -- survival / hazard curve ---------------------------------------------

  /** Discrete hazard curve over user lifetimes (r12) — the
    * Kaplan-Meier-adjacent churn statistic: score every user by
    * ACTIVE-day count (distinct event days — the engagement lifetime,
    * which spreads where wall-clock spans saturate the capture
    * window), then for each age a report
    * deaths d_a (users whose span ended at exactly a) and the at-risk
    * count n_a (span ≥ a, a suffix sum), with hazard = d_a / n_a.
    * Reporting the (d, n) hazard TABLE instead of the survival
    * product keeps every number an exact integer ratio — the KM
    * product telescopes from exactly these terms. Scale shape: one
    * per-user aggregation over the raw events; the suffix-sum window
    * runs over the #distinct-ages frame (calendar-bounded, not
    * data-bounded).
    */
  private def hazard(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(countDistinct(to_date(col("ts"))).cast("long").as("age_days"))
    val d = spans.groupBy("age_days").agg(count(lit(1)).as("n_ended"))
      .withColumn("_nage", -col("age_days"))
    // n_at_risk = Σ n_ended over ages ≥ this age — a suffix sum,
    // computed as a distributed prefix sum over -age_days (window-free)
    graft.ops.PrefixSum.runningTotalGlobal(d, Seq("_nage"), "n_ended", "n_at_risk")
      .select(col("age_days"), col("n_ended"), col("n_at_risk"),
        round(col("n_ended").cast("double") / col("n_at_risk"), 6).as("hazard"))
      .orderBy("age_days")
  }

  private val hazardSql =
    """WITH spans AS (
      |  SELECT user_id,
      |    CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS age_days
      |  FROM events GROUP BY 1),
      |d AS (SELECT age_days, count(*)::BIGINT AS n_ended FROM spans GROUP BY 1)
      |SELECT age_days, n_ended,
      |  CAST(sum(n_ended) OVER (ORDER BY age_days DESC
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk,
      |  round(CAST(n_ended AS DOUBLE) / CAST(sum(n_ended) OVER (ORDER BY age_days DESC
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT), 6) AS hazard
      |FROM d ORDER BY age_days""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("events_ewma", ewma, Some(ewmaSql)),
    QueryDef("events_acf", acf, Some(acfSql)),
    QueryDef("events_hazard_curve", hazard, Some(hazardSql)),
    QueryDef("events_changepoint", changepoint, Some(changepointSql)),
    QueryDef("orders_seasonal_naive", seasonalNaive, Some(seasonalNaiveSql)),
    QueryDef("orders_hampel_daily", hampel, Some(hampelSql)),
    QueryDef("events_pattern_match", patternMatch, Some(patternMatchSql)),
    QueryDef("events_trimmed_mean", trimmedMean, Some(trimmedMeanSql)),
    QueryDef("events_holt_linear", holtLinear, Some(holtLinearSql)),
  )
}
