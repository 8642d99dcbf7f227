package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth analytics block: the remaining TPC-H shapes expressible on
  * the testdata star schema (which has no partsupp table, so Q2, Q9,
  * Q11, and Q20 are out of reach by construction):
  *
  *  - Q15 top supplier: windowed revenue + max-revenue selection
  *  - Q17 small-quantity revenue: correlated per-part average,
  *    rationalized to exact integer/decimal arithmetic
  *  - Q21 shape: EXISTS + NOT EXISTS double correlation (on the
  *    available returnflag columns instead of commit/receipt dates)
  */
object Queries5 extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -- Q15: top supplier by 3-month revenue --------------------------------

  /** Revenue per supplier over one quarter; suppliers tied at the
    * maximum. The max is a 1-row aggregate joined back (broadcast) —
    * the scale shape for "rows equal to a global aggregate", no
    * window over an unpartitioned frame.
    */
  private def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-06-01 00:00:00") &&
        col("l_shipdate") < lit("1995-09-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      // decimal accumulation: float sums depend on partition order
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")).cast("double"), 2).as("total_revenue"))
    val top = rev.agg(max("total_revenue").as("mx"))
    rev.join(broadcast(top), col("total_revenue") === col("mx")).drop("mx")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1995-09-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // -- Q17: small-quantity-order revenue -----------------------------------

  /** Average yearly revenue lost if small orders (below 20% of the
    * part's average quantity) were not taken. The correlated
    * per-part average is one aggregation joined back; the comparison
    * `qty < 0.2 · sum/cnt` is rationalized to
    * `5 · qty · cnt < sum` in exact decimal arithmetic, so the
    * boundary can never flip between engines the way a float average
    * can.
    */
  private def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val brandParts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    val perPart = li.groupBy(col("l_partkey").as("pp_key"))
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("sumq"),
        count(lit(1)).as("cnt"))
    li.join(brandParts, col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pp_key"))
      .filter(col("l_quantity").cast("decimal(18,6)") * 5 * col("cnt") < col("sumq"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double") / 7.0, 2).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH pp AS (
      |  SELECT l_partkey AS pp_key,
      |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sumq,
      |    count(*) AS cnt
      |  FROM lineitem GROUP BY 1)
      |SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
      |JOIN pp ON l.l_partkey = pp.pp_key
      |WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * 5 * cnt < sumq""".stripMargin

  // -- Q21 shape: doubly-correlated EXISTS / NOT EXISTS ---------------------

  /** Q21's join skeleton on the available columns: suppliers with a
    * returned (R) lineitem on a finalized order where ANOTHER
    * supplier participated (EXISTS, left-semi with a non-equi
    * residual) but NO other supplier also returned (NOT EXISTS,
    * left-anti) — the lone-failure supplier list. Semi/anti joins on
    * the order key, never a per-order nested loop.
    */
  private def q21LoneFailures(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    val l1 = li.filter(col("l_returnflag") === "R")
    val ordersF = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1.join(ordersF, col("l_orderkey") === col("o_orderkey"))
      .join(l2, col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("o3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"), "left_anti")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  private val q21Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // -- market-basket pair mining --------------------------------------------

  /** Frequent co-purchased part pairs with lift — the association-rule
    * shape (recommendations, co-occurrence stats): distinct parts per
    * order self-join within the order key, support counted per
    * unordered pair, lift = support·N / (cnt_a·cnt_b) from exact
    * integer counts (all products < 2^53 → the one double division is
    * correctly rounded, cross-engine-exact). Top-20 by support.
    *
    * Scale shape: the self-join is an equi-join on the order key and
    * fan-out is bounded by basket size squared (TPC-H baskets ≤ 7
    * items), so candidate volume is linear in orders; per-pair counts
    * partial-aggregate map-side; no per-order nested loop.
    */
  private def basketPairs(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val nOrders = t(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
    val partCnt = items.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    val pairs = a.join(b, Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("support"))
    pairs
      .join(partCnt.select(col("l_partkey").as("part_a"), col("cnt").as("cnt_a")), "part_a")
      .join(partCnt.select(col("l_partkey").as("part_b"), col("cnt").as("cnt_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("support"),
        round((col("support") * col("n_orders")).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double"), 4).as("lift"))
      .orderBy(desc("support"), col("part_a"), col("part_b"))
      .limit(20)
  }

  private val basketPairsSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(*) AS n_orders FROM orders),
      |pc AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
      |  round(CAST(support * n_orders AS DOUBLE) /
      |        CAST(ca.cnt * cb.cnt AS DOUBLE), 4) AS lift
      |FROM pairs
      |JOIN pc ca ON ca.l_partkey = part_a
      |JOIN pc cb ON cb.l_partkey = part_b
      |CROSS JOIN n
      |ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin

  // -- events_anomaly: daily-count outliers via exact integer z-score ------

  /** Days whose event count deviates >2σ from that type's mean — the
    * monitoring query every ingest pipeline runs. Scale shape:
    * aggregate FIRST (100 TB of events → one row per (type, day),
    * bounded by the calendar), then join the per-type moment sums
    * back (broadcast: one row per type); no window at all, so no
    * bounded-cardinality partition key to serialize on. The 2σ test
    * is evaluated in exact integer algebra —
    * (n·x − S)² > 4·(n·Q − S²) with S = Σx, Q = Σx² — in decimal(38)
    * so it neither rounds (a float z-score at the boundary could flip
    * engines) nor overflows BIGINT when daily counts reach 10⁹.
    */
  private def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("n_events").as("s"),
      sum(big(col("n_events")) * big(col("n_events"))).as("q"))
    val dev = big(col("n")) * big(col("n_events")) - big(col("s"))
    val varScaled = big(col("n")) * col("q") - big(col("s")) * big(col("s"))
    daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n_events"),
        (dev * dev > lit(4) * varScaled).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  private val eventsAnomalySql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(n_events) AS HUGEINT) AS s,
      |    CAST(sum(CAST(n_events AS HUGEINT) * n_events) AS HUGEINT) AS q
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.day, d.n_events,
      |  ((n * d.n_events - s) * (n * d.n_events - s) > 4 * (n * q - s * s))
      |    AS is_anomaly
      |FROM daily d JOIN stats USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  // -- events_markov_transitions: behavior transition matrix ---------------

  /** First-order Markov transition counts + probabilities between
    * consecutive event types per user — the session-behavior model
    * behind funnel and next-action analysis. The only window
    * partitions on `user_id` (unbounded cardinality); the transition
    * matrix itself is bounded by |types|², so the per-from totals
    * join back as a broadcast. Probability = n/total in double after
    * the exact integer counts — one correctly-rounded division per
    * row, stable cross-engine.
    */
  private def eventsMarkov(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val seq = Tables.events(s, dir)
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
    val trans = seq
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val tot = trans.groupBy("from_type").agg(sum("n_trans").as("total"))
    trans.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        round(col("n_trans").cast("double") / col("total"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  private val eventsMarkovSql =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |trans AS (
      |  SELECT event_type AS from_type, to_type,
      |    CAST(count(*) AS BIGINT) AS n_trans
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS total
      |  FROM trans GROUP BY 1)
      |SELECT t.from_type, t.to_type, t.n_trans,
      |  round(CAST(t.n_trans AS DOUBLE) / tot.total, 6) AS p
      |FROM trans t JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // -- privacy: k-anonymity audit ------------------------------------------

  /** k-anonymity audit at TWO generalization levels — the privacy
    * gate a training-data release runs, and the ladder an anonymizer
    * walks: level 0 generalizes nationality to a 5-way region rollup
    * (`c_nationkey % 5` standing in for nation→region), level 1 keeps
    * the nation and adds an account-balance band — every equivalence
    * class with fewer than k = 5 members is flagged re-identifiable.
    * Coarse classes stay populated while fine ones go sparse, so both
    * audit outcomes are non-vacuous at every SF. One
    * bounded-cardinality aggregation per level (|QI value space| rows
    * out, whatever the input size).
    */
  private def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    def audit(level: Int, nation: Column, bal: Column): DataFrame =
      c.groupBy(nation.as("qi_nation"), col("c_mktsegment"), bal.as("bal_band"))
        .agg(count(lit(1)).as("n"))
        .select(lit(level).as("level"), col("qi_nation"), col("c_mktsegment"),
          col("bal_band"), col("n"), (col("n") < 5).as("at_risk"))
    audit(0, (col("c_nationkey") % 5).cast("int"), lit(null).cast("long"))
      .unionAll(audit(1, col("c_nationkey").cast("int"),
        floor(col("c_acctbal") / 2000).cast("long")))
      .orderBy("level", "qi_nation", "c_mktsegment", "bal_band")
  }

  /** l-diversity audit (r12) — k-anonymity's complement: a
    * quasi-identifier group can be large (k-safe) yet leak its
    * sensitive attribute when every member SHARES it, so each
    * (nation-band, segment) group is scored by the DISTINCT count of
    * the sensitive balance band; groups with l < 3 are flagged. One
    * groupBy + count-distinct shuffle, exact (the audit must not
    * approximate what it certifies).
    */
  private def lDiversity(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer")
      .groupBy((col("c_nationkey") % 5).cast("int").as("qi_nation"),
        col("c_mktsegment"))
      .agg(countDistinct(floor(col("c_acctbal") / 2000)).as("l"),
        count(lit(1)).as("n"))
      .select(col("qi_nation"), col("c_mktsegment"), col("l"), col("n"),
        (col("l") < 3).as("at_risk"))
      .orderBy("qi_nation", "c_mktsegment")
  }

  private val lDiversitySql =
    """SELECT CAST(c_nationkey % 5 AS INT) AS qi_nation, c_mktsegment,
      |  CAST(count(DISTINCT floor(c_acctbal / 2000)) AS BIGINT) AS l,
      |  CAST(count(*) AS BIGINT) AS n,
      |  (count(DISTINCT floor(c_acctbal / 2000)) < 3) AS at_risk
      |FROM customer GROUP BY 1, 2
      |ORDER BY qi_nation, c_mktsegment""".stripMargin

  /** t-closeness audit (r12) — the third rung of the privacy ladder:
    * a group can be k-large and l-diverse yet still leak when its
    * sensitive-attribute DISTRIBUTION skews far from the table's (all
    * its members sit in the top balance bands, say). Each
    * (nation-band, segment) group's balance-band distribution is
    * scored against the global one with the Earth Mover's Distance
    * over the ordered bands — computed in EXACT integer arithmetic:
    * with group counts nᵢ (size N), global counts mᵢ (size M), the
    * per-band gap pᵢ−qᵢ scales to the integer dᵢ = nᵢ·M − mᵢ·N, so
    * EMD·(bins−1)·N·M = Σ|prefix-sum(d)| is a BIGINT (`emd_scaled`)
    * and the t = 0.2 flag is the exact comparison 5·emd_scaled >
    * (bins−1)·N·M — no float division anywhere, hash-stable across
    * engines. Scale shape: two bounded-cardinality aggregations plus
    * a window over the |groups|×|bands| grid (≈165 rows whatever the
    * input size).
    */
  private def tCloseness(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = t(s, dir, "customer").select(
      (col("c_nationkey") % 5).cast("int").as("qi_nation"),
      col("c_mktsegment"),
      floor(col("c_acctbal") / 2000).cast("long").as("band"))
    val grp = c.groupBy("qi_nation", "c_mktsegment", "band")
      .agg(count(lit(1)).as("ni"))
    val glob = c.groupBy("band").agg(count(lit(1)).as("mi"))
    val sizes = c.groupBy("qi_nation", "c_mktsegment").agg(count(lit(1)).as("ng"))
    val totals = c.agg(count(lit(1)).as("mm"),
      countDistinct(col("band")).as("nbins"))
    val grid = sizes.crossJoin(broadcast(glob))
      .join(grp, Seq("qi_nation", "c_mktsegment", "band"), "left")
      .crossJoin(broadcast(totals))
      .select(col("qi_nation"), col("c_mktsegment"), col("band"), col("ng"),
        col("nbins"), col("mm"),
        (coalesce(col("ni"), lit(0L)) * col("mm") - col("mi") * col("ng")).as("d"))
    val w = Window.partitionBy("qi_nation", "c_mktsegment")
      .orderBy("band").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum", sum("d").over(w))
      .groupBy("qi_nation", "c_mktsegment")
      .agg(first("ng").as("n"), sum(abs(col("cum"))).as("emd_scaled"),
        first("nbins").as("nbins"), first("mm").as("mm"))
      .select(col("qi_nation"), col("c_mktsegment"), col("n"), col("emd_scaled"),
        (col("emd_scaled") * 5 > (col("nbins") - 1) * col("n") * col("mm"))
          .as("at_risk"))
      .orderBy("qi_nation", "c_mktsegment")
  }

  private val tClosenessSql =
    """WITH c AS (
      |  SELECT CAST(c_nationkey % 5 AS INT) AS qi_nation, c_mktsegment,
      |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS band
      |  FROM customer),
      |grp AS (SELECT qi_nation, c_mktsegment, band, count(*)::BIGINT AS ni
      |        FROM c GROUP BY 1, 2, 3),
      |gband AS (SELECT band, count(*)::BIGINT AS mi FROM c GROUP BY 1),
      |sizes AS (SELECT qi_nation, c_mktsegment, count(*)::BIGINT AS ng
      |          FROM c GROUP BY 1, 2),
      |totals AS (SELECT count(*)::BIGINT AS mm,
      |                  count(DISTINCT band)::BIGINT AS nbins FROM c),
      |grid AS (
      |  SELECT s.qi_nation, s.c_mktsegment, g.band, s.ng, t.nbins, t.mm,
      |    (coalesce(p.ni, 0) * t.mm - g.mi * s.ng) AS d
      |  FROM sizes s CROSS JOIN gband g
      |  LEFT JOIN grp p ON p.qi_nation = s.qi_nation
      |    AND p.c_mktsegment = s.c_mktsegment AND p.band = g.band
      |  CROSS JOIN totals t),
      |cums AS (
      |  SELECT qi_nation, c_mktsegment, ng, nbins, mm,
      |    sum(d) OVER (PARTITION BY qi_nation, c_mktsegment
      |                 ORDER BY band ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM grid)
      |SELECT qi_nation, c_mktsegment, any_value(ng) AS n,
      |  sum(abs(cum))::BIGINT AS emd_scaled,
      |  (sum(abs(cum)) * 5 > (any_value(nbins) - 1) * any_value(ng) * any_value(mm))
      |    AS at_risk
      |FROM cums GROUP BY 1, 2
      |ORDER BY qi_nation, c_mktsegment""".stripMargin

  private val kAnonymitySql =
    """SELECT 0 AS level, CAST(c_nationkey % 5 AS INT) AS qi_nation, c_mktsegment,
      |  CAST(NULL AS BIGINT) AS bal_band,
      |  CAST(count(*) AS BIGINT) AS n, (count(*) < 5) AS at_risk
      |FROM customer GROUP BY 2, 3
      |UNION ALL
      |SELECT 1 AS level, CAST(c_nationkey AS INT) AS qi_nation, c_mktsegment,
      |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
      |  CAST(count(*) AS BIGINT) AS n, (count(*) < 5) AS at_risk
      |FROM customer GROUP BY 2, 3, 4
      |ORDER BY level, qi_nation, c_mktsegment, bal_band NULLS FIRST""".stripMargin

  // -- RFM segmentation ----------------------------------------------------

  /** RFM customer segmentation (recency / frequency / monetary
    * tertiles — the marketing-analytics staple): each metric is
    * bucketed by GLOBAL rank, and the rank comes from the distributed
    * prefix count ([[graft.ops.PrefixSum]]) — a global `ntile()`
    * window has no partition key at all, i.e. one reducer sorting
    * every customer at any scale; the prefix-rank formulation is the
    * same numbers from one range shuffle per metric. Buckets are
    * exact integer arithmetic ((rank−1)·3 div n); monetary totals
    * accumulate in decimal and only the report edge casts to double.
    */
  private def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.PrefixSum
    val per = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("r_date"),
        count(lit(1)).as("f_cnt"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("m_sum"))
    val g = per.withColumn("_g", lit(1)).withColumn("_one", lit(1L))
    val ranked = Seq(
      (Seq("r_date", "o_custkey"), "_rr"),
      (Seq("f_cnt", "o_custkey"), "_rf"),
      (Seq("m_sum", "o_custkey"), "_rm"))
      .foldLeft(g) { case (df, (order, out)) =>
        PrefixSum.runningTotal(df, "_g", order, "_one", out)
      }
    ranked.crossJoin(broadcast(per.agg(count(lit(1)).as("_n"))))
      .withColumn("r_bucket", expr("((_rr - 1) * 3) div _n"))
      .withColumn("f_bucket", expr("((_rf - 1) * 3) div _n"))
      .withColumn("m_bucket", expr("((_rm - 1) * 3) div _n"))
      .groupBy("r_bucket", "f_bucket", "m_bucket")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("m_sum").cast("double"), 2).as("total_m"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }

  private val rfmSegmentsSql =
    """WITH per AS (
      |  SELECT o_custkey, CAST(max(o_orderdate) AS DATE) AS r_date,
      |    CAST(count(*) AS BIGINT) AS f_cnt,
      |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS m_sum
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT m_sum,
      |    ((row_number() OVER (ORDER BY r_date, o_custkey) - 1) * 3)
      |      // (SELECT count(*) FROM per) AS r_bucket,
      |    ((row_number() OVER (ORDER BY f_cnt, o_custkey) - 1) * 3)
      |      // (SELECT count(*) FROM per) AS f_bucket,
      |    ((row_number() OVER (ORDER BY m_sum, o_custkey) - 1) * 3)
      |      // (SELECT count(*) FROM per) AS m_bucket
      |  FROM per)
      |SELECT r_bucket, f_bucket, m_bucket,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  round(CAST(sum(m_sum) AS DOUBLE), 2) AS total_m
      |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q15_top_supplier", q15TopSupplier, Some(q15Sql)),
    QueryDef("q17_small_quantity", q17SmallQuantity, Some(q17Sql)),
    QueryDef("q21_lone_failures", q21LoneFailures, Some(q21Sql)),
    QueryDef("basket_pairs", basketPairs, Some(basketPairsSql)),
    QueryDef("events_anomaly", eventsAnomaly, Some(eventsAnomalySql)),
    QueryDef("events_markov_transitions", eventsMarkov, Some(eventsMarkovSql)),
    QueryDef("privacy_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("privacy_l_diversity", lDiversity, Some(lDiversitySql)),
    QueryDef("privacy_t_closeness", tCloseness, Some(tClosenessSql)),
    QueryDef("orders_rfm_segments", rfmSegments, Some(rfmSegmentsSql)),
  )
}
