package graft.analytics

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighth analytics block (r14): concentration, confidence, and
  * distribution-shape metrics built on the r14 distributed-rank
  * machinery (PrefixSum — no global windows anywhere): Pareto/Lorenz
  * revenue concentration, Wilson confidence bounds, Zipf/OLS fits,
  * skyline (Pareto front), Benford digit profiling, vocabulary
  * coverage curves, and audience-overlap/KL divergence.
  *
  * Money folds to BIGINT micros before summing (exact, hash-stable
  * across engines); every float output is a deterministic function of
  * exact integer aggregates, rounded on both sides.
  */
object Queries8 extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def micros(c: org.apache.spark.sql.Column) =
    (c * 1000000L).cast("decimal(38,0)")

  // -- revenue concentration: top-decile share ---------------------------------

  /** Share of total order revenue carried by the top 10% of customers
    * by spend — the Pareto question every revenue team asks. Customer
    * count scales with SF, so the rank is the r14 DISTRIBUTED rank
    * ([[graft.ops.PrefixSum.runningTotalGlobal]]): one range shuffle,
    * no global window, no single reducer.
    */
  private def revenuePareto(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(micros(col("o_totalprice"))).cast("long").as("rev_micros"))
      .withColumn("_neg", -col("rev_micros"))
      .withColumn("_one", lit(1L))
    val ranked = graft.ops.PrefixSum.runningTotalGlobal(
      rev, Seq("_neg", "o_custkey"), "_one", "i")
    val totals = rev.agg(count(lit(1)).as("n"), sum(col("rev_micros")).as("tot"))
    ranked.crossJoin(broadcast(totals))
      .filter(col("i") <= greatest(floor(col("n") / 10), lit(1L)))
      .agg(max(col("n")).as("n_customers"),
        count(lit(1)).as("top_decile_n"),
        sum(col("rev_micros")).as("top_decile_micros"),
        max(col("tot")).as("total_micros"))
      .withColumn("share", round(col("top_decile_micros").cast("double") /
        col("total_micros").cast("double"), 6))
  }

  private val revenueParetoSql =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice * 1000000 AS HUGEINT)) AS BIGINT) AS rev_micros
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT rev_micros,
      |    row_number() OVER (ORDER BY rev_micros DESC, o_custkey) AS i
      |  FROM rev),
      |t AS (SELECT count(*)::BIGINT AS n,
      |  CAST(sum(rev_micros) AS BIGINT) AS tot FROM rev)
      |SELECT max(n) AS n_customers, count(*)::BIGINT AS top_decile_n,
      |  CAST(sum(rev_micros) AS BIGINT) AS top_decile_micros,
      |  max(tot) AS total_micros,
      |  round(CAST(sum(rev_micros) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6) AS share
      |FROM ranked CROSS JOIN t
      |WHERE i <= greatest(n // 10, 1)""".stripMargin

  // -- Wilson confidence bounds per event type ---------------------------------

  /** Wilson score lower bound of each event type's high-value rate
    * (value ≥ 50) — the ranking statistic that beats raw rates on
    * small samples. n and successes are exact integers; the bound is
    * a deterministic scalar function of them.
    */
  private def wilsonCtr(s: SparkSession, dir: String): DataFrame = {
    val z = 1.96
    val agg = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("succ"))
    agg.select(col("event_type"), col("n"), col("succ"),
        round(col("succ").cast("double") / col("n").cast("double"), 6).as("rate"),
        round(
          (col("succ").cast("double") / col("n") + lit(z * z) / (lit(2.0) * col("n")) -
            lit(z) * sqrt((col("succ").cast("double") / col("n") *
              (lit(1.0) - col("succ").cast("double") / col("n")) +
              lit(z * z) / (lit(4.0) * col("n"))) / col("n"))) /
            (lit(1.0) + lit(z * z) / col("n")), 6).as("wilson_lo"))
      .orderBy("event_type")
  }

  private val wilsonCtrSql =
    """WITH a AS (
      |  SELECT event_type, count(*)::BIGINT AS n,
      |    CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS succ
      |  FROM events GROUP BY 1)
      |SELECT event_type, n, succ,
      |  round(succ::DOUBLE / n, 6) AS rate,
      |  round((succ::DOUBLE / n + 1.96*1.96 / (2.0*n)
      |    - 1.96 * sqrt((succ::DOUBLE / n * (1.0 - succ::DOUBLE / n)
      |                   + 1.96*1.96 / (4.0*n)) / n))
      |    / (1.0 + 1.96*1.96 / n), 6) AS wilson_lo
      |FROM a ORDER BY event_type""".stripMargin

  // -- Zipf fit over the corpus vocabulary --------------------------------------

  /** Zipf slope of the corpus: OLS of ln(freq) on ln(rank) over the
    * top-500 words — the one-number sanity check that a text corpus
    * looks like natural language (≈ −1). Ranking the bounded top-500
    * frame goes through PrefixSum (no global window); the regression
    * folds exact integer (rank, freq) pairs.
    */
  private def zipfFit(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("w")).limit(500)
      .withColumn("_neg", -col("freq"))
      .withColumn("_one", lit(1L))
    val ranked = graft.ops.PrefixSum.runningTotalGlobal(
      words, Seq("_neg", "w"), "_one", "i")
      .select(log(col("i").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    ranked.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"),
        round((col("sy") - col("sx") *
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"), 4)
          .as("zipf_intercept"))
  }

  private val zipfFitSql =
    """WITH words AS (
      |  SELECT w, count(*)::BIGINT AS freq FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
      |    FROM documents) s
      |  WHERE length(w) >= 2
      |  GROUP BY 1 ORDER BY freq DESC, w LIMIT 500),
      |ranked AS (
      |  SELECT ln(row_number() OVER (ORDER BY freq DESC, w)::DOUBLE) AS x,
      |    ln(freq::DOUBLE) AS y
      |  FROM words),
      |a AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
      |  sum(x*y) AS sxy, sum(x*x) AS sxx FROM ranked)
      |SELECT n AS n_terms,
      |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS zipf_slope,
      |  round((sy - sx * ((n*sxy - sx*sy) / (n*sxx - sx*sx))) / n, 4)
      |    AS zipf_intercept
      |FROM a""".stripMargin

  // -- OLS of price on quantity per return flag ---------------------------------

  /** Per-return-flag least squares of extended price (micros) on
    * quantity — every moment (n, Σq, Σp, Σqp, Σq²) folds as an exact
    * DECIMAL/HUGEINT before the one double division, so the slope is
    * bit-identical across engines at any SF.
    */
  private def priceQtyOls(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "lineitem").select(col("l_returnflag"),
      col("l_quantity").cast("long").as("q"),
      micros(col("l_extendedprice")).as("p"))
    m.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sq"),
        sum(col("p")).as("sp"),
        sum(col("q") * col("p")).as("sqp"),
        sum(col("q") * col("q")).as("sqq"))
      .select(col("l_returnflag"), col("n"),
        round((col("n").cast("double") * col("sqp").cast("double") -
          col("sq").cast("double") * col("sp").cast("double")) /
          (col("n").cast("double") * col("sqq").cast("double") -
            col("sq").cast("double") * col("sq").cast("double")), 6)
          .as("slope_micros_per_unit"))
      .orderBy("l_returnflag")
  }

  private val priceQtyOlsSql =
    """WITH m AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(l_extendedprice * 1000000 AS HUGEINT) AS p
      |  FROM lineitem),
      |a AS (
      |  SELECT l_returnflag, count(*)::BIGINT AS n, sum(q) AS sq, sum(p) AS sp,
      |    sum(q * p) AS sqp, sum(q * q) AS sqq
      |  FROM m GROUP BY 1)
      |SELECT l_returnflag, n,
      |  round((n::DOUBLE * sqp::DOUBLE - sq::DOUBLE * sp::DOUBLE)
      |    / (n::DOUBLE * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE), 6)
      |    AS slope_micros_per_unit
      |FROM a ORDER BY l_returnflag""".stripMargin

  // -- event-type audience overlap ----------------------------------------------

  /** Jaccard overlap between event types' user audiences — "do the
    * people who error also purchase". The per-user type set is ≤5
    * values, so the pair space is bounded per user and the aggregate
    * output is the 5×5 triangle.
    */
  private def typeOverlap(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val both = ut.as("a")
      .join(ut.withColumnRenamed("event_type", "tb").as("b"), Seq("user_id"))
      .filter(col("event_type") < col("tb"))
      .groupBy(col("event_type").as("ta"), col("tb"))
      .agg(count(lit(1)).as("both_users"))
    both
      .join(broadcast(perType.select(col("event_type").as("ta"), col("cnt").as("na"))), "ta")
      .join(broadcast(perType.select(col("event_type").as("tb"), col("cnt").as("nb"))), "tb")
      .select(col("ta"), col("tb"), col("both_users"),
        round(col("both_users").cast("double") /
          (col("na") + col("nb") - col("both_users")).cast("double"), 6).as("jaccard"))
      .orderBy("ta", "tb")
  }

  private val typeOverlapSql =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |pt AS (SELECT event_type, count(*)::BIGINT AS cnt FROM ut GROUP BY 1),
      |b AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, count(*)::BIGINT AS both_users
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT ta, tb, both_users,
      |  round(both_users::DOUBLE / (na.cnt + nb.cnt - both_users), 6) AS jaccard
      |FROM b JOIN pt na ON na.event_type = ta JOIN pt nb ON nb.event_type = tb
      |ORDER BY ta, tb""".stripMargin

  // -- skyline (Pareto front) over parts ----------------------------------------

  /** The price/size Pareto FRONT of the parts catalog: parts no other
    * part beats on both dimensions (the classic skyline operator).
    * Scale shape: dominance collapses onto the per-size minimum-price
    * table — p_size is a bounded domain (≤50 values at every SF), so
    * the prefix-min over it is a broadcast-sized self-join and the
    * only data-sized pass is one aggregation + one broadcast probe;
    * never an all-pairs dominance join.
    */
  private def partsSkyline(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        micros(col("p_retailprice")).cast("long").as("price_micros"))
    val m = parts.groupBy(col("p_size").as("ms"))
      .agg(min(col("price_micros")).as("mp"))
    // prefix-min over the ≤50-row size domain (bounded self-join)
    val pm = m.as("a")
      .join(m.select(col("ms").as("bs"), col("mp").as("bp")).as("b"),
        col("bs") < col("ms"), "left")
      .groupBy(col("ms"), col("mp"))
      .agg(min(col("bp")).as("pmin")) // null for the smallest size
    parts.join(broadcast(pm), col("p_size") === col("ms"))
      // dominated ⇔ a strictly-smaller size reaches ≤ price, or the
      // same size reaches a strictly smaller price
      .filter(!(coalesce(col("pmin") <= col("price_micros"), lit(false)) ||
        col("mp") < col("price_micros")))
      .select(col("p_partkey"), col("p_size"), col("price_micros"))
      .orderBy(col("p_size"), col("price_micros"), col("p_partkey"))
  }

  private val partsSkylineSql =
    """WITH p AS (
      |  SELECT p_partkey, p_size,
      |    CAST(p_retailprice * 1000000 AS BIGINT) AS price_micros
      |  FROM part)
      |SELECT p_partkey, p_size, price_micros
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE b.p_size <= a.p_size AND b.price_micros <= a.price_micros
      |    AND (b.p_size < a.p_size OR b.price_micros < a.price_micros))
      |ORDER BY p_size, price_micros, p_partkey""".stripMargin

  // -- Benford first-digit profile ------------------------------------------------

  /** First-significant-digit distribution of event values against
    * Benford's law — the data-quality probe that catches fabricated or
    * truncated numeric feeds. Counts are exact; the expected share is
    * a closed form of the digit.
    */
  private def benford(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .filter(col("value") > 0.0)
      .select(floor(col("value") / pow(lit(10.0), floor(log10(col("value")))))
        .cast("int").as("digit"))
    val tot = d.agg(count(lit(1)).as("tot"))
    d.groupBy("digit").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford_expected"))
      .orderBy("digit")
  }

  private val benfordSql =
    """WITH d AS (
      |  SELECT CAST(floor(value / power(10, floor(log10(value)))) AS INT) AS digit
      |  FROM events WHERE value > 0.0),
      |t AS (SELECT count(*)::BIGINT AS tot FROM d)
      |SELECT digit, count(*)::BIGINT AS n,
      |  round(count(*)::DOUBLE / max(tot), 6) AS share,
      |  round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
      |FROM d CROSS JOIN t GROUP BY digit ORDER BY digit""".stripMargin

  // -- vocabulary coverage curve ---------------------------------------------------

  /** What fraction of all token occurrences the top-N vocabulary words
    * cover, at N ∈ {5, 10, 20} (sized to the generator's 30-word
    * vocabulary; a real corpus would use 10³–10⁵ cut points against
    * the same bounded-frame machinery) — the curve a tokenizer budget
    * is chosen from. Rank and cumulative frequency both come from
    * PrefixSum over the bounded top-1000 frame; the only corpus-sized
    * stages are the tokenize and one aggregation.
    */
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
    // cached: freqs feeds the total aggregation AND the top-1000 cut —
    // uncached, the corpus tokenize+count runs twice
    val freqs = graft.Caches.register(
      toks.groupBy("w").agg(count(lit(1)).as("freq")))
    val total = freqs.agg(sum(col("freq")).as("total_tokens"))
    val top = freqs.orderBy(desc("freq"), col("w")).limit(1000)
      .withColumn("_neg", -col("freq"))
      .withColumn("_one", lit(1L))
    // rank and cumulative frequency share one prefix-sum pass (same
    // order) — see lorenzDeciles
    val cum = graft.ops.PrefixSum.runningTotals(
      top.withColumn("_psg", lit(0)), "_psg", Seq("_neg", "w"),
      Seq("_one" -> "i", "freq" -> "cum_freq")).drop("_psg")
    cum.filter(col("i").isin(5L, 10L, 20L))
      .crossJoin(broadcast(total))
      .select(col("i").as("top_n"), col("cum_freq").as("covered_tokens"),
        col("total_tokens"),
        round(col("cum_freq").cast("double") /
          col("total_tokens").cast("double"), 6).as("coverage"))
      .orderBy("top_n")
  }

  private val vocabCoverageSql =
    """WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
      |  FROM documents),
      |freqs AS (
      |  SELECT w, count(*)::BIGINT AS freq FROM toks
      |  WHERE length(w) >= 2 GROUP BY 1),
      |tt AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens FROM freqs),
      |top AS (SELECT w, freq FROM freqs ORDER BY freq DESC, w LIMIT 1000),
      |ranked AS (
      |  SELECT row_number() OVER (ORDER BY freq DESC, w) AS i,
      |    CAST(sum(freq) OVER (ORDER BY freq DESC, w) AS BIGINT) AS cum_freq
      |  FROM top)
      |SELECT i AS top_n, cum_freq AS covered_tokens, total_tokens,
      |  round(cum_freq::DOUBLE / total_tokens, 6) AS coverage
      |FROM ranked CROSS JOIN tt
      |WHERE i IN (5, 10, 20) ORDER BY top_n""".stripMargin

  // -- hourly-profile KL divergence -------------------------------------------------

  /** KL divergence of each event type's hour-of-day profile from the
    * global profile — "does this event type keep different hours".
    * Distributions are exact count ratios over the bounded 24-hour
    * domain; zero-count hours contribute zero by the usual 0·ln0
    * convention.
    */
  private def hourlyKl(s: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(s, dir)
      .select(col("event_type"), hour(col("ts")).as("h"))
    val byTypeHour = h.groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val byType = h.groupBy("event_type").agg(count(lit(1)).as("tc"))
    val global = h.groupBy("h").agg(count(lit(1)).as("gc"))
    val total = h.agg(count(lit(1)).as("gt"))
    byTypeHour
      .join(broadcast(byType), "event_type")
      .join(broadcast(global), "h")
      .crossJoin(broadcast(total))
      .select(col("event_type"),
        ((col("c").cast("double") / col("tc")) *
          log((col("c").cast("double") / col("tc")) /
            (col("gc").cast("double") / col("gt")))).as("term"))
      .groupBy("event_type")
      .agg(round(sum(col("term")), 6).as("kl_vs_global"))
      .orderBy("event_type")
  }

  private val hourlyKlSql =
    """WITH h AS (SELECT event_type, hour(ts) AS h FROM events),
      |bth AS (SELECT event_type, h, count(*)::BIGINT AS c FROM h GROUP BY 1, 2),
      |bt AS (SELECT event_type, count(*)::BIGINT AS tc FROM h GROUP BY 1),
      |g AS (SELECT h, count(*)::BIGINT AS gc FROM h GROUP BY 1),
      |t AS (SELECT count(*)::BIGINT AS gt FROM h)
      |SELECT bth.event_type,
      |  round(sum((c::DOUBLE / tc) * ln((c::DOUBLE / tc) / (gc::DOUBLE / gt))), 6)
      |    AS kl_vs_global
      |FROM bth JOIN bt ON bth.event_type = bt.event_type
      |JOIN g ON bth.h = g.h CROSS JOIN t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- Lorenz curve of supplier revenue ----------------------------------------------

  /** Lorenz deciles of supplier revenue: the cumulative revenue share
    * of the bottom d/10 of suppliers ranked ascending — the curve the
    * r14 `supplier_gini` scalar summarizes. Supplier count scales
    * with SF, so BOTH the rank and the running revenue come from
    * PrefixSum range shuffles (no global window, no single reducer).
    */
  private def lorenzDeciles(s: SparkSession, dir: String): DataFrame = {
    // cached: rev feeds the prefix-sum pass AND the totals aggregation
    val rev = graft.Caches.register(t(s, dir, "lineitem")
      .groupBy(col("l_suppkey").as("sk"))
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("long").as("rev"))
      .withColumn("_one", lit(1L)))
    // rank AND cumulative revenue share one prefix-sum pass (same
    // order): one range shuffle + one subtotal collect, not two each
    val cum = graft.ops.PrefixSum.runningTotals(
      rev.withColumn("_psg", lit(0)), "_psg", Seq("rev", "sk"),
      Seq("_one" -> "i", "rev" -> "cum_rev")).drop("_psg")
    val totals = rev.agg(count(lit(1)).as("n"), sum(col("rev")).as("tot"))
    cum.crossJoin(broadcast(totals))
      .withColumn("decile", expr("((i * 10 - 1) DIV n) + 1"))
      .groupBy("decile")
      .agg(max(col("i")).as("suppliers_cum"),
        max(col("cum_rev")).as("cum_rev_micros"),
        round(max(col("cum_rev")).cast("double") /
          max(col("tot")).cast("double"), 6).as("rev_share_cum"))
      .orderBy("decile")
  }

  private val lorenzDecilesSql =
    """WITH rev AS (
      |  SELECT l_suppkey AS sk,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * 1000000 AS HUGEINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |ranked AS (
      |  SELECT rev, row_number() OVER (ORDER BY rev, sk) AS i,
      |    CAST(sum(rev) OVER (ORDER BY rev, sk) AS BIGINT) AS cum_rev
      |  FROM rev),
      |t AS (SELECT count(*)::BIGINT AS n, CAST(sum(rev) AS BIGINT) AS tot FROM rev)
      |SELECT ((i * 10 - 1) // n) + 1 AS decile,
      |  CAST(max(i) AS BIGINT) AS suppliers_cum,
      |  CAST(max(cum_rev) AS BIGINT) AS cum_rev_micros,
      |  round(max(cum_rev)::DOUBLE / max(tot), 6) AS rev_share_cum
      |FROM ranked CROSS JOIN t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- Wald–Wolfowitz runs test on the daily order series ------------------------

  /** Runs test of the daily order-count series against its median —
    * the randomness probe that catches regime shifts and autocorrelated
    * feeds (too FEW runs) or oscillating ones (too many). The series is
    * calendar-bounded; adjacency is by present-day ORDER (row index via
    * PrefixSum — no global window), ties at the median discard per the
    * standard test, and the z-statistic is a deterministic function of
    * exact integer (runs, n1, n2).
    */
  private def runsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
    val med = daily.agg(expr("percentile(c, 0.5)").as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("c") =!= col("med"))
      .select(col("day"), (col("c") > col("med")).cast("int").as("sgn"))
      .withColumn("_one", lit(1L))
    val idx = graft.ops.PrefixSum.runningTotalGlobal(signed, Seq("day"), "_one", "i")
    val changes = idx.as("a")
      .join(idx.select(col("i").as("i2"), col("sgn").as("sgn2")).as("b"),
        col("i") + 1 === col("i2"))
      .agg(sum((col("sgn") =!= col("sgn2")).cast("long")).as("chg"))
    val counts = idx.agg(
      sum(col("sgn")).as("n1"),
      sum(lit(1L) - col("sgn")).as("n2"))
    counts.crossJoin(broadcast(changes))
      .select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        (col("chg") + 1).as("runs"),
        round({
          val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
          val r = (col("chg") + 1).cast("double")
          val mu = lit(2.0) * n1 * n2 / (n1 + n2) + 1.0
          val s2 = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2)) /
            ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
          // degenerate series (one-sided, or too short for a positive
          // variance) have no defined z — NULL on both engines
          when(col("n1") > 0 && col("n2") > 0 &&
            lit(2L) * col("n1") * col("n2") > col("n1") + col("n2"),
            (r - mu) / sqrt(s2))
        }, 4).as("z"))
  }

  private val runsTestSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*)::BIGINT AS c
      |  FROM orders GROUP BY 1),
      |med AS (SELECT quantile_cont(c, 0.5) AS med FROM daily),
      |signed AS (
      |  SELECT day, CAST(c > med AS INT) AS sgn,
      |    row_number() OVER (ORDER BY day) AS i
      |  FROM daily CROSS JOIN med WHERE c <> med),
      |chg AS (
      |  SELECT CAST(sum(CASE WHEN a.sgn <> b.sgn THEN 1 ELSE 0 END) AS BIGINT) AS chg
      |  FROM signed a JOIN signed b ON a.i + 1 = b.i),
      |cnt AS (
      |  SELECT CAST(sum(sgn) AS BIGINT) AS n1,
      |    CAST(sum(1 - sgn) AS BIGINT) AS n2 FROM signed)
      |SELECT n1, n2, chg + 1 AS runs,
      |  CASE WHEN n1 > 0 AND n2 > 0 AND 2*n1*n2 > n1 + n2 THEN
      |    round(((chg + 1) - (2.0*n1*n2/(n1+n2) + 1.0))
      |      / sqrt((2.0*n1*n2*(2.0*n1*n2 - n1 - n2))
      |             / ((n1+n2)*(n1+n2)*(n1+n2-1.0))), 4)
      |  END AS z
      |FROM cnt CROSS JOIN chg""".stripMargin

  // -- Jensen–Shannon divergence between source vocabularies ----------------------

  /** Pairwise Jensen–Shannon divergence between the sources' word
    * distributions — "do these corpora speak the same language", the
    * symmetric bounded cousin of KL used for corpus mixing decisions.
    * The word×source grid zero-fills absences so one-sided words
    * contribute their full p·ln2; source pairs are a bounded triangle.
    */
  private def jsDivergence(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
    val counts = toks.groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy("source").agg(sum(col("cnt")).as("tc"))
    val grid = counts.select("w").distinct()
      .crossJoin(broadcast(tot))
      .join(counts, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        (coalesce(col("cnt"), lit(0L)).cast("double") / col("tc")).as("p"))
    val pairs = grid.as("a")
      .join(grid.select(col("source").as("sb"), col("w"),
        col("p").as("q")).as("b"), Seq("w"))
      .filter(col("source") < col("sb"))
    def term(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      when(x > 0.0, x * log(lit(2.0) * x / (x + y))).otherwise(lit(0.0))
    pairs.groupBy(col("source").as("source_a"), col("sb").as("source_b"))
      .agg(round(lit(0.5) * sum(term(col("p"), col("q")) +
        term(col("q"), col("p"))), 6).as("js"))
      .orderBy("source_a", "source_b")
  }

  private val jsDivergenceSql =
    """WITH toks AS (
      |  SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
      |  FROM documents),
      |counts AS (
      |  SELECT source, w, count(*)::BIGINT AS cnt FROM toks
      |  WHERE length(w) >= 2 GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tc FROM counts GROUP BY 1),
      |grid AS (
      |  SELECT t.source, v.w, COALESCE(c.cnt, 0)::DOUBLE / t.tc AS p
      |  FROM (SELECT DISTINCT w FROM counts) v
      |  CROSS JOIN tot t
      |  LEFT JOIN counts c ON c.source = t.source AND c.w = v.w),
      |pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b, a.p AS p, b.p AS q
      |  FROM grid a JOIN grid b ON a.w = b.w AND a.source < b.source)
      |SELECT source_a, source_b,
      |  round(0.5 * sum(
      |    (CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0 END) +
      |    (CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0 END)), 6) AS js
      |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- traffic concentration across hours ------------------------------------------

  /** Gini coefficient of the hourly traffic distribution — one number
    * for "how peaked is the load curve" (0 = flat, →1 = one rush
    * hour), the capacity-planning companion of `events_hourly_kl`.
    * The 24-bin domain is bounded, so the exact pairwise |xi−xj| form
    * is a ≤24² self-join over an aggregate; every term is an exact
    * integer until the final division.
    */
  private def trafficGini(s: SparkSession, dir: String): DataFrame = {
    val hours = Tables.events(s, dir)
      .groupBy(hour(col("ts")).as("h")).agg(count(lit(1)).as("c"))
    val pairs = hours.as("a")
      .join(hours.select(col("h").as("h2"), col("c").as("c2")).as("b"), lit(true))
    pairs.agg(
        sum(abs(col("c") - col("c2"))).as("num"),
        count(lit(1)).as("n2"),
        sum(col("c")).as("sc"))
      .select(round(col("num").cast("double") /
        (lit(2.0) * sqrt(col("n2").cast("double")) * col("sc")), 6).as("hour_gini"))
  }

  private val trafficGiniSql =
    """WITH hours AS (
      |  SELECT hour(ts) AS h, count(*)::BIGINT AS c FROM events GROUP BY 1),
      |p AS (
      |  SELECT CAST(sum(abs(a.c - b.c)) AS BIGINT) AS num,
      |    count(*)::BIGINT AS n2, CAST(sum(a.c) AS BIGINT) AS sc
      |  FROM hours a CROSS JOIN hours b)
      |SELECT round(num::DOUBLE / (2.0 * sqrt(n2::DOUBLE) * sc), 6) AS hour_gini
      |FROM p""".stripMargin

  // -- log-normal fit of document lengths --------------------------------------------

  /** Log-normal parameters of each source's document-length
    * distribution (μ, σ of ln n_chars) — the two numbers that
    * summarize a corpus's length profile and feed packing/chunking
    * budgets; natural text is famously log-normal. One aggregation;
    * moments are sums the engines fold identically to rounding.
    */
  private def lengthLognormal(s: SparkSession, dir: String): DataFrame = {
    val ln = Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .select(col("source"), log(col("n_chars").cast("double")).as("x"))
    ln.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("x")), 4).as("ln_mu"),
        round(sqrt(avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))), 4)
          .as("ln_sigma"))
      .orderBy("source")
  }

  private val lengthLognormalSql =
    """WITH l AS (
      |  SELECT source, ln(n_chars::DOUBLE) AS x FROM documents WHERE n_chars > 0)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |  round(avg(x), 4) AS ln_mu,
      |  round(sqrt(avg(x*x) - avg(x)*avg(x)), 4) AS ln_sigma
      |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("orders_runs_test", runsTest, Some(runsTestSql)),
    QueryDef("docs_js_divergence", jsDivergence, Some(jsDivergenceSql)),
    QueryDef("events_hour_gini", trafficGini, Some(trafficGiniSql)),
    QueryDef("docs_length_lognormal", lengthLognormal, Some(lengthLognormalSql)),
    QueryDef("parts_skyline", partsSkyline, Some(partsSkylineSql)),
    QueryDef("events_benford", benford, Some(benfordSql)),
    QueryDef("docs_vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    QueryDef("events_hourly_kl", hourlyKl, Some(hourlyKlSql)),
    QueryDef("supplier_lorenz_deciles", lorenzDeciles, Some(lorenzDecilesSql)),
    QueryDef("customers_revenue_pareto", revenuePareto, Some(revenueParetoSql)),
    QueryDef("events_wilson_ctr", wilsonCtr, Some(wilsonCtrSql)),
    QueryDef("text_zipf_fit", zipfFit, Some(zipfFitSql)),
    QueryDef("lineitem_price_qty_ols", priceQtyOls, Some(priceQtyOlsSql)),
    QueryDef("events_type_overlap", typeOverlap, Some(typeOverlapSql)),
  )
}
