package graft.plans

import graft.SparkSpec
import graft.cdc.MergeTable

/** Histogram-driven skew salting: ANALYZE's heavy-hitter bins change
  * the SHUFFLE PLAN of joins whose skew default AQE cannot see (its
  * byte thresholds — 256 MB/partition — never fire at these sizes,
  * yet one reducer would still take ~90% of the rows). The rewrite
  * must be result-identical and must decline broadcasts and
  * histogram-less tables.
  */
class SaltSkewedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  test("heavyValues reads the skew signal out of equi-height bins") {
    import MergeTable.{Hist, HistBin}
    // 10 bins of height 100 over 1000 rows: k=7 spans 9 bins (90%)
    val h = Hist(100.0, Seq.fill(9)(HistBin(7, 7, 1)) :+ HistBin(8, 1000, 91))
    assert(SaltSkewedJoin.heavyValues(h, 1000, 0.05) === Seq(7.0))
    // a value at exactly one bin (10%) passes a 5% floor, fails 20%
    val h2 = Hist(100.0, HistBin(3, 3, 1) +: Seq.fill(9)(HistBin(4, 1000, 100)))
    assert(SaltSkewedJoin.heavyValues(h2, 1000, 0.05) === Seq(3.0))
    assert(SaltSkewedJoin.heavyValues(h2, 1000, 0.2) === Nil)
    // range bins never count, zero rows never divide
    assert(SaltSkewedJoin.heavyValues(Hist(1.0, Seq(HistBin(1, 9, 5))), 10, 0.01) === Nil)
    assert(SaltSkewedJoin.heavyValues(h, 0, 0.05) === Nil)
  }

  test("a histogram-flagged heavy key salts the shuffle join; results identical") {
    fresh("ssj1")
    spark.sql("""CREATE TABLE graft.ssj1.f (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""CREATE TABLE graft.ssj1.d (id BIGINT, k BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    // 90% of fact rows share k=7 — the one-reducer key at any scale
    (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L))
      .toDF("id", "k").createOrReplaceTempView("ssj1_f")
    (1 to 2000).map(i => (i.toLong, i.toLong, s"v$i"))
      .toDF("id", "k", "v").createOrReplaceTempView("ssj1_d")
    spark.sql("INSERT INTO graft.ssj1.f SELECT * FROM ssj1_f")
    spark.sql("INSERT INTO graft.ssj1.d SELECT * FROM ssj1_d")
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ssj1.f COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val q = """SELECT f.id, d.v FROM graft.ssj1.f f
               JOIN graft.ssj1.d d ON f.k = d.k"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val salted = spark.sql(q)
      val plan = salted.queryExecution.optimizedPlan.toString
      assert(plan.contains(SaltSkewedJoin.SaltCol),
        s"histogram-flagged key must salt the join:\n$plan")
      assert(plan.toLowerCase.contains("explode"),
        s"the dim side must replicate heavy keys:\n$plan")
      val saltedRows = salted.as[(Long, String)].collect().sorted.toSeq
      // ground truth with the rewrite off
      val plain = withSQLConf("graft.skew.salting.enabled" -> "false") {
        val p = spark.sql(q)
        assert(!p.queryExecution.optimizedPlan.toString.contains(SaltSkewedJoin.SaltCol))
        p.as[(Long, String)].collect().sorted.toSeq
      }
      assert(saltedRows === plain, "salting must be result-identical")
      // the heavy key's matches all present exactly once
      assert(saltedRows.count(_._2 == "v7") === 1800)
    }
  }

  test("multi-conjunct joins salt the heavy key; the other predicates ride along") {
    fresh("ssj3")
    spark.sql("""CREATE TABLE graft.ssj3.f (id BIGINT, k BIGINT, grp BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""CREATE TABLE graft.ssj3.d (id BIGINT, k BIGINT, grp BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L, i.toLong % 3))
      .toDF("id", "k", "grp").createOrReplaceTempView("ssj3_f")
    (1 to 2000).map(i => (i.toLong, i.toLong, i.toLong % 3, s"v$i"))
      .toDF("id", "k", "grp", "v").createOrReplaceTempView("ssj3_d")
    spark.sql("INSERT INTO graft.ssj3.f SELECT * FROM ssj3_f")
    spark.sql("INSERT INTO graft.ssj3.d SELECT * FROM ssj3_d")
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ssj3.f COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val q = """SELECT f.id, d.v FROM graft.ssj3.f f
               JOIN graft.ssj3.d d ON f.k = d.k AND f.grp = d.grp AND f.id < 1500"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val salted = spark.sql(q)
      assert(salted.queryExecution.optimizedPlan.toString
        .contains(SaltSkewedJoin.SaltCol),
        s"heavy key in a multi-conjunct join must still salt:\n${salted.queryExecution.optimizedPlan}")
      val got = salted.as[(Long, String)].collect().sorted.toSeq
      val plain = withSQLConf("graft.skew.salting.enabled" -> "false") {
        spark.sql(q).as[(Long, String)].collect().sorted.toSeq
      }
      assert(got === plain, "extra equi/range conjuncts must not change results")
      // ground truth spot check: k=7 on f matches only d.id=7 and only
      // when grp aligns (7 % 3 == 1)
      assert(got.count(_._2 == "v7") ===
        (1 to 1499).count(i => i % 10 != 0 && i % 3 == 1))
    }
  }

  test("co-bucketed mergetables keep the ZERO-shuffle SPJ — salting declines") {
    fresh("ssj4")
    // both sides bucketed on id with the SAME count; the join carries
    // id = id (SPJ-covered) plus a histogram-heavy k = k conjunct —
    // the r14 latent bug salted here, turning zero shuffles into two
    for (t <- Seq("f", "d")) {
      spark.sql(s"""CREATE TABLE graft.ssj4.$t (id BIGINT, k BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    }
    (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L, s"f$i"))
      .toDF("id", "k", "v").createOrReplaceTempView("ssj4_f")
    (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L, s"d$i"))
      .toDF("id", "k", "v").createOrReplaceTempView("ssj4_d")
    spark.sql("INSERT INTO graft.ssj4.f SELECT * FROM ssj4_f")
    spark.sql("INSERT INTO graft.ssj4.d SELECT * FROM ssj4_d")
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ssj4.f COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val q = """SELECT f.id, d.v FROM graft.ssj4.f f
               JOIN graft.ssj4.d d ON f.id = d.id AND f.k = d.k"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      assert(!j.queryExecution.optimizedPlan.toString.contains(SaltSkewedJoin.SaltCol),
        s"co-bucketed SPJ pair must not salt:\n${j.queryExecution.optimizedPlan}")
      assert(shuffles(j) === 0,
        s"the storage-partitioned join must survive the salting rule:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 2000)
    }
  }

  test("composite-key skew salts the CONJUNCTION of heavy lists; results identical") {
    fresh("ssj5")
    spark.sql("""CREATE TABLE graft.ssj5.f (id BIGINT, k BIGINT, grp BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""CREATE TABLE graft.ssj5.d (id BIGINT, k BIGINT, grp BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    // 90% of f shares the TUPLE (k=7, grp=1); the other rows spread
    (1 to 2000).map { i =>
      if (i % 10 == 0) (i.toLong, i.toLong, i.toLong % 5)
      else (i.toLong, 7L, 1L)
    }.toDF("id", "k", "grp").createOrReplaceTempView("ssj5_f")
    (1 to 2000).map(i => (i.toLong, i.toLong, i.toLong % 5, s"v$i"))
      .toDF("id", "k", "grp", "v").createOrReplaceTempView("ssj5_d")
    spark.sql("INSERT INTO graft.ssj5.f SELECT * FROM ssj5_f")
    spark.sql("INSERT INTO graft.ssj5.d SELECT * FROM ssj5_d")
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ssj5.f COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val q = """SELECT f.id, d.v FROM graft.ssj5.f f
               JOIN graft.ssj5.d d ON f.k = d.k AND f.grp = d.grp"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val salted = spark.sql(q)
      val plan = salted.queryExecution.optimizedPlan.toString
      assert(plan.contains(SaltSkewedJoin.SaltCol),
        s"jointly-pinned heavy tuple must salt:\n$plan")
      // BOTH key columns participate in the heavy tag (the composite
      // lever): k's singleton list folds to `k = 7`, grp's stays an
      // IN over its heavy values {1 (90%), 0 (10%)}
      assert("""CASE WHEN \(\(k#\d+L = 7\) AND grp#\d+L IN \(0,1\)\)""".r
        .findFirstIn(plan).isDefined,
        s"the heavy tag must be the conjunction of per-column lists:\n$plan")
      val got = salted.as[(Long, String)].collect().sorted.toSeq
      val plain = withSQLConf("graft.skew.salting.enabled" -> "false") {
        spark.sql(q).as[(Long, String)].collect().sorted.toSeq
      }
      assert(got === plain, "conjunction salting must be result-identical")
      // tuple (7,1) matches only d.id=7 (7 % 5 != 1 is false: 7%5=2)…
      // ground truth: d rows with (k=i, grp=i%5) meet f tuples
      assert(got.nonEmpty)
    }
  }

  test("LEFT JOIN with a skewed preserved side salts; null extensions identical") {
    fresh("ssj6")
    spark.sql("""CREATE TABLE graft.ssj6.f (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""CREATE TABLE graft.ssj6.d (id BIGINT, k BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    // f's k: 90% heavy on 7, the rest 1..2000 — but d only covers
    // k ≤ 1000, so half the non-heavy rows NULL-extend
    (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L))
      .toDF("id", "k").createOrReplaceTempView("ssj6_f")
    (1 to 1000).map(i => (i.toLong, i.toLong, s"v$i"))
      .toDF("id", "k", "v").createOrReplaceTempView("ssj6_d")
    spark.sql("INSERT INTO graft.ssj6.f SELECT * FROM ssj6_f")
    spark.sql("INSERT INTO graft.ssj6.d SELECT * FROM ssj6_d")
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ssj6.f COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val q = """SELECT f.id, d.v FROM graft.ssj6.f f
               LEFT JOIN graft.ssj6.d d ON f.k = d.k"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val salted = spark.sql(q)
      assert(salted.queryExecution.optimizedPlan.toString
        .contains(SaltSkewedJoin.SaltCol),
        s"left-skewed LEFT JOIN must salt:\n${salted.queryExecution.optimizedPlan}")
      val got = salted.as[(Long, Option[String])].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val plain = withSQLConf("graft.skew.salting.enabled" -> "false") {
        spark.sql(q).as[(Long, Option[String])].collect()
          .sortBy(r => (r._1, r._2)).toSeq
      }
      assert(got === plain,
        "outer salting must preserve matches AND null extensions")
      // ground truth: ids 1010,1020,…,2000 carry k>1000 → unmatched
      assert(got.count(_._2.isEmpty) === 100)
      assert(got.count(_._2.contains("v7")) === 1800)
    }

    // LEFT SEMI with the same skewed left side also salts, identically
    val qs = """SELECT f.id FROM graft.ssj6.f f
                LEFT SEMI JOIN graft.ssj6.d d ON f.k = d.k"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val semi = spark.sql(qs)
      assert(semi.queryExecution.optimizedPlan.toString
        .contains(SaltSkewedJoin.SaltCol),
        s"left-skewed LEFT SEMI must salt:\n${semi.queryExecution.optimizedPlan}")
      val got = semi.as[Long].collect().sorted.toSeq
      val plain = withSQLConf("graft.skew.salting.enabled" -> "false") {
        spark.sql(qs).as[Long].collect().sorted.toSeq
      }
      assert(got === plain)
      assert(got.size === 1800 + 100) // heavy matches + ids 10..1000
    }

    // a skewed REPLICATED side must decline: salting would duplicate
    // preserved rows — d is the heavy side here, f carries no stats
    val qr = """SELECT d.id, f.id FROM graft.ssj6.d d
                LEFT JOIN graft.ssj6.f f ON d.k = f.k"""
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // d (left, preserved) has no histograms; f (right, replicated
      // candidate) is the analyzed heavy one → orientation unsound
      assert(!spark.sql(qr).queryExecution.optimizedPlan.toString
        .contains(SaltSkewedJoin.SaltCol),
        "a LEFT JOIN whose heavy side is the inner one must stay unsalted")
    }
  }

  test("broadcastable joins and histogram-less tables stay unsalted") {
    fresh("ssj2")
    spark.sql("""CREATE TABLE graft.ssj2.f (id BIGINT, k BIGINT)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""CREATE TABLE graft.ssj2.d (id BIGINT, k BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    (1 to 500).map(i => (i.toLong, 7L)).toDF("id", "k")
      .createOrReplaceTempView("ssj2_f")
    (1 to 500).map(i => (i.toLong, i.toLong, s"v$i")).toDF("id", "k", "v")
      .createOrReplaceTempView("ssj2_d")
    spark.sql("INSERT INTO graft.ssj2.f SELECT * FROM ssj2_f")
    spark.sql("INSERT INTO graft.ssj2.d SELECT * FROM ssj2_d")
    val q = """SELECT f.id, d.v FROM graft.ssj2.f f
               JOIN graft.ssj2.d d ON f.k = d.k"""
    // no ANALYZE at all → no histogram → no salt even with no broadcast
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      assert(!spark.sql(q).queryExecution.optimizedPlan.toString
        .contains(SaltSkewedJoin.SaltCol), "histogram-less table must not salt")
    }
    // histogram present but the dim broadcasts → no shuffle to salt
    withSQLConf("graft.mergetable.histogramBins" -> "10") {
      spark.sql("ANALYZE TABLE graft.ssj2.f COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    assert(!spark.sql(q).queryExecution.optimizedPlan.toString
      .contains(SaltSkewedJoin.SaltCol), "broadcastable join must not salt")
  }
}
