package graft.plans

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Transparent MV rewrite: registered+fresh definitions answer
  * structurally-equal query subtrees from their parquet
  * materialization; anything else falls through to base tables.
  *
  * DataFrames analyze (and therefore rewrite) EAGERLY at
  * construction, so every "expected" comparison plan here is built
  * only after the view is marked stale.
  */
class MaterializedViewSpec extends SparkSpec {

  private def agg(): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2)
          .as("total"))

  /** Root paths of every parquet scan, AQE disabled so the physical
    * tree is directly traversable.
    */
  private def scanPaths(build: => DataFrame): Seq[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.rootPaths.map(_.toString)
    }.flatten
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def fresh(name: String): String = {
    val p = s"target/test_tmp/mv_$name"
    def nuke(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(nuke)
      f.delete()
    }
    nuke(new java.io.File(p))
    p
  }

  override def afterAll(): Unit = {
    MaterializedViews.clear()
    super.afterAll()
  }

  test("fresh MV answers an identically-built query from its parquet") {
    val path = fresh("hit")
    MaterializedViews.register("mv_hit", () => agg(), path)
    MaterializedViews.refresh("mv_hit")
    val q = agg().filter(col("n") > 0).orderBy("o_orderpriority")
    val paths = scanPaths(q)
    assert(paths.exists(_.contains("mv_hit")), paths.mkString(","))
    assert(!paths.exists(_.contains("orders")), paths.mkString(","))
    val got = q.collect().toSeq
    // base-table answer, computed with the rewrite out of the way
    MaterializedViews.markStale("mv_hit")
    val expect = agg().filter(col("n") > 0).orderBy("o_orderpriority").collect().toSeq
    assert(got === expect)
    MaterializedViews.deregister("mv_hit")
  }

  test("stale or unrefreshed MVs never rewrite") {
    val path = fresh("stale")
    MaterializedViews.register("mv_stale", () => agg(), path)
    // registered but never refreshed -> base scan
    assert(scanPaths(agg()).exists(_.contains("orders")))
    MaterializedViews.refresh("mv_stale")
    MaterializedViews.markStale("mv_stale")
    assert(scanPaths(agg()).exists(_.contains("orders")))
    MaterializedViews.deregister("mv_stale")
  }

  test("a different aggregate shape falls through to base tables") {
    val path = fresh("miss")
    MaterializedViews.register("mv_miss", () => agg(), path)
    MaterializedViews.refresh("mv_miss")
    val other = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val paths = scanPaths(other)
    assert(paths.exists(_.contains("orders")), paths.mkString(","))
    assert(!paths.exists(_.contains("mv_miss")), paths.mkString(","))
    MaterializedViews.deregister("mv_miss")
  }

  test("rewritten subtree keeps attribute identity under consumers") {
    val path = fresh("attrs")
    MaterializedViews.register("mv_attrs", () => agg(), path)
    MaterializedViews.refresh("mv_attrs")
    // consumer renames and reorders the subtree's columns
    val got = agg().select(col("total").as("t2"), col("o_orderpriority"))
      .orderBy("o_orderpriority").collect().toSeq
    MaterializedViews.markStale("mv_attrs")
    val expect = agg().select(col("total").as("t2"), col("o_orderpriority"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(got === expect)
    MaterializedViews.deregister("mv_attrs")
  }

  test("gate query mv_rewrite is answered by the materialization") {
    val paths = scanPaths(graft.SparkEntry.queries("mv_rewrite")(spark, sfDir))
    assert(paths.exists(_.contains("mvstore_")), paths.mkString(","))
    assert(!paths.exists(_.contains("orders.parquet")), paths.mkString(","))
    graft.Caches.clear() // fires the module's markStale hook
    MaterializedViews.deregister("mv_orders_by_priority")
  }

  private def fineAgg(): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"),
        min(col("o_orderdate")).as("first_d"),
        max(col("o_orderdate")).as("last_d"))

  test("GROUP BY subset of the view's keys answers by re-aggregating the store") {
    val path = fresh("rollup")
    MaterializedViews.register("mv_rollup", () => fineAgg(), path)
    MaterializedViews.refresh("mv_rollup")
    def coarse() = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("total"),
        min(col("o_orderdate")).as("first_d"),
        max(col("o_orderdate")).as("last_d"))
      .orderBy("o_orderpriority")
    val paths = scanPaths(coarse())
    assert(paths.exists(_.contains("mv_rollup")), paths.mkString(","))
    assert(!paths.exists(_.contains("orders")), paths.mkString(","))
    val got = coarse().collect().toSeq
    MaterializedViews.markStale("mv_rollup")
    assert(got === coarse().collect().toSeq)
    MaterializedViews.deregister("mv_rollup")
  }

  test("avg over an integral column derives from the view's sum and count") {
    val path = fresh("rollup_avg")
    def fine() = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(sum(col("o_custkey")).as("s"), count(col("o_custkey")).as("c"))
    def q() = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(avg(col("o_custkey")).as("a"))
      .orderBy("o_orderpriority")
    val direct = q().collect().toSeq // truth, computed before the view exists
    MaterializedViews.register("mv_rollup_avg", () => fine(), path)
    MaterializedViews.refresh("mv_rollup_avg")
    val paths = scanPaths(q())
    assert(paths.exists(_.contains("rollup_avg")), paths.mkString(","))
    assert(!paths.exists(_.contains("orders")), paths.mkString(","))
    // long sums re-aggregate exactly and stay under 2^53, so the
    // derived sum-of-sums / sum-of-counts is bit-equal to direct avg
    assert(q().collect().toSeq === direct)
    MaterializedViews.deregister("mv_rollup_avg")
  }

  test("avg derivation refuses float inputs and a missing non-null count") {
    val path = fresh("rollup_avg_no")
    // count(*) is NOT count(x): without the non-null count of the
    // averaged column the rollup must refuse (null rows would skew)
    def fine() = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(sum(col("o_custkey")).as("s"), count(lit(1)).as("c"),
        sum(col("o_totalprice")).as("ts"), count(col("o_totalprice")).as("tc"))
    MaterializedViews.register("mv_rollup_avg_no", () => fine(), path)
    MaterializedViews.refresh("mv_rollup_avg_no")
    val starQ = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(avg(col("o_custkey")).as("a"))
    assert(scanPaths(starQ).exists(_.contains("orders")),
      "count(*) must not stand in for count(x)")
    // double column: sum-of-partial-sums reorders float addition —
    // refused even though both inputs are materialized
    val dblQ = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(avg(col("o_totalprice")).as("a"))
    assert(scanPaths(dblQ).exists(_.contains("orders")),
      "float avg must not derive from partial sums")
    MaterializedViews.deregister("mv_rollup_avg_no")
  }

  test("avg derivation refuses when the store's sums outgrow double-exact range") {
    val path = fresh("rollup_avg_big")
    // inflate the summed column past 2^53 per group: exact long sums
    // and double accumulation then diverge in low-order bits, so the
    // footer-stat magnitude guard must refuse the rewrite
    val k = 1L << 40
    def fine() = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(sum(col("o_custkey") * k).as("s"), count(col("o_custkey") * k).as("c"))
    MaterializedViews.register("mv_rollup_avg_big", () => fine(), path)
    MaterializedViews.refresh("mv_rollup_avg_big")
    val q = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(avg(col("o_custkey") * k).as("a"))
    assert(scanPaths(q).exists(_.contains("orders")),
      "sums past 2^53 must refuse the avg rollup")
    // the magnitude guard is per-column, not a blanket refusal: the
    // small-sum view from the earlier case still derives
    MaterializedViews.deregister("mv_rollup_avg_big")
  }

  test("rollup refuses what it cannot derive exactly") {
    val path = fresh("rollup_no")
    MaterializedViews.register("mv_rollup_no", () => fineAgg(), path)
    MaterializedViews.refresh("mv_rollup_no")
    // avg is not derivable from (count, sum) here — no rollup entry for it
    val avgQ = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(avg(col("o_totalprice")).as("a"))
    assert(scanPaths(avgQ).exists(_.contains("orders")))
    // distinct counts never roll up
    val dQ = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(countDistinct(col("o_orderstatus")).as("d"))
    assert(scanPaths(dQ).exists(_.contains("orders")))
    // grouping key outside the view's grouping set falls through
    val gQ = Tables.load(spark, sfDir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(scanPaths(gQ).exists(_.contains("orders")))
    MaterializedViews.deregister("mv_rollup_no")
  }

  test("gate query mv_rollup re-aggregates the store, not the fact table") {
    val paths = scanPaths(graft.SparkEntry.queries("mv_rollup")(spark, sfDir))
    assert(paths.exists(_.contains("mvstore_rollup")), paths.mkString(","))
    assert(!paths.exists(_.contains("orders.parquet")), paths.mkString(","))
    graft.Caches.clear() // fires the module's markStale hook
    MaterializedViews.deregister("mv_orders_by_pri_status")
  }

  test("incremental MV: feed folds match recompute; commits auto-stale") {
    import graft.cdc.MergeTable
    import spark.implicits._
    val root = fresh("inc_table")
    val store = fresh("inc_store")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
        .toDF("id", "grp", "v")))
    MaterializedViews.registerIncremental("mv_inc_spec", t,
      Seq("grp"), Seq("v"), store)
    MaterializedViews.refreshIncremental("mv_inc_spec")
    // fresh at seed: served from the materialization
    assert(scanPaths(MaterializedViews.incrementalDefinition("mv_inc_spec"))
      .exists(_.contains("inc_store")))
    // insert + update + delete, then fold the feed
    t.upsert(Seq((4L, "b", 7.0), (2L, "a", 25.0)).toDF("id", "grp", "v"))
    // a commit past the materialized version auto-stales the rewrite
    assert(scanPaths(MaterializedViews.incrementalDefinition("mv_inc_spec"))
      .exists(_.contains("inc_table")))
    t.delete(Seq(1L).toDF("id"))
    MaterializedViews.refreshIncremental("mv_inc_spec")
    val served = MaterializedViews.incrementalDefinition("mv_inc_spec")
    assert(scanPaths(served).exists(_.contains("inc_store")))
    val got = served.orderBy("grp")
      .select($"grp", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().toSeq
    // truth from the table rows themselves (no plan to rewrite)
    assert(got === Seq(("a", 1L, 25.0), ("b", 2L, 12.0)))
    MaterializedViews.deregisterIncremental("mv_inc_spec")
  }

  test("incremental MV drops a group the feed empties") {
    import graft.cdc.MergeTable
    import spark.implicits._
    val root = fresh("inc_drop_t")
    val store = fresh("inc_drop_s")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "solo", 1.0), (2L, "both", 2.0), (3L, "both", 3.0))
        .toDF("id", "grp", "v")))
    MaterializedViews.registerIncremental("mv_inc_drop", t,
      Seq("grp"), Seq("v"), store)
    MaterializedViews.refreshIncremental("mv_inc_drop")
    t.delete(Seq(1L).toDF("id"))
    MaterializedViews.refreshIncremental("mv_inc_drop")
    val rows = MaterializedViews.incrementalDefinition("mv_inc_drop")
      .select("grp").as[String].collect().toSeq
    assert(rows === Seq("both"))
    MaterializedViews.deregisterIncremental("mv_inc_drop")
  }

  test("gate query mv_incremental folds its feed into the oracle answer") {
    val df = graft.SparkEntry.queries("mv_incremental")(spark, sfDir)
    assert(scanPaths(df).exists(_.contains("mv_inc_store")))
    assert(df.count() > 0)
    graft.Caches.clear()
    MaterializedViews.deregisterIncremental("mv_events_by_type")
  }

  test("stream-maintained incremental MV follows live commits") {
    import graft.cdc.MergeTable
    import spark.implicits._
    val root = fresh("stream_t")
    val store = fresh("stream_s")
    val ckpt = fresh("stream_ckpt")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
        .toDF("id", "grp", "v")),
      mode = MergeTable.MergeOnRead)
    MaterializedViews.registerIncremental("mv_stream", t,
      Seq("grp"), Seq("v"), store)
    val q = MaterializedViews.maintainStreaming("mv_stream", ckpt)
    try {
      // ground truth aggregated OUTSIDE Spark so the rewrite cannot
      // answer its own check
      def truth(): Seq[(String, Long, Double)] =
        t.read().select($"grp", $"v").as[(String, Double)].collect()
          .groupBy(_._1).map { case (g, rs) => (g, rs.length.toLong, rs.map(_._2).sum) }
          .toSeq.sortBy(_._1)
      def served(): Seq[(String, Long, Double)] = {
        val df = MaterializedViews.incrementalDefinition("mv_stream")
        assert(scanPaths(df).exists(_.contains("stream_s")),
          "definition not served from the stream-maintained store")
        df.orderBy("grp").select($"grp", $"n_rows", $"sum_v".cast("double"))
          .as[(String, Long, Double)].collect().toSeq
      }
      q.processAllAvailable()
      assert(served() === truth())
      // live commits: insert + update, then a delete emptying nothing
      t.upsert(Seq((4L, "b", 7.0), (2L, "a", 25.0)).toDF("id", "grp", "v"))
      q.processAllAvailable()
      assert(served() === truth())
      t.delete(Seq(1L).toDF("id"))
      q.processAllAvailable()
      assert(served() === truth())
      // a delete emptying a whole group drops its row
      t.delete(Seq(2L).toDF("id"))
      q.processAllAvailable()
      assert(served() === truth())
      assert(served().map(_._1) === Seq("b"))
    } finally q.stop()
    MaterializedViews.deregisterIncremental("mv_stream")
  }

  test("mutating the base parquet auto-stales the rewrite without markStale") {
    import spark.implicits._
    val base = fresh("fp_base")
    val path = fresh("fp_store")
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.mode("overwrite").parquet(base)
    def defn(): DataFrame =
      spark.read.parquet(base).groupBy("k").agg(sum("v").as("s"))
    MaterializedViews.register("mv_fp", () => defn(), path)
    MaterializedViews.refresh("mv_fp")
    // fresh + fingerprint-matching: served from the materialization
    assert(scanPaths(defn()).exists(_.contains("fp_store")))
    // overwrite the base — NO markStale, NO refresh
    Seq(("a", 10L), ("c", 5L)).toDF("k", "v")
      .write.mode("overwrite").parquet(base)
    // the fingerprint mismatch suppresses the rewrite: the query
    // answers from the NEW base data, not the stale materialization
    val q = defn()
    assert(scanPaths(q).exists(_.contains("fp_base")), "served stale MV")
    assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("a", 10L), ("c", 5L)))
    // an explicit refresh restores the rewrite against the new base
    MaterializedViews.refresh("mv_fp")
    assert(scanPaths(defn()).exists(_.contains("fp_store")))
    assert(defn().orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("a", 10L), ("c", 5L)))
    MaterializedViews.deregister("mv_fp")
  }

  test("appending a file to the base also auto-stales the rewrite") {
    import spark.implicits._
    val base = fresh("fp_app_base")
    val path = fresh("fp_app_store")
    Seq(("a", 1L)).toDF("k", "v").write.mode("overwrite").parquet(base)
    def defn(): DataFrame =
      spark.read.parquet(base).groupBy("k").agg(sum("v").as("s"))
    MaterializedViews.register("mv_fp_app", () => defn(), path)
    MaterializedViews.refresh("mv_fp_app")
    assert(scanPaths(defn()).exists(_.contains("fp_app_store")))
    Seq(("a", 100L)).toDF("k", "v").write.mode("append").parquet(base)
    val q = defn()
    assert(scanPaths(q).exists(_.contains("fp_app_base")), "served stale MV")
    assert(q.as[(String, Long)].collect().toSeq === Seq(("a", 101L)))
    MaterializedViews.deregister("mv_fp_app")
  }

  test("avg rollup of an all-null group derives NULL, not a division error") {
    import spark.implicits._
    val base = fresh("rollup_avg_null_base")
    val path = fresh("rollup_avg_null")
    // group "B" has an all-null averaged column: its count(x) sums to
    // 0 across the view's finer groups, so the derived division must
    // ride Average's LEGACY semantics (NULL) — under the session's
    // ANSI default a bare Divide would throw DIVIDE_BY_ZERO
    Seq(("A", 1, Some(10L)), ("A", 2, Some(20L)),
        ("B", 1, Option.empty[Long]), ("B", 2, Option.empty[Long]))
      .toDF("g", "sub", "x").write.mode("overwrite").parquet(base)
    def fine() = spark.read.parquet(base).groupBy("g", "sub")
      .agg(sum(col("x")).as("s"), count(col("x")).as("c"))
    MaterializedViews.register("mv_rollup_avg_null", () => fine(), path)
    MaterializedViews.refresh("mv_rollup_avg_null")
    def q() = spark.read.parquet(base)
      .groupBy("g").agg(avg(col("x")).as("a")).orderBy("g")
    assert(scanPaths(q()).exists(_.contains("rollup_avg_null")),
      "rewrite did not fire; the test would not exercise the derived divide")
    assert(q().as[(String, Option[Double])].collect().toSeq ===
      Seq(("A", Some(15.0)), ("B", None)))
    MaterializedViews.deregister("mv_rollup_avg_null")
  }

  test("refresh after base mutation re-materializes current data") {
    import spark.implicits._
    val base = fresh("base_data")
    val path = fresh("refresh")
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
      .write.mode("overwrite").parquet(base)
    def defn(): DataFrame =
      spark.read.parquet(base).groupBy("k").agg(sum("v").as("s"))
    MaterializedViews.register("mv_refresh", () => defn(), path)
    MaterializedViews.refresh("mv_refresh")
    assert(defn().orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("a", 3L), ("b", 3L)))
    // base changes; the MV contract requires an explicit refresh —
    // the thunk re-plans against the NEW file listing
    Seq(("a", 10L), ("c", 5L)).toDF("k", "v")
      .write.mode("overwrite").parquet(base)
    MaterializedViews.refresh("mv_refresh")
    assert(defn().orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("a", 10L), ("c", 5L)))
    MaterializedViews.deregister("mv_refresh")
  }
}
