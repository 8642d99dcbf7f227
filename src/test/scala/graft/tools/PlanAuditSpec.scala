package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, IsNotNull}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** The "would this plan survive 100×?" audit as a regression gate
  * (the manual version lives in [[PlanAudit]]):
  *
  *  (a) no broadcast whose build side is an unfiltered fact-table
  *      scan — broadcasting an SF-scaled table OOMs the driver at
  *      production scale even when it fits at test SF;
  *  (b) headline-query scans reach parquet with pushed filters — a
  *      selective query that scans every row pays the full 100 TB;
  *  (c) no window partitioned ONLY by bounded-cardinality keys — such
  *      a window serializes each group onto one reducer at any scale
  *      (the defect PrefixSum exists to avoid).
  */
class PlanAuditSpec extends SparkSpec {

  // tables whose row counts scale with SF — never broadcast raw
  // (every generated table except the fixed-cardinality nation/region)
  private val factTables = Seq("lineitem", "orders", "customer", "part",
    "supplier", "events", "documents", "embeddings")
  // Columns with a handful of distinct values at EVERY SF, DERIVED
  // from the testdata rather than hand-listed (the r3 gate hard-coded
  // {source, lang, split} and missed c_mktsegment). "Bounded" means
  // the distinct count does NOT grow with the scale factor — so it is
  // measured at two SFs: a dimension (mktsegment 5→5, returnflag 3→3)
  // stays flat while a scaling key (user_id ~20→~200 at these SFs)
  // grows ~10×. Flat-and-small columns are dimensions a window must
  // not partition by alone.
  private lazy val boundedCols: Set[String] = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col}
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    val biggerSf = "/root/testdata/sf0.01"
    def distincts(dir: String, t: String): Map[String, Long] = {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val cols = df.schema.fields.filterNot(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => true
        case _ => false
      }).map(_.name).toSeq
      if (cols.isEmpty) Map.empty
      else {
        val row = df.select(cols.map(c => approx_count_distinct(col(c)).as(c)): _*).head()
        cols.zipWithIndex.map { case (c, i) => c.toLowerCase -> row.getLong(i) }.toMap
      }
    }
    (factTables ++ Seq("nation", "region")).flatMap { t =>
      val small = distincts(sfDir, t)
      val big = distincts(biggerSf, t)
      small.keys.filter { c =>
        // flat across a 10x SF step AND small in absolute terms. The
        // growth test has no absolute floor (a floor of 30 would make
        // it vacuous under the <=30 cap): 1.5x multiplicative plus a
        // +2 additive slack absorbs approx_count_distinct noise on
        // tiny counts, while a column growing 3 -> 30 across the SF
        // step is correctly rejected as scale-dependent
        big.getOrElse(c, Long.MaxValue) <= 30 &&
          big.getOrElse(c, Long.MaxValue) <= (small(c) * 3) / 2 + 2
      }
    }.toSet
  }

  /** Physical plans of every gate query that builds one without table
    * side effects (cdc/mergetable queries create and mutate tables at
    * construction). AQE is disabled during planning so exchanges are
    * visible as plain nodes.
    */
  private lazy val audited: Seq[(String, SparkPlan)] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // disable SIZE-based broadcasts: testdata tables are tiny, so
    // stats would legitimately broadcast them here but not at scale.
    // What remains after this is explicit broadcast() hints — exactly
    // the decisions that must be right independent of SF.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.SparkEntry.queries.toSeq
        .filterNot { case (n, _) =>
          n.startsWith("cdc_") || n.startsWith("mergetable") || n == "schema_evolution" }
        .sortBy(_._1)
        .map { case (n, fn) =>
          val p = fn(spark, sfDir).queryExecution.executedPlan
          graft.Caches.clear()
          n -> p
        }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  /** Name of a fact table this subtree scans with no real pushed
    * predicate (IsNotNull from join keys doesn't count), crossing
    * caches but stopping at cardinality-reducing nodes (aggregates,
    * limits, top-k): a broadcast above those is bounded regardless of
    * the scan below.
    */
  private def rawFactScan(p: SparkPlan): Option[String] = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => None
    case l if l.nodeName.contains("Limit") || l.nodeName.contains("TopK") ||
      l.nodeName.contains("TakeOrdered") => None
    case s: FileSourceScanExec =>
      val path = s.relation.location.rootPaths.mkString(",")
      factTables.find(t => path.contains(s"$t.parquet"))
        .filterNot(_ => s.dataFilters.exists(f => !f.isInstanceOf[IsNotNull]))
    case im: InMemoryTableScanExec => rawFactScan(im.relation.cachedPlan)
    case other => other.children.view.flatMap(rawFactScan).headOption
  }

  test("no broadcast builds from an unfiltered fact-table scan") {
    audited.foreach { case (n, plan) =>
      plan.foreach {
        case b: BroadcastExchangeExec =>
          rawFactScan(b.child).foreach { t =>
            fail(s"$n broadcasts fact table $t with no pushed predicate:\n$plan")
          }
        case _ => ()
      }
    }
  }

  test("headline selective queries push filters down to the parquet scan") {
    val expected = Seq(
      "q6_revenue_change" -> "lineitem",
      "q14_promo_revenue" -> "lineitem",
      "q12_priority_shipping" -> "lineitem",
      "q3_shipping_priority" -> "orders")
    val byName = audited.toMap
    expected.foreach { case (q, table) =>
      val plan = byName(q)
      val pushed = plan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.mkString(",").contains(s"$table.parquet") =>
          s.metadata.getOrElse("PushedFilters", "[]")
      }
      assert(pushed.nonEmpty, s"$q has no $table scan:\n$plan")
      assert(pushed.exists(_ != "[]"),
        s"$q scans $table without pushed filters:\n$plan")
    }
  }

  test("no all-pairs join between two unfiltered fact-table scans") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // cartesian/nested-loop joins are legitimate when one side is
    // bounded (a limited query set, a 10-row medoid table, a 1-row
    // aggregate); they are catastrophic when BOTH sides scale with
    // the corpus — that's n² of a 100 TB table
    audited.foreach { case (n, plan) =>
      plan.foreach {
        case j: CartesianProductExec =>
          (rawFactScan(j.left), rawFactScan(j.right)) match {
            case (Some(l), Some(r)) =>
              fail(s"$n cartesian-joins unfiltered fact tables $l × $r:\n$plan")
            case _ => ()
          }
        case j: BroadcastNestedLoopJoinExec =>
          (rawFactScan(j.left), rawFactScan(j.right)) match {
            case (Some(l), Some(r)) =>
              fail(s"$n nested-loop-joins unfiltered fact tables $l × $r:\n$plan")
            case _ => ()
          }
        case _ => ()
      }
    }
  }

  test("no window partitioned only by bounded-cardinality keys") {
    audited.foreach { case (n, plan) =>
      plan.foreach {
        case w: WindowExec =>
          val allBounded = w.partitionSpec.nonEmpty && w.partitionSpec.forall {
            case a: AttributeReference => boundedCols.contains(a.name.toLowerCase)
            case _ => false
          }
          assert(!allBounded,
            s"$n windows over bounded partition key(s) ${w.partitionSpec.mkString(", ")} " +
              s"— one reducer per group at any scale:\n$plan")
        case _ => ()
      }
    }
  }

  // ---- global (partition-less) windows --------------------------------------
  // The r13 blind spot: the bounded-key check above requires a NONEMPTY
  // partitionSpec, so a GLOBAL window — strictly worse, Spark itself warns
  // "Moving all data to a single partition" — was never audited. The rule,
  // measured the same way boundedCols is: a global window is tolerable only
  // when its INPUT row count stays flat across a 10× SF step (a calendar- or
  // band-bounded aggregate); over an SF-scaling input it is a single-reducer
  // sort at any scale and fails.

  private val biggerSfDir = "/root/testdata/sf0.01"

  /** Row counts of every global-window input in the query, measured by
    * wrapping each logical Window child as its own frame. Foldable-only
    * partition keys (e.g. partitionBy(lit(0))) count as global — they are
    * the same single reducer without the warning.
    */
  private def globalWindowInputCounts(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                                      dir: String): Seq[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = fn(spark, dir)
    val counts = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.forall(_.foldable) =>
        org.apache.spark.sql.GraftSqlBridge.ofRows(spark, w.child).count()
    }
    graft.Caches.clear()
    counts
  }

  private def assertGlobalWindowsFlat(n: String,
                                      fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    val small = globalWindowInputCounts(fn, sfDir)
    val big = globalWindowInputCounts(fn, biggerSfDir)
    assert(small.size == big.size, s"$n: global-window count differs across SFs")
    small.zip(big).foreach { case (lo, hi) =>
      assert(hi <= (lo * 3) / 2 + 2,
        s"$n has a GLOBAL window whose input grows with SF ($lo -> $hi rows " +
          s"across a 10x step) — a single-reducer sort at scale; use " +
          s"PrefixSum.runningTotalGlobal or a distributed rank instead")
    }
  }

  test("no global window over an SF-scaling input") {
    val withGlobal = audited.collect {
      case (n, p) if p.exists {
        case w: WindowExec => w.partitionSpec.forall(_.foldable)
        case _ => false
      } => n
    }
    // after the r14 PrefixSum rewrites no registry query should carry a
    // global window at all; any future one must at least be SF-flat
    withGlobal.foreach(n => assertGlobalWindowsFlat(n, graft.SparkEntry.queries(n)))
  }

  test("audit rejects a planted global-window query over a fact table") {
    import org.apache.spark.sql.expressions.{Window => WSpec}
    import org.apache.spark.sql.functions.row_number
    val planted = (s: org.apache.spark.sql.SparkSession, dir: String) =>
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("i", row_number().over(WSpec.orderBy("o_orderkey")))
    val small = globalWindowInputCounts(planted, sfDir)
    val big = globalWindowInputCounts(planted, biggerSfDir)
    assert(small.nonEmpty, "planted global window not detected in the logical plan")
    assert(small.zip(big).exists { case (lo, hi) => hi > (lo * 3) / 2 + 2 },
      "planted global window over a fact table was not flagged as SF-scaling")
  }
}
