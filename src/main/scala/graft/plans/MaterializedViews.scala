package graft.plans

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized views with transparent query rewrite.
  *
  * A view is registered as a DEFINITION (a thunk building the
  * DataFrame, so every refresh re-plans against current base files)
  * plus a parquet storage path; [[refresh]] recomputes it. The
  * analyzer rule [[RewriteToMaterializedView]] (injected by
  * `GraftExtensions`) then replaces any query SUBTREE whose
  * canonicalized plan equals a fresh view's definition with a scan of
  * the stored parquet — the classic MV answer path (the reference
  * gets a poor man's version from its serving tables; core Spark has
  * no equivalent).
  *
  * Matching is exact-plan (Catalyst `canonicalized` equality — exprIds
  * and alias names normalized away, so two independently-built
  * identical DataFrames match; a semantically-equal-but-differently-
  * shaped plan does not). That conservative contract is what makes the
  * rewrite safe: it can never fire on a query the view doesn't answer
  * bit-for-bit.
  *
  * Scale shape: the whole point at 100 TB — an aggregate over the
  * full fact table collapses to a scan of the (tiny) materialization,
  * and the refresh itself can be driven incrementally from a
  * MergeTable change feed (see `cdc_incremental_agg` for the
  * retraction algebra; this registry composes with it rather than
  * duplicating it).
  *
  * Freshness is tracked two ways. A completed [[refresh]] marks the
  * view fresh and records a FINGERPRINT of the base files the
  * definition read (sorted path/size/mtime — with parquet dirs as
  * bases there is no commit pointer to watch, so the file manifest IS
  * the version); at match time the fingerprint is re-derived and a
  * mismatch suppresses the rewrite and auto-stales the view — a
  * mutated base can never be answered from a stale materialization.
  * [[markStale]] stays as the explicit override (e.g. a base about to
  * be mutated mid-query). MergeTable-backed incremental MVs check the
  * table's commit log instead.
  */
object MaterializedViews {

  private final case class Mv(
      name: String,
      path: String,
      definition: () => DataFrame,
      canonical: LogicalPlan,
      fresh: Boolean,
      fingerprint: Option[Long] = None)

  private val registry = TrieMap.empty[String, Mv]

  // While register/refresh analyzes or executes a DEFINITION, the rule
  // must not rewrite it into a read of the (stale or in-flight)
  // materialization it describes. Plain volatile: registration and
  // refresh are driver-side and the harness runs queries sequentially.
  @volatile private var suspended = false

  private def withRuleSuspended[A](body: => A): A = {
    suspended = true
    try body finally suspended = false
  }

  /** Register (or re-register) a view. Not fresh until [[refresh]]. */
  def register(name: String, definition: () => DataFrame, path: String): Unit = {
    val canonical = withRuleSuspended {
      definition().queryExecution.analyzed.canonicalized
    }
    registry.put(name, Mv(name, path, definition, canonical, fresh = false))
  }

  /** Recompute the view from current base data and mark it fresh,
    * recording the base-file fingerprint BEFORE the write: a file
    * that lands during the refresh is then absent from the recorded
    * fingerprint but present in the match-time re-listing, so the
    * rewrite is SUPPRESSED (fail-stale). Listing after the write
    * would invert that — the mid-refresh file would be hashed into
    * the record while its rows are missing from the materialization,
    * and the stale view would keep serving.
    */
  def refresh(name: String): Unit = {
    val mv = registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown materialized view $name"))
    val fp = baseFingerprint(mv.definition)
    withRuleSuspended {
      mv.definition().write.mode("overwrite").parquet(mv.path)
    }
    registry.put(name, mv.copy(fresh = true, fingerprint = Some(fp)))
  }

  /** Fingerprint of the base files a definition currently reads:
    * sorted (path, size, mtime) folded into one hash. This is the
    * parquet-base counterpart of the incremental MVs' commit-log
    * check — the file manifest IS the base's version. Driver-side
    * listing, O(files), no data read.
    */
  private def baseFingerprint(definition: () => DataFrame): Long = withRuleSuspended {
    definition().inputFiles.sorted.foldLeft(7L) { (h, f) =>
      val p =
        try Paths.get(new java.net.URI(f))
        catch { case _: Exception => Paths.get(f) }
      val (sz, mt) =
        try (Files.size(p), Files.getLastModifiedTime(p).toMillis)
        catch { case _: Exception => (-1L, -1L) }
      ((h * 31 + f.hashCode) * 31 + sz) * 31 + mt
    }
  }

  /** Invalidate without dropping: queries fall back to base tables. */
  def markStale(name: String): Unit =
    registry.get(name).foreach(mv => registry.put(name, mv.copy(fresh = false)))

  def deregister(name: String): Unit = registry.remove(name)
  def clear(): Unit = { registry.clear(); incRegistry.clear() }

  // -- incremental MVs over MergeTables ------------------------------------

  private final case class IncMv(
      name: String,
      table: graft.cdc.MergeTable,
      groupCols: Seq[String],
      sumCols: Seq[String],
      path: String,
      version: Long,
      dir: Option[String],
      canonical: Option[LogicalPlan])

  private val incRegistry = TrieMap.empty[String, IncMv]

  /** The full-scan aggregate an incremental MV answers: exact count
    * plus exact decimal sums grouped by `groupCols` over the table's
    * CURRENT snapshot. Also the consumer-facing builder — a query
    * embedding this exact plan is served from the materialization.
    */
  def incrementalDefinition(name: String): DataFrame = {
    val mv = incRegistry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown incremental view $name"))
    incDefinition(mv)
  }

  private def incDefinition(mv: IncMv): DataFrame = {
    import org.apache.spark.sql.functions._
    mv.table.read()
      .groupBy(mv.groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        mv.sumCols.map(c =>
          sum(col(c).cast("decimal(18,6)")).as(s"sum_$c")): _*)
  }

  /** Register an exact count/sum aggregate over a MergeTable whose
    * refresh folds the CHANGE FEED since the last materialized
    * version — O(changes) instead of O(table) per refresh
    * (`cdc_incremental_agg`'s retraction algebra, productized).
    * Freshness is tracked against the table's commit log: the rewrite
    * only fires while the materialized version IS the table's current
    * version, so a commit auto-invalidates without any markStale call.
    */
  def registerIncremental(name: String, table: graft.cdc.MergeTable,
      groupCols: Seq[String], sumCols: Seq[String], path: String): Unit =
    incRegistry.put(name,
      IncMv(name, table, groupCols, sumCols, path, 0L, None, None))

  /** Bring the materialization to the table's current version: a full
    * aggregate on first refresh, then change-feed folds (insert/
    * U_post add, delete/U_pre retract; emptied groups drop). Each
    * refresh lands in a fresh subdir and retires the previous one, so
    * an in-flight reader of the old materialization is never
    * overwritten mid-scan.
    */
  def refreshIncremental(name: String): Unit = {
    val mv = incRegistry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown incremental view $name"))
    val current = mv.table.versions().max
    if (mv.dir.isDefined && current == mv.version) return
    val outDir = s"${mv.path}/v$current"
    withRuleSuspended {
      val result = mv.dir match {
        case None => incDefinition(mv)
        case Some(prev) =>
          val spark = mv.table.read().sparkSession
          foldDeltas(mv, spark.read.parquet(prev),
            mv.table.changesBetween(mv.version, current, updatePreImages = true))
      }
      result.write.mode("overwrite").parquet(outDir)
    }
    val canonical = withRuleSuspended {
      incDefinition(mv).queryExecution.analyzed.canonicalized
    }
    incRegistry.put(name, mv.copy(version = current,
      dir = Some(outDir), canonical = Some(canonical)))
    mv.dir.filter(_ != outDir).foreach(retire)
  }

  /** The retraction algebra shared by pull refreshes and the
    * streaming maintainer: fold a pre-image change feed (+1/+value
    * for I and U_post, −1/−value for D and U_pre) into the previous
    * materialization; groups folded to zero rows drop. Decimal
    * accumulation keeps the fold order-independent.
    */
  private def foldDeltas(mv: IncMv, old: DataFrame,
      feed: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val dec28 = "decimal(28,6)"
    val additive = col("_change").isin(graft.cdc.CdcModel.OpInsert, "U_post")
    val deltas = feed.groupBy(mv.groupCols.map(col): _*)
      .agg(sum(when(additive, lit(1L)).otherwise(lit(-1L))).as("_dn"),
        mv.sumCols.map { c =>
          val d = col(c).cast("decimal(18,6)")
          sum(when(additive, d).otherwise(-d)).as(s"_d_$c")
        }: _*)
    val zero = lit(0).cast(dec28)
    old.join(deltas, mv.groupCols, "full_outer")
      .select(mv.groupCols.map(col) ++
        Seq((coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("_dn"), lit(0L))).as("n_rows")) ++
        mv.sumCols.map { c =>
          (coalesce(col(s"sum_$c"), zero) +
            coalesce(col(s"_d_$c"), zero)).cast(dec28).as(s"sum_$c")
        }: _*)
      .filter(col("n_rows") > 0)
  }

  private def retire(prev: String): Unit = {
    def nuke(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(nuke)
      f.delete()
    }
    nuke(new java.io.File(prev))
  }

  /** Keep an incremental MV CONTINUOUSLY fresh by consuming the
    * table's pre-image change-feed stream — the composition the feed
    * and the retraction algebra exist for. Seeds the materialization
    * (full aggregate or catch-up fold), then starts a `foreachBatch`
    * consumer that folds each micro-batch's retraction deltas into
    * the store and advances the registry version, so the transparent
    * rewrite serves the view between commits with no refresh calls;
    * while a commit is in flight (committed but not yet folded) the
    * commit-log check routes queries to the base table, never to a
    * stale answer. Returns the StreamingQuery; `stop()` it to fall
    * back to pull refreshes. At-least-once `foreachBatch` replays are
    * detected by commit version and skipped, so the fold never
    * double-counts.
    */
  def maintainStreaming(name: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val mv0 = incRegistry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown incremental view $name"))
    refreshIncremental(name) // seed: the stream folds only deltas
    val seeded = incRegistry(name)
    val spark = mv0.table.read().sparkSession
    spark.readStream.format("mergetable")
      .option("path", mv0.table.root)
      .option("keys", mv0.table.keys.mkString(","))
      .option("startingVersion", seeded.version.toString)
      .option("updatePreImages", "true")
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => foldStreamBatch(name, batch) }
      .start()
  }

  private def foldStreamBatch(name: String, batch: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val mv = incRegistry.getOrElse(name, return)
    if (batch.isEmpty) return
    val upTo = batch.agg(max(col("_commit_version"))).head().getLong(0)
    if (upTo <= mv.version) return // at-least-once replay: already folded
    val prev = mv.dir.getOrElse(return) // maintainStreaming seeded it
    val outDir = s"${mv.path}/v$upTo"
    withRuleSuspended {
      val spark = batch.sparkSession
      foldDeltas(mv, spark.read.parquet(prev), batch.drop("_commit_version"))
        .write.mode("overwrite").parquet(outDir)
    }
    // recapture the canonical definition against the NEW snapshot —
    // commits change the base plan (file listings, MOR reconciliation
    // shape), and a stale canonical would silently stop the rewrite
    val canonical = withRuleSuspended {
      incDefinition(mv).queryExecution.analyzed.canonicalized
    }
    incRegistry.put(name,
      mv.copy(version = upTo, dir = Some(outDir), canonical = Some(canonical)))
    if (prev != outDir) retire(prev)
  }

  def deregisterIncremental(name: String): Unit = incRegistry.remove(name)

  /** Cheap pre-check so the analyzer rule skips canonicalization work
    * on sessions with no registered views at all. */
  private[plans] def nothingRegistered: Boolean =
    registry.isEmpty && incRegistry.isEmpty

  /** Rollup candidates: fresh, storage-backed views whose canonical
    * definition is an Aggregate over EXACTLY this canonicalized child
    * — the precondition for answering a coarser GROUP BY from the
    * view (every base row lands in exactly one view row, so
    * re-aggregating view rows over a subset of its grouping keys is
    * exact). Full MVs validate their base-file fingerprint, incrementals
    * their commit log, same as the exact-match path.
    */
  private[plans] def rollupCandidates(
      subChild: LogicalPlan): Seq[(String, org.apache.spark.sql.catalyst.plans.logical.Aggregate)] =
    if (suspended) Nil
    else {
      import org.apache.spark.sql.catalyst.plans.logical.Aggregate
      val full = registry.values.toSeq.collect {
        case mv if mv.fresh && Files.exists(Paths.get(mv.path)) => mv
      }.flatMap { mv =>
        mv.canonical match {
          case a: Aggregate if a.child == subChild &&
              mv.fingerprint.forall(_ == baseFingerprint(mv.definition)) =>
            Some((mv.path, a))
          case _ => None
        }
      }
      val inc = incRegistry.values.toSeq.flatMap { mv =>
        mv.canonical match {
          case Some(a: Aggregate) if a.child == subChild &&
              mv.dir.exists(d => Files.exists(Paths.get(d))) &&
              mv.table.versions().lastOption.contains(mv.version) =>
            Some((mv.dir.get, a))
          case _ => None
        }
      }
      full ++ inc
    }

  private[plans] def matching(sub: LogicalPlan): Option[(String, String)] =
    if (suspended || (registry.isEmpty && incRegistry.isEmpty)) None
    else {
      val c = sub.canonicalized
      registry.values.find(mv =>
        mv.fresh && mv.canonical == c && Files.exists(Paths.get(mv.path))
      ).flatMap { mv =>
        // base-file fingerprint re-derived at match time: a mutated
        // base (overwrite, append, retention delete) suppresses the
        // rewrite and auto-stales the view, so only an explicit
        // refresh can serve it again
        if (mv.fingerprint.forall(_ == baseFingerprint(mv.definition)))
          Some((mv.name, mv.path))
        else {
          registry.put(mv.name, mv.copy(fresh = false))
          None
        }
      }.orElse(incRegistry.values.collectFirst {
        // canonical equality first (cheap); then the commit-log check —
        // a table that moved past the materialized version falls
        // through to its base scan automatically
        case mv if mv.canonical.contains(c) &&
            mv.dir.exists(d => Files.exists(Paths.get(d))) &&
            mv.table.versions().lastOption.contains(mv.version) =>
          (mv.name, mv.dir.get)
      })
    }
}

/** Analyzer rule: swap fresh-MV-equal subtrees for their parquet
  * materialization, preserving the original output attributes
  * (names AND exprIds) so the surrounding plan is untouched. When no
  * exact match exists, an Aggregate whose grouping keys are a SUBSET
  * of a view's (over the identical base subtree) is answered by
  * RE-AGGREGATING the materialization — count rolls up as sum of
  * counts, sum as sum of sums, min/max as min/max — the classic
  * aggregate-rollup rewrite (`GROUP BY year` served from a
  * `GROUP BY year, month` view).
  */
class RewriteToMaterializedView(session: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, Coalesce, Divide, Expression, Literal}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
  import org.apache.spark.sql.catalyst.plans.logical.Aggregate
  import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sub if sub.resolved && sub.children.nonEmpty =>
      MaterializedViews.matching(sub) match {
        case Some((_, path)) =>
          val rel = session.read.parquet(path).queryExecution.analyzed
          // canonical equality guarantees positionally identical
          // schemas; re-alias to the matched subtree's exprIds. A
          // stored column may carry a widened type (folded decimal
          // precision) — cast back so parent operators see exactly
          // the attributes they resolved against.
          Project(sub.output.zip(rel.output).map { case (target, src) =>
            val aligned =
              if (src.dataType == target.dataType) src
              else Cast(src, target.dataType)
            Alias(aligned, target.name)(exprId = target.exprId)
          }, rel)
        case None => sub match {
          case agg: Aggregate => tryRollup(agg).getOrElse(agg)
          case _ => sub
        }
      }
  }

  private def strip(e: Expression): Expression = e match {
    case a: Alias => a.child
    case x => x
  }

  /** Answer `agg` by re-aggregating a registered view: every query
    * grouping key must be one of the view's grouping outputs, and
    * every query aggregate must be derivable from a view aggregate
    * (count→sum, sum→sum on exact numeric types, min→min, max→max;
    * distinct/filtered/float aggregates refuse — float re-addition
    * reorders, and this rewrite must never change an answer).
    */
  /** Footer-stats proof that every listed store column's total
    * absolute sum stays in double's exact-integer range: for each
    * file, rows × max(|min|, |max|) bounds the file's contribution,
    * and the per-file bounds sum (BigInt — the bound itself must not
    * overflow) under 2^53. Missing stats, a non-integral footer tag,
    * or an unbounded total all REFUSE — the avg derivation only fires
    * when exactness is provable. O(store files) driver-side footer
    * reads, the same class of work as the store schema resolution.
    */
  private def storeColumnsBounded(path: String, cols: Seq[String]): Boolean = {
    try {
      val p = Paths.get(path)
      val metas = graft.cdc.FileStats.collect(p.getParent, p.getFileName.toString)
      if (metas.isEmpty) return false
      val exact = BigInt(1) << 53
      cols.forall { c =>
        val per = metas.values.toSeq.map { m =>
          m.cols.get(c) match {
            case Some((mn, mx, "i")) =>
              Some(BigInt(m.rows) * BigInt(mn).abs.max(BigInt(mx).abs))
            case _ =>
              // no range recorded: provably all-null contributes 0
              if (m.nulls.get(c).contains(m.rows)) Some(BigInt(0)) else None
          }
        }
        per.forall(_.isDefined) && per.flatten.sum < exact
      }
    } catch { case _: Throwable => false }
  }

  private def tryRollup(agg: Aggregate): Option[LogicalPlan] = {
    if (MaterializedViews.nothingRegistered) return None
    val c = agg.canonicalized match {
      case a: Aggregate => a
      case _ => return None
    }
    MaterializedViews.rollupCandidates(c.child).view.flatMap { case (path, v) =>
      rollupAgainst(agg, c, path, v)
    }.headOption
  }

  private def rollupAgainst(agg: Aggregate, c: Aggregate, path: String,
      v: Aggregate): Option[LogicalPlan] = {
    val vOut: Seq[Expression] = v.aggregateExpressions.map(strip)
    val rel = session.read.parquet(path).queryExecution.analyzed
    if (rel.output.length != vOut.length) return None

    // a query grouping key answers from a view output that is itself
    // a grouping passthrough (never an aggregate)
    def groupPos(g: Expression): Option[Int] = {
      val i = vOut.indexWhere(ve =>
        ve == g && v.groupingExpressions.contains(g))
      if (i >= 0) Some(i) else None
    }
    val groupMap: Map[Expression, Int] =
      c.groupingExpressions.flatMap(g => groupPos(g).map(g -> _)).toMap
    if (groupMap.size != c.groupingExpressions.distinct.size) return None

    def exactNumeric(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: DecimalType => true
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType => true
      case _ => false
    }

    def aggPos(p: Expression => Boolean): Option[Int] = {
      val i = vOut.indexWhere {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          p(ae.aggregateFunction)
        case _ => false
      }
      if (i >= 0) Some(i) else None
    }

    // one view aggregate → its rollup over the store, cast back to
    // the original result type so surrounding arithmetic (decimal
    // precision, CheckOverflow shapes) sees exactly what it resolved
    // against
    def deriveAgg(ae: AggregateExpression): Option[Expression] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else ae.aggregateFunction match {
        case cnt: Count =>
          aggPos(_ == cnt).map(j =>
            Coalesce(Seq(
              Sum(rel.output(j)).toAggregateExpression(),
              Literal(0L, LongType))))
        case s: Sum if exactNumeric(s.dataType) =>
          aggPos(_ == s).map(j =>
            Cast(Sum(rel.output(j)).toAggregateExpression(), s.dataType))
        case m: Min =>
          aggPos(_ == m).map(j => Min(rel.output(j)).toAggregateExpression())
        case m: Max =>
          aggPos(_ == m).map(j => Max(rel.output(j)).toAggregateExpression())
        // avg(x) derives as sum-of-sums / sum-of-counts when the view
        // materialized BOTH sum(x) and count(x) over the same child —
        // INTEGRAL x only: the store's long sums re-aggregate exactly
        // and integer sums below 2^53 are exact in double, matching
        // Average's own double accumulation bit-for-bit. Float/double
        // x is refused (the direct plan's addition order differs from
        // sum-of-partial-sums), decimal too (Average's decimal
        // division has its own precision rules). Count(x) is the
        // NON-NULL count, so null-heavy groups derive correctly; an
        // all-null group yields null/0 → null, matching avg.
        // MAGNITUDE guard: the exactness argument needs every derived
        // long sum to stay in double's exact-integer range, so the
        // store's parquet footers must PROVE Σ|sum_g| and Σ counts
        // stay under 2^53 — beyond it the rewrite could change the
        // low-order bits of an answer, which this rule never does.
        // (Residual caveat, accepted like the float refusal's: a
        // group mixing ±2^53-scale values that cancel has lossy
        // DIRECT double accumulation the stats cannot see; such sums
        // also make the direct answer partitioning-dependent.)
        case a: Average if (a.child.dataType match {
          case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType | LongType => true
          case _ => false
        }) =>
          for {
            js <- aggPos {
              case s: Sum => s.child == a.child
              case _ => false
            }
            jc <- aggPos {
              case cnt: Count => cnt.children == Seq(a.child)
              case _ => false
            }
            if storeColumnsBounded(path, Seq(rel.output(js).name, rel.output(jc).name))
          } yield Divide(
            Cast(Sum(rel.output(js)).toAggregateExpression(), DoubleType),
            Cast(Sum(rel.output(jc)).toAggregateExpression(), DoubleType),
            // LEGACY division mirrors Average.evaluateExpression: an
            // all-null group (count sums to 0) must derive to NULL,
            // exactly what the unrewritten Average returns — under
            // the session's ANSI default a bare Divide would turn
            // that answer into a DIVIDE_BY_ZERO error.
            org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
        case _ => None
      }

    // derive each query output from the view columns (canonical-space
    // matching; rel.output positions mirror vOut by construction):
    // embedded aggregates (e.g. round(sum(x), 2)) roll up in place,
    // grouping subexpressions pass through, and any leftover base
    // attribute means the output is NOT derivable — refuse
    def derive(e: Expression): Option[Expression] = {
      var ok = true
      val replaced = strip(e).transformUp {
        case ae: AggregateExpression =>
          deriveAgg(ae).getOrElse { ok = false; ae }
        case g if groupMap.contains(g) => rel.output(groupMap(g))
      }
      if (ok && replaced.references.subsetOf(rel.outputSet)) Some(replaced)
      else None
    }

    val derived = c.aggregateExpressions.map(derive)
    if (derived.exists(_.isEmpty)) return None
    val newList = agg.output.zip(derived.map(_.get)).map { case (target, e) =>
      val aligned = if (e.dataType == target.dataType) e else Cast(e, target.dataType)
      Alias(aligned, target.name)(exprId = target.exprId)
    }
    val newGroups: Seq[Expression] =
      c.groupingExpressions.map(g => rel.output(groupMap(g)))
    Some(Aggregate(newGroups, newList, rel))
  }
}
