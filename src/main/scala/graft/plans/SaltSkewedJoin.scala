package graft.plans

import graft.cdc.MergeTable
import graft.sources.MergeTableV2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** Histogram-driven skew salting (r14): AQE's skew-join split only
  * fires when a runtime shuffle partition exceeds
  * `skewedPartitionThresholdInBytes` (256 MB default) AND the factor
  * over the median — skew that ANALYZE already proved (a heavy
  * hitter spanning many equi-height bins) goes unhandled whenever the
  * absolute sizes sit under the threshold, and at the threshold the
  * damage is already one straggler task per heavy key. This rule
  * applies the knowledge at PLAN time: an inner equi-join whose key
  * column carries histogram-pinned heavy values gets targeted
  * salting —
  *
  *   - the skewed side tags heavy-key rows with a random salt in
  *     [0, S) (everything else salt 0),
  *   - the other side replicates ONLY its heavy-key rows S times
  *     (explode over a literal array; non-heavy rows once, salt 0),
  *   - the join adds `salt = salt` to its condition, so each heavy
  *     key spreads across S reducers instead of one.
  *
  * Correctness never depends on the histogram being right: salting
  * any value is result-identical (the same pairs meet, on a finer
  * key), so a stale heavy list costs only replication, never rows.
  * The rewrite skips joins a broadcast would serve (no shuffle to
  * salt — replication would be pure loss) and never fires twice on
  * the same join (tree tag).
  *
  * Scope: INNER joins, single-column equi keys, heavy side resolved
  * directly to a mergetable relation column with persisted ANALYZE
  * histograms. Both-sides-heavy declines (replicating a skewed side
  * multiplies its hot rows).
  */
case class SaltSkewedJoin(session: SparkSession) extends Rule[LogicalPlan] {

  import SaltSkewedJoin._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = session.conf
    if (!conf.get("graft.skew.salting.enabled", "true").toBoolean) return plan
    val minShare = conf.get("graft.skew.heavyBinShare", "0.05").toDouble
    val saltN = conf.get("graft.skew.saltFactor", "16").toInt
    if (saltN < 2) return plan
    val bcast = session.sessionState.conf.autoBroadcastJoinThreshold
    plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined &&
          j.getTagValue(SaltedTag).isEmpty &&
          // structural reentry guard (tags don't survive node copies):
          // a side already carrying the salt column IS the salted join
          !j.left.output.exists(_.name == SaltCol) &&
          !j.right.output.exists(_.name == SaltCol) =>
        trySalt(j, minShare, saltN, bcast).getOrElse(j)
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Heavy values of `attr`'s histogram when it resolves DIRECTLY to a
    * mergetable relation column (no alias in between — conservative).
    */
  private def heavyOf(side: LogicalPlan, attr: AttributeReference,
      minShare: Double): Seq[Double] =
    side.collectFirst {
      case rel: DataSourceV2Relation
          if rel.table.isInstanceOf[MergeTableV2] &&
            rel.output.exists(_.exprId == attr.exprId) =>
        rel.table.asInstanceOf[MergeTableV2].tablePath
    }.toSeq.flatMap { path =>
      statsCached(path).toSeq.flatMap { st =>
        st.cols.collectFirst { case (c, cs) if c.equalsIgnoreCase(attr.name) => cs }
          .flatMap(_.hist).toSeq.flatMap(h => heavyValues(h, st.rows, minShare))
      }
    }

  private def trySalt(j: Join, minShare: Double, saltN: Int,
      bcast: Long): Option[LogicalPlan] = {
    // a side a broadcast will serve leaves no shuffle to salt
    if (j.left.stats.sizeInBytes <= bcast || j.right.stats.sizeInBytes <= bcast)
      return None
    val pairs = splitConj(j.condition.get).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
    }
    pairs.iterator.flatMap { case (a, b) =>
      val oriented =
        if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) Some((a, b))
        else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a)) Some((b, a))
        else None
      oriented.flatMap { case (lk, rk) =>
        if (!integralOrFloat(lk.dataType)) None
        else {
          val lh = heavyOf(j.left, lk, minShare)
          val rh = heavyOf(j.right, rk, minShare)
          (lh.nonEmpty, rh.nonEmpty) match {
            case (true, false) => build(j, lk, rk, lh, saltN, leftSkewed = true)
            case (false, true) => build(j, rk, lk, rh, saltN, leftSkewed = false)
            case _ => None
          }
        }
      }
    }.take(1).toSeq.headOption
  }

  /** The salted join: skewed side scatters heavy keys across S salts,
    * the other side replicates heavy keys S times, condition gains
    * `salt = salt`, and a Project restores the original output.
    */
  private def build(j: Join, skewKey: AttributeReference,
      otherKey: AttributeReference, heavy: Seq[Double], saltN: Int,
      leftSkewed: Boolean): Option[LogicalPlan] = {
    val lits = heavy.flatMap(v => literalOf(v, skewKey.dataType))
    if (lits.isEmpty) return None
    val (skewSide, otherSide) = if (leftSkewed) (j.left, j.right) else (j.right, j.left)
    // skewed side: heavy keys get rand-scattered salt, others salt 0
    val saltExpr = CaseWhen(
      Seq((In(skewKey, lits),
        Cast(Multiply(new Rand(Literal(42L), hideSeed = true),
          Literal(saltN.toDouble)), IntegerType))),
      Some(Literal(0)))
    val saltAlias = Alias(saltExpr, SaltCol)()
    val saltedSkew = Project(skewSide.output :+ saltAlias, skewSide)
    // other side: heavy keys replicate once per salt, others once
    val arr = CaseWhen(
      Seq((In(otherKey, lits), CreateArray((0 until saltN).map(Literal(_))))),
      Some(CreateArray(Seq(Literal(0)))))
    val genOut = AttributeReference(SaltCol, IntegerType, nullable = false)()
    val replicated = Generate(Explode(arr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genOut), otherSide)
    val cond = And(j.condition.get, EqualTo(saltAlias.toAttribute, genOut))
    val salted =
      if (leftSkewed) Join(saltedSkew, replicated, Inner, Some(cond), j.hint)
      else Join(replicated, saltedSkew, Inner, Some(cond), j.hint)
    salted.setTagValue(SaltedTag, true)
    Some(Project(j.output, salted))
  }
}

private[graft] object SaltSkewedJoin {
  private[plans] val SaltCol = "_graft_skew_salt"
  private[plans] val SaltedTag = TreeNodeTag[Boolean]("graft.salted")

  // the optimizer's fixed-point batch re-runs this rule several times
  // per query, and the stats JSON now carries fat sketch registers —
  // memoize per (path, file mtime) so each stats file parses once per
  // ANALYZE generation, not once per optimization pass
  private val statsMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Long), Option[MergeTable.TableStats]]()

  private[plans] def statsCached(path: String): Option[MergeTable.TableStats] = {
    val f = java.nio.file.Paths.get(path).resolve("stats")
      .resolve("_TABLE_STATS.json")
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(f).toMillis
      catch { case _: java.io.IOException => return None }
    if (statsMemo.size > 1024) statsMemo.clear() // unbounded-growth guard
    statsMemo.computeIfAbsent((path, mtime), _ => MergeTable.statsAt(path))
  }

  private[plans] def integralOrFloat(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => true
    case _ => false
  }

  /** Values whose [v,v] equi-height bins sum to ≥ `minShare` of the
    * rows — ANALYZE's skew signal: an equi-height histogram gives a
    * heavy hitter one single-value bin per ~rows/numBins occurrences.
    */
  private[graft] def heavyValues(h: MergeTable.Hist, rows: Long,
      minShare: Double): Seq[Double] =
    if (rows <= 0) Nil
    else h.bins.filter(b => b.lo == b.hi).groupBy(_.lo).collect {
      case (v, bs) if bs.size * h.height >= minShare * rows => v
    }.toSeq.sorted

  private[plans] def literalOf(v: Double, dt: DataType): Option[Literal] = dt match {
    // exactness is a PERF concern only (salting a near-miss value is
    // result-identical), but skip values an integral can't round-trip
    case ByteType if v.isWhole && v >= Byte.MinValue && v <= Byte.MaxValue =>
      Some(Literal(v.toByte))
    case ShortType if v.isWhole && v >= Short.MinValue && v <= Short.MaxValue =>
      Some(Literal(v.toShort))
    case IntegerType if v.isWhole && v >= Int.MinValue && v <= Int.MaxValue =>
      Some(Literal(v.toInt))
    case LongType if v.isWhole && math.abs(v) < (1L << 53).toDouble =>
      Some(Literal(v.toLong))
    case FloatType => Some(Literal(v.toFloat))
    case DoubleType => Some(Literal(v))
    case _ => None
  }
}
