package graft.plans

import graft.cdc.MergeTable
import graft.sources.MergeTableV2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** Histogram-driven skew salting (r14, extended r15): AQE's skew-join
  * split only fires when a runtime shuffle partition exceeds
  * `skewedPartitionThresholdInBytes` (256 MB default) AND the factor
  * over the median — skew that ANALYZE already proved (a heavy
  * hitter spanning many equi-height bins) goes unhandled whenever the
  * absolute sizes sit under the threshold, and at the threshold the
  * damage is already one straggler task per heavy key. This rule
  * applies the knowledge at PLAN time: an equi-join whose key
  * column(s) carry histogram-pinned heavy values gets targeted
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
  * salt — replication would be pure loss), skips joins the engine
  * would plan as a ZERO-shuffle storage-partitioned join (both sides
  * co-bucketed mergetable scans on the join keys: the Generate on
  * the replicated side would drop its KeyGroupedPartitioning and the
  * salt conjunct would force BOTH sides through a full shuffle —
  * strictly worse than one straggler bucket), and never fires twice
  * on the same join (tree tag).
  *
  * Composite keys (r15): when a multi-column equi-join has heavy
  * values on SEVERAL key columns of the same side, the heavy tag is
  * the CONJUNCTION of the per-column IN-lists — only rows whose full
  * key tuple is jointly pinned scatter, and the other side replicates
  * only rows matching every list. A single-column heavy value whose
  * tuples spread over the other key columns hashes fine already; the
  * conjunction keeps it out of the tag and the replication.
  *
  * Outer joins (r15): CDC enrichment is `fact LEFT JOIN dim ON
  * skewed_fk` — salting is sound for LeftOuter/LeftSemi/LeftAnti
  * when the SKEWED side is the left (preserved/streamed) one: each
  * preserved row appears exactly once at its salt, heavy inner rows
  * exist at every salt, so matches and null-extensions are identical.
  * Symmetrically RightOuter salts only a right-side skew. Replicating
  * the PRESERVED side would duplicate output rows, so that
  * orientation declines.
  *
  * Scope: equi keys resolved directly to mergetable relation columns
  * with persisted ANALYZE histograms. Both-sides-heavy pairs decline
  * (replicating a skewed side multiplies its hot rows).
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
      case j: Join if saltableType(j.joinType) && j.condition.isDefined &&
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
    relOf(side, attr).toSeq.flatMap { rel =>
      statsCached(rel.tablePath).toSeq.flatMap { st =>
        st.cols.collectFirst { case (c, cs) if c.equalsIgnoreCase(attr.name) => cs }
          .flatMap(_.hist).toSeq.flatMap(h => heavyValues(h, st.rows, minShare))
      }
    }

  /** The mergetable relation `attr` resolves to on `side`, if any. */
  private def relOf(side: LogicalPlan,
      attr: AttributeReference): Option[MergeTableV2] =
    side.collectFirst {
      case rel: DataSourceV2Relation
          if rel.table.isInstanceOf[MergeTableV2] &&
            rel.output.exists(_.exprId == attr.exprId) =>
        rel.table.asInstanceOf[MergeTableV2]
    }

  /** True when both sides are mergetable scans hash-bucketed with the
    * same bucket count whose bucket keys are all covered,
    * position-aligned, by the join's equi pairs — the shape the
    * engine plans as a ZERO-shuffle storage-partitioned join (§2
    * 11v/11al). Salting would put a Generate on the replicated side
    * (dropping its reported KeyGroupedPartitioning) and a salt
    * conjunct into the condition: a join that moved zero bytes
    * becomes two full shuffles. At 100 TB, SPJ with one straggler
    * bucket beats that every time, so the rule declines here and
    * leaves residual in-bucket skew to AQE.
    */
  private def coBucketedSpj(j: Join,
      oriented: Seq[(AttributeReference, AttributeReference)]): Boolean = {
    val rels = for {
      (lk, rk) <- oriented.headOption
      l <- relOf(j.left, lk)
      r <- relOf(j.right, rk)
    } yield (l.tableMeta, r.tableMeta)
    rels.exists { case (lm, rm) =>
      (lm.numBuckets, rm.numBuckets) match {
        case (Some(ln), Some(rn)) if ln == rn && lm.keys.size == rm.keys.size =>
          val names = oriented.map { case (a, b) =>
            (a.name.toLowerCase, b.name.toLowerCase)
          }
          lm.keys.map(_.toLowerCase).zip(rm.keys.map(_.toLowerCase))
            .forall(names.contains)
        case _ => false
      }
    }
  }

  private def trySalt(j: Join, minShare: Double, saltN: Int,
      bcast: Long): Option[LogicalPlan] = {
    // a side a broadcast will serve leaves no shuffle to salt
    if (j.left.stats.sizeInBytes <= bcast || j.right.stats.sizeInBytes <= bcast)
      return None
    val oriented = splitConj(j.condition.get).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
    }.flatMap { case (a, b) =>
      if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
        Some((a, b))
      else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
        Some((b, a))
      else None
    }
    if (oriented.isEmpty) return None
    if (coBucketedSpj(j, oriented)) return None
    val heavies = oriented.map { case (lk, rk) =>
      val lh = if (integralOrFloat(lk.dataType)) heavyOf(j.left, lk, minShare)
               else Nil
      val rh = if (integralOrFloat(rk.dataType)) heavyOf(j.right, rk, minShare)
               else Nil
      (lk, rk, lh, rh)
    }
    // pairs heavy on exactly ONE side nominate that side as skewed
    // (a both-sides-heavy pair never does: replicating a skewed side
    // multiplies hot rows); the first nomination SOUND for this join
    // type wins, and every pair heavy on that side joins the
    // conjunction
    val leftSkewed = heavies.collect {
      case (_, _, lh, rh) if lh.nonEmpty != rh.nonEmpty => lh.nonEmpty
    }.find(orientationSound(j.joinType, _))
    leftSkewed.flatMap { ls =>
      val keys = heavies.flatMap { case (lk, rk, lh, rh) =>
        val (sk, ok, h) = if (ls) (lk, rk, lh) else (rk, lk, rh)
        val lits = h.flatMap(v => literalOf(v, sk.dataType))
        if (lits.isEmpty) None else Some((sk, ok, lits))
      }
      if (keys.isEmpty) None else build(j, keys, saltN, leftSkewed = ls)
    }
  }

  /** The salted join: skewed side scatters jointly-heavy keys across
    * S salts, the other side replicates them S times, condition gains
    * `salt = salt`, and a Project restores the original output.
    */
  private def build(j: Join,
      keys: Seq[(AttributeReference, AttributeReference, Seq[Literal])],
      saltN: Int, leftSkewed: Boolean): Option[LogicalPlan] = {
    val heavySkew = keys.map { case (sk, _, lits) => In(sk, lits): Expression }
      .reduce(And)
    val heavyOther = keys.map { case (_, ok, lits) => In(ok, lits): Expression }
      .reduce(And)
    val (skewSide, otherSide) =
      if (leftSkewed) (j.left, j.right) else (j.right, j.left)
    // skewed side: jointly-heavy tuples get rand-scattered salt, others 0
    val saltExpr = CaseWhen(
      Seq((heavySkew,
        Cast(Multiply(new Rand(Literal(42L), hideSeed = true),
          Literal(saltN.toDouble)), IntegerType))),
      Some(Literal(0)))
    val saltAlias = Alias(saltExpr, SaltCol)()
    val saltedSkew = Project(skewSide.output :+ saltAlias, skewSide)
    // other side: jointly-heavy tuples replicate once per salt, others once
    val arr = CaseWhen(
      Seq((heavyOther, CreateArray((0 until saltN).map(Literal(_))))),
      Some(CreateArray(Seq(Literal(0)))))
    val genOut = AttributeReference(SaltCol, IntegerType, nullable = false)()
    val replicated = Generate(Explode(arr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genOut), otherSide)
    val cond = And(j.condition.get, EqualTo(saltAlias.toAttribute, genOut))
    val salted =
      if (leftSkewed) Join(saltedSkew, replicated, j.joinType, Some(cond), j.hint)
      else Join(replicated, saltedSkew, j.joinType, Some(cond), j.hint)
    salted.setTagValue(SaltedTag, true)
    Some(Project(j.output, salted))
  }
}

private[graft] object SaltSkewedJoin {
  private[plans] val SaltCol = "_graft_skew_salt"
  private[plans] val SaltedTag = TreeNodeTag[Boolean]("graft.salted")

  /** Join types salting can serve at all (orientation checked per
    * candidate by [[orientationSound]]).
    */
  private[plans] def saltableType(t: JoinType): Boolean = t match {
    case Inner | LeftOuter | LeftSemi | LeftAnti | RightOuter => true
    case _ => false
  }

  /** Salting replicates the NON-skewed side; replicating a PRESERVED
    * side would duplicate its output rows, so non-inner joins only
    * salt when the skewed side is the preserved/streamed one: each
    * preserved row still appears exactly once (at its salt), heavy
    * inner rows exist at every salt, and an unmatched preserved row
    * finds no match at its salt either — null extension and
    * semi/anti membership are untouched.
    */
  private[plans] def orientationSound(t: JoinType, leftSkewed: Boolean): Boolean =
    t match {
      case Inner => true
      case LeftOuter | LeftSemi | LeftAnti => leftSkewed
      case RightOuter => !leftSkewed
      case _ => false
    }

  // the optimizer's fixed-point batch re-runs this rule several times
  // per query, and the stats JSON carries fat sketch registers —
  // memoize per path, validated by (mtime, size) so a re-ANALYZE
  // REPLACES the entry (no growth per generation) and a same-mtime
  // rewrite on coarse-granularity filesystems still misses via size
  private val statsMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (Long, Long, Option[MergeTable.TableStats])]()

  private[plans] def statsCached(path: String): Option[MergeTable.TableStats] = {
    val f = java.nio.file.Paths.get(path).resolve("stats")
      .resolve("_TABLE_STATS.json")
    val (mtime, size) =
      try (java.nio.file.Files.getLastModifiedTime(f).toMillis,
        java.nio.file.Files.size(f))
      catch { case _: java.io.IOException => return None }
    val cur = statsMemo.get(path)
    if (cur != null && cur._1 == mtime && cur._2 == size) cur._3
    else {
      // distinct-table backstop only — per-path replacement above
      // keeps the steady state bounded by live tables
      if (statsMemo.size > 1024) statsMemo.clear()
      val st = MergeTable.statsAt(path)
      statsMemo.put(path, (mtime, size, st))
      st
    }
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
