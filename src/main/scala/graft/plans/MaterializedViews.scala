package graft.plans

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
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
  * Freshness is an explicit contract: only views marked fresh by a
  * completed [[refresh]] (and not invalidated by [[markStale]])
  * rewrite. Nothing here tracks base-table versions — with parquet
  * dirs as bases there is no commit pointer to watch; callers that
  * mutate a base must re-[[refresh]] (or [[markStale]]) first, as on
  * any warehouse with manual MV maintenance.
  */
object MaterializedViews {

  private final case class Mv(
      name: String,
      path: String,
      definition: () => DataFrame,
      canonical: LogicalPlan,
      fresh: Boolean)

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

  /** Recompute the view from current base data and mark it fresh. */
  def refresh(name: String): Unit = {
    val mv = registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown materialized view $name"))
    withRuleSuspended {
      mv.definition().write.mode("overwrite").parquet(mv.path)
    }
    registry.put(name, mv.copy(fresh = true))
  }

  /** Invalidate without dropping: queries fall back to base tables. */
  def markStale(name: String): Unit =
    registry.get(name).foreach(mv => registry.put(name, mv.copy(fresh = false)))

  def deregister(name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()

  private[plans] def matching(sub: LogicalPlan): Option[(String, String)] =
    if (suspended || registry.isEmpty) None
    else {
      val c = sub.canonicalized
      registry.values.collectFirst {
        case mv if mv.fresh && mv.canonical == c && Files.exists(Paths.get(mv.path)) =>
          (mv.name, mv.path)
      }
    }
}

/** Analyzer rule: swap fresh-MV-equal subtrees for their parquet
  * materialization, preserving the original output attributes
  * (names AND exprIds) so the surrounding plan is untouched.
  */
class RewriteToMaterializedView(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sub if sub.resolved && sub.children.nonEmpty =>
      MaterializedViews.matching(sub) match {
        case Some((_, path)) =>
          val rel = session.read.parquet(path).queryExecution.analyzed
          // canonical equality guarantees positionally identical
          // schemas; re-alias to the matched subtree's exprIds
          Project(sub.output.zip(rel.output).map { case (target, src) =>
            Alias(src, target.name)(exprId = target.exprId)
          }, rel)
        case None => sub
      }
  }
}
