package graft.sources

import graft.cdc.MergeTable
import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col

/** SQL DML surface for MergeTable — the reference applies CDC through
  * `spark.sql("MERGE INTO … WHEN MATCHED UPDATE SET * WHEN NOT
  * MATCHED INSERT *")` (transaction_log_util.py:279-301) and
  * `DELETE FROM …` (transaction_log_util.py:304-334); this analyzer
  * rule gives mergetable targets the same surface.
  *
  * Injected via [[graft.GraftExtensions]] (the pre-row-level-ops
  * extension pattern Iceberg's Spark extensions used for MERGE): a
  * resolution rule rewrites `MergeIntoTable` / `DeleteFromTable`
  * whose target is a mergetable relation into a runnable command
  * backed by the table's transactional upsert/delete, which handle
  * COW, MOR, and bucketed layouts uniformly.
  *
  * Supported forms (the reference's surface):
  *  - MERGE … ON <all PK equalities> WHEN MATCHED THEN UPDATE SET *
  *    WHEN NOT MATCHED THEN INSERT *          → upsert
  *  - MERGE … WHEN MATCHED THEN DELETE         → key delete
  *  - MERGE … WHEN NOT MATCHED THEN INSERT *   → insert-only
  *  - DELETE FROM t WHERE <predicate>          → predicate delete
  * Anything else (conditional actions, partial SET lists, non-PK
  * merge conditions) throws with a clear message rather than running
  * with silently different semantics.
  */
class ResolveMergeTableDml(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case m: MergeIntoTable if m.targetTable.resolved && m.sourceTable.resolved =>
      mergeTarget(m.targetTable) match {
        case Some(rel) => rewriteMerge(m, rel)
        case None => m
      }
    case d @ DeleteFromTable(t, cond) if t.resolved =>
      mergeTarget(t) match {
        case Some(rel) =>
          MergeTableDmlCommand(rel.path, rel.keys, rel.mode, rel.numBuckets,
            Filter(cond, t), MergeTableDmlCommand.Delete)
        case None => d
      }
  }

  private def mergeTarget(plan: LogicalPlan): Option[DmlTarget] = plan match {
    case SubqueryAlias(_, child) => mergeTarget(child)
    case v: View => mergeTarget(v.child)
    case lr: LogicalRelation => lr.relation match {
      case r: MergeTableRelation =>
        Some(DmlTarget(r.path, r.keys, r.mode, r.numBuckets))
      case _ => None
    }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: MergeTableV2 => Some(t.dmlTarget)
        case _ => None
      }
    case _ => None
  }

  private def rewriteMerge(m: MergeIntoTable, rel: DmlTarget): LogicalPlan = {
    def fail(msg: String): Nothing =
      throw new UnsupportedOperationException(s"MERGE INTO mergetable: $msg")
    // identity assignments must take the value from the SOURCE side:
    // `SET v = t.v` (keep target's value) shares the name `v` but is
    // NOT star-form, and running it as an upsert would silently
    // overwrite with the source's value
    def valueFromSource(e: Expression): Boolean = e match {
      case a: Attribute => m.sourceTable.outputSet.contains(a)
      case u: UnresolvedAttribute => u.nameParts.length == 1 // unqualified only
      case _ => false
    }
    // identity assignments are only equivalent to SET * when they
    // cover EVERY target column: `SET v = s.v` on a wider table is a
    // partial update (other columns keep the target's values), and
    // running it as a whole-row upsert would silently replace them
    def assignmentsAreStar(assignments: Seq[Assignment]): Boolean = {
      val assigned = assignments.flatMap(a => attrName(a.key)).map(_.toLowerCase).toSet
      m.targetTable.output.forall(a => assigned.contains(a.name.toLowerCase)) &&
      assignments.forall { as =>
        (attrName(as.key), attrName(as.value)) match {
          case (Some(k), Some(v)) => k.equalsIgnoreCase(v) && valueFromSource(as.value)
          case _ => false
        }
      }
    }
    def isUpdateAll(a: MergeAction): Boolean = a match {
      case UpdateStarAction(None) => true
      case UpdateAction(None, assignments, _) => assignmentsAreStar(assignments)
      case _ => false
    }
    def isInsertAll(a: MergeAction): Boolean = a match {
      case InsertStarAction(None) => true
      case InsertAction(None, assignments) => assignmentsAreStar(assignments)
      case _ => false
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val condCols = keyEqualities(m.mergeCondition)
      .getOrElse(fail(s"merge condition must be a conjunction of primary-key " +
        s"equalities on (${rel.keys.mkString(", ")}), got: ${m.mergeCondition.sql}"))
    if (condCols.map(_.toLowerCase).toSet != rel.keys.map(_.toLowerCase).toSet)
      fail(s"merge condition covers (${condCols.mkString(", ")}) but the table's " +
        s"primary key is (${rel.keys.mkString(", ")})")
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(u), Seq(i)) if isUpdateAll(u) && isInsertAll(i) =>
        MergeTableDmlCommand(rel.path, rel.keys, rel.mode, rel.numBuckets,
          m.sourceTable, MergeTableDmlCommand.Upsert)
      case (Seq(DeleteAction(None)), Seq()) =>
        MergeTableDmlCommand(rel.path, rel.keys, rel.mode, rel.numBuckets,
          m.sourceTable, MergeTableDmlCommand.Delete)
      case (Seq(), Seq(i)) if isInsertAll(i) =>
        MergeTableDmlCommand(rel.path, rel.keys, rel.mode, rel.numBuckets,
          m.sourceTable, MergeTableDmlCommand.InsertOnly)
      case (Seq(UpdateAction(None, assignments, _)), nm)
          if assignments.nonEmpty &&
            (nm.isEmpty || (nm.length == 1 && isInsertAll(nm.head))) =>
        // partial SET (Iceberg's most-used non-star MERGE form):
        // compiled to a read-modify-upsert — target snapshot joined to
        // the source on the PK, assigned columns replaced, untouched
        // columns projected through; unmatched source rows (INSERT *)
        // union in via an anti-join
        val src = partialUpdateSource(m, rel, assignments, fail, insertNew = nm.nonEmpty)
        MergeTableDmlCommand(rel.path, rel.keys, rel.mode, rel.numBuckets,
          src, MergeTableDmlCommand.Upsert)
      case _ =>
        fail("supported forms: WHEN MATCHED THEN UPDATE SET * | SET col = expr " +
          "[WHEN NOT MATCHED THEN INSERT *]; WHEN MATCHED THEN DELETE; " +
          "WHEN NOT MATCHED THEN INSERT *")
    }
  }

  /** The upsert source for a partial-SET MERGE: matched target rows
    * with assigned columns replaced by source-side expressions (all
    * other columns keep the target's values), plus — when INSERT * is
    * present — source rows for unmatched keys. SET values may be any
    * expression over SOURCE columns; references to target columns are
    * rejected rather than silently mis-bound.
    */
  private def partialUpdateSource(m: MergeIntoTable, rel: DmlTarget,
      assignments: Seq[Assignment], fail: String => Nothing,
      insertNew: Boolean): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
    val target = m.targetTable
    val source = m.sourceTable
    def aliasOf(p: LogicalPlan): Option[String] = p match {
      case SubqueryAlias(id, _) => Some(id.name)
      case _ => None
    }
    val srcAlias = aliasOf(source)
    val tgtAlias = aliasOf(target)
    def resolveToSource(e: Expression): Expression = e.transformUp {
      case a: Attribute if target.outputSet.contains(a) =>
        fail(s"SET value references target column ${a.name}; " +
          "partial SET supports expressions over the source only")
      case u: UnresolvedAttribute =>
        if (u.nameParts.length == 2 && tgtAlias.exists(_.equalsIgnoreCase(u.nameParts.head)))
          fail(s"SET value references target column ${u.name}; " +
            "partial SET supports expressions over the source only")
        val qualOk = u.nameParts.length == 1 ||
          (u.nameParts.length == 2 && srcAlias.exists(_.equalsIgnoreCase(u.nameParts.head)))
        if (!qualOk) fail(s"cannot resolve ${u.name} against the MERGE source")
        source.output.find(_.name.equalsIgnoreCase(u.nameParts.last))
          .getOrElse(fail(s"cannot resolve ${u.name} against the MERGE source"))
    }
    val setByName: Map[String, Expression] = assignments.map { as =>
      val k = attrName(as.key).getOrElse(fail(s"unsupported SET key: ${as.key.sql}"))
      if (rel.keys.exists(_.equalsIgnoreCase(k)))
        fail(s"cannot SET primary-key column $k")
      if (!target.output.exists(_.name.equalsIgnoreCase(k)))
        fail(s"SET column $k is not a column of the target table")
      k.toLowerCase -> resolveToSource(as.value)
    }.toMap
    val joined = Join(target, source, Inner, Some(m.mergeCondition), JoinHint.NONE)
    val updated = Project(target.output.map { a =>
      setByName.get(a.name.toLowerCase)
        .map(e => Alias(Cast(e, a.dataType), a.name)()).getOrElse(a)
    }, joined)
    if (!insertNew) updated
    else {
      val anti = Join(source, target, LeftAnti, Some(m.mergeCondition), JoinHint.NONE)
      val inserted = Project(target.output.map { a =>
        val s = source.output.find(_.name.equalsIgnoreCase(a.name))
          .getOrElse(fail(s"INSERT * requires source column ${a.name}"))
        Alias(Cast(s, a.dataType), a.name)()
      }, anti)
      Union(Seq(updated, inserted))
    }
  }

  /** Column names from a conjunction of same-name equality predicates
    * (`t.k = s.k [AND …]`), or None if any conjunct has another shape.
    * Works on both unresolved (first analyzer pass) and resolved attrs.
    */
  private def keyEqualities(e: Expression): Option[Seq[String]] = e match {
    case And(l, r) => for (a <- keyEqualities(l); b <- keyEqualities(r)) yield a ++ b
    case EqualTo(l, r) =>
      (attrName(l), attrName(r)) match {
        case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => Some(Seq(a))
        case _ => None
      }
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case _ => None
  }

}

/** What DML needs to know about a target, whichever surface resolved
  * it: the `mergetable` format (DSv1 relation) or a `graft.db.t`
  * catalog identifier (DSv2 relation).
  */
private[sources] case class DmlTarget(path: String, keys: Seq[String],
                                      mode: String, numBuckets: Option[Int])

/** Eagerly-executed DML against a MergeTable root. The source plan is
  * captured at analysis time and re-analyzed at run — for Delete it is
  * `Filter(cond, target)`, so `DELETE FROM t WHERE p` reads the
  * current snapshot, keeps rows matching p, and deletes their keys.
  */
case class MergeTableDmlCommand(
    path: String,
    keys: Seq[String],
    mode: String,
    numBuckets: Option[Int],
    source: LogicalPlan,
    kind: String) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlBridge.ofRows(session, source)
    val t = new MergeTable(session, path, keys, mode, numBuckets)
    kind match {
      case MergeTableDmlCommand.Upsert =>
        t.upsert(requireUniqueKeys(src))
      case MergeTableDmlCommand.InsertOnly =>
        t.upsert(requireUniqueKeys(src)
          .join(t.read().select(keys.map(col): _*), keys, "left_anti"))
      case MergeTableDmlCommand.Delete =>
        t.delete(src.select(keys.map(col): _*).distinct())
    }
    Seq.empty
  }

  /** MERGE cardinality check (the error Iceberg/Delta raise): a source
    * with duplicate join keys would silently write duplicate-PK rows
    * through upsert. One aggregation, short-circuited at one row.
    */
  private def requireUniqueKeys(src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    val dup = src.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(org.apache.spark.sql.functions.col("_n") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalStateException(
        s"MERGE INTO mergetable: source has multiple rows for key " +
          s"(${keys.mkString(", ")}) = (${dup.head.toSeq.dropRight(1).mkString(", ")}); " +
          "precombine the source to one row per key first")
    src
  }
}

object MergeTableDmlCommand {
  val Upsert = "upsert"
  val InsertOnly = "insert_only"
  val Delete = "delete"
}
