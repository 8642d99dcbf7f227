package graft.sources

import graft.cdc.MergeTable
import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** Maintenance-SQL parser extension — the statements Iceberg/Delta add
  * with their own parser delegates (`VACUUM t`, `OPTIMIZE t`):
  *
  * {{{
  *   VACUUM graft.db.t                    -- drop data dirs unreferenced by
  *                                        -- the current manifest
  *   COMPACT graft.db.t                   -- fold MOR deltas into the base
  *                                        -- (per-bucket when bucketed)
  *   OPTIMIZE graft.db.t ZORDER BY (a, b) -- rewrite the snapshot clustered
  *                                        -- on the interleaved z-value
  *   RESTORE TABLE graft.db.t TO VERSION AS OF 3
  *   RESTORE TABLE graft.db.t TO TIMESTAMP AS OF '2026-01-01 00:00:00'
  *                                        -- roll back by committing the old
  *                                        -- snapshot as a NEW version
  *   DESCRIBE HISTORY graft.db.t          -- the commit log: version,
  *                                        -- commit time, entry counts
  *   EXPIRE SNAPSHOTS graft.db.t KEEP 3   -- drop all but the newest 3
  *                                        -- manifests (retention horizon)
  * }}}
  *
  * Everything that is not one of these shapes delegates verbatim
  * to Spark's parser, so the extension is purely additive. Injected
  * via `GraftExtensions` (`injectParser`).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Maintenance =
    """(?is)\s*(VACUUM|COMPACT)\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+ZORDER\s+BY\s*\(\s*([a-zA-Z0-9_\s,]+?)\s*\)\s*;?\s*""".r
  private val OptimizeSort =
    """(?is)\s*OPTIMIZE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+SORT\s+BY\s*\(\s*([a-zA-Z0-9_\s,]+?)\s*\)\s*;?\s*""".r
  private val OptimizeFiles =
    """(?is)\s*OPTIMIZE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r
  private val OptimizeWhereZorder =
    """(?is)\s*OPTIMIZE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+WHERE\s+(.+?)\s+ZORDER\s+BY\s*\(\s*([a-zA-Z0-9_\s,]+?)\s*\)\s*;?\s*""".r
  private val OptimizeFilesWhere =
    """(?is)\s*OPTIMIZE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val ShowPartitions =
    """(?is)\s*SHOW\s+PARTITIONS\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r
  private val RestoreVersion =
    """(?is)\s*RESTORE\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTimestamp =
    """(?is)\s*RESTORE\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r
  private val Expire =
    """(?is)\s*EXPIRE\s+SNAPSHOTS\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+KEEP\s+(\d+)\s*;?\s*""".r
  private val CopyInto =
    """(?is)\s*COPY\s+INTO\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+FROM\s+'([^']+)'\s*;?\s*""".r
  private val AddColumns =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""".r
  private val DropColumns =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+DROP\s+COLUMNS?\s+\(?\s*([a-zA-Z0-9_]+(?:\s*,\s*[a-zA-Z0-9_]+)*)\s*\)?\s*;?\s*""".r
  private val RenameColumn =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+RENAME\s+COLUMN\s+([a-zA-Z0-9_]+)\s+TO\s+([a-zA-Z0-9_]+)\s*;?\s*""".r
  private val ShallowClone =
    """(?is)\s*CREATE\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+SHALLOW\s+CLONE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+ADD\s+CONSTRAINT\s+([a-zA-Z0-9_]+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+DROP\s+CONSTRAINT\s+([a-zA-Z0-9_]+)\s*;?\s*""".r
  private val CreateBranch =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+CREATE\s+BRANCH\s+([a-zA-Z0-9_\-]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val CreateTag =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+CREATE\s+TAG\s+([a-zA-Z0-9_\-]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val DropBranch =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+DROP\s+BRANCH\s+([a-zA-Z0-9_\-]+)\s*;?\s*""".r
  private val DropTag =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+DROP\s+TAG\s+([a-zA-Z0-9_\-]+)\s*;?\s*""".r
  private val FastForward =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+FAST\s+FORWARD\s+([a-zA-Z0-9_\-]+)\s*;?\s*""".r
  private val AnalyzeCols =
    """(?is)\s*ANALYZE\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+COMPUTE\s+STATISTICS\s+FOR\s+COLUMNS\s+([a-zA-Z0-9_\s,]+?)\s*;?\s*""".r
  private val AnalyzeAll =
    """(?is)\s*ANALYZE\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+ALL\s+COLUMNS)?\s*;?\s*""".r
  private val SetLayout =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+SET\s+LAYOUT\s+(.+?)\s*;?\s*""".r
  private val LayoutFlat = """(?is)\s*FLAT\s*""".r
  private val LayoutBuckets = """(?is)\s*BUCKETS\s+(\d+)\s*""".r
  private val LayoutParts =
    """(?is)\s*PARTITIONED\s+BY\s*\(\s*([a-zA-Z0-9_\s,]+?)\s*\)\s*""".r
  private val LayoutBucketsParts =
    """(?is)\s*BUCKETS\s+(\d+)\s+PARTITIONED\s+BY\s*\(\s*([a-zA-Z0-9_\s,]+?)\s*\)\s*""".r
  private val ShowBranches =
    """(?is)\s*SHOW\s+BRANCHES\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r
  private val ShowTags =
    """(?is)\s*SHOW\s+TAGS\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s*;?\s*""".r

  // ALTER TABLE graft.db.t DROP [IF EXISTS] PARTITION (col = 'v'[, …])
  private val DropPartition =
    """(?is)\s*ALTER\s+TABLE\s+([a-zA-Z0-9_]+)\.([a-zA-Z0-9_.]+)\s+DROP\s+(IF\s+EXISTS\s+)?PARTITION\s*\((.+?)\)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Maintenance(op, catalog, ident) =>
      MergeTableMaintenanceCommand(op.toLowerCase, catalog,
        ident.split('.').toSeq)
    case Optimize(catalog, ident, cols) =>
      MergeTableMaintenanceCommand("optimize", catalog, ident.split('.').toSeq,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case OptimizeSort(catalog, ident, cols) =>
      MergeTableMaintenanceCommand("sort_buckets", catalog, ident.split('.').toSeq,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case OptimizeFiles(catalog, ident) =>
      MergeTableMaintenanceCommand("optimize_files", catalog, ident.split('.').toSeq)
    // ALTER TABLE t SET LAYOUT FLAT | BUCKETS n | PARTITIONED BY (c…)
    // | BUCKETS n PARTITIONED BY (c…) — one-shot layout migration
    // (rewrite + _META update; see MergeTable.migrateLayout)
    case SetLayout(catalog, ident, spec) =>
      val (buckets, parts) = spec match {
        case LayoutFlat() => (None, Nil)
        case LayoutBucketsParts(n, cols) =>
          (Some(n.toInt), cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        case LayoutBuckets(n) => (Some(n.toInt), Nil)
        case LayoutParts(cols) =>
          (None, cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        case other => throw new IllegalArgumentException(
          s"SET LAYOUT expects FLAT, BUCKETS n, PARTITIONED BY (cols), or " +
            s"BUCKETS n PARTITIONED BY (cols); got '$other'")
      }
      MergeTableMaintenanceCommand("migrate_layout", catalog,
        ident.split('.').toSeq, zorderCols = parts, migrateBuckets = buckets)
    // WHERE + ZORDER must match BEFORE the plain WHERE form: the
    // non-greedy where-text would otherwise swallow the ZORDER clause
    case OptimizeWhereZorder(catalog, ident, where, cols) =>
      MergeTableMaintenanceCommand("optimize", catalog, ident.split('.').toSeq,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        optimizeWhere = Some(where.trim))
    case OptimizeFilesWhere(catalog, ident, where) =>
      MergeTableMaintenanceCommand("optimize_files", catalog, ident.split('.').toSeq,
        optimizeWhere = Some(where.trim))
    // SHOW PARTITIONS is (unlike the rest of this surface) a statement
    // Spark itself parses — intercept ONLY when the leading identifier
    // part names a mergetable catalog, so `SHOW PARTITIONS db.tbl` on
    // hive/v2 tables keeps Spark's own semantics
    case ShowPartitions(catalog, ident)
        if GraftSqlParser.isMergetableCatalog(catalog) =>
      MergeTableShowPartitionsCommand(catalog, ident.split('.').toSeq)
    case RestoreVersion(catalog, ident, v) =>
      MergeTableMaintenanceCommand("restore", catalog, ident.split('.').toSeq,
        restoreTo = Some(Left(v.toLong)))
    case RestoreTimestamp(catalog, ident, ts) =>
      MergeTableMaintenanceCommand("restore", catalog, ident.split('.').toSeq,
        restoreTo = Some(Right(ts)))
    case History(catalog, ident) =>
      MergeTableHistoryCommand(catalog, ident.split('.').toSeq)
    case Detail(catalog, ident) =>
      MergeTableDetailCommand(catalog, ident.split('.').toSeq)
    case Expire(catalog, ident, keep) =>
      MergeTableMaintenanceCommand("expire", catalog, ident.split('.').toSeq,
        expireKeep = Some(keep.toInt))
    case CopyInto(catalog, ident, src) =>
      MergeTableMaintenanceCommand("copyinto", catalog, ident.split('.').toSeq,
        copyFrom = Some(src))
    case AddColumns(catalog, ident, ddl) =>
      MergeTableAddColumnsCommand(catalog, ident.split('.').toSeq, ddl.trim)
    case RenameColumn(catalog, ident, from, to) =>
      MergeTableRenameColumnCommand(catalog, ident.split('.').toSeq, from, to)
    case ShallowClone(catalog, ident, srcCatalog, srcIdent, version) =>
      MergeTableCloneCommand(catalog, ident.split('.').toSeq,
        srcCatalog, srcIdent.split('.').toSeq,
        Option(version).map(_.toLong))
    case AddConstraint(catalog, ident, name, check) =>
      MergeTableConstraintCommand(catalog, ident.split('.').toSeq, name,
        Some(check.trim))
    case DropConstraint(catalog, ident, name) =>
      MergeTableConstraintCommand(catalog, ident.split('.').toSeq, name, None)
    case DropColumns(catalog, ident, cols) =>
      MergeTableDropColumnsCommand(catalog, ident.split('.').toSeq,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    // DROP PARTITION is Spark-parseable syntax (like SHOW PARTITIONS /
    // ANALYZE) — intercept only for mergetable catalogs
    case DropPartition(catalog, ident, ifExists, spec)
        if GraftSqlParser.isMergetableCatalog(catalog) =>
      MergeTableDropPartitionCommand(catalog, ident.split('.').toSeq,
        GraftSqlParser.parsePartitionSpec(spec), ifExists != null)
    case CreateBranch(catalog, ident, name, v) =>
      MergeTableRefCommand("create_branch", catalog, ident.split('.').toSeq,
        name, Option(v).map(_.toLong))
    case CreateTag(catalog, ident, name, v) =>
      MergeTableRefCommand("create_tag", catalog, ident.split('.').toSeq,
        name, Option(v).map(_.toLong))
    case DropBranch(catalog, ident, name) =>
      MergeTableRefCommand("drop_branch", catalog, ident.split('.').toSeq, name)
    case DropTag(catalog, ident, name) =>
      MergeTableRefCommand("drop_tag", catalog, ident.split('.').toSeq, name)
    case FastForward(catalog, ident, name) =>
      MergeTableRefCommand("fast_forward", catalog, ident.split('.').toSeq, name)
    // ANALYZE TABLE is Spark syntax (like SHOW PARTITIONS) — intercept
    // only for mergetable catalogs so other catalogs keep Spark's own
    // (v2 tables otherwise refuse ANALYZE at analysis)
    case AnalyzeCols(catalog, ident, cols)
        if GraftSqlParser.isMergetableCatalog(catalog) =>
      MergeTableAnalyzeCommand(catalog, ident.split('.').toSeq,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case AnalyzeAll(catalog, ident)
        if GraftSqlParser.isMergetableCatalog(catalog) =>
      MergeTableAnalyzeCommand(catalog, ident.split('.').toSeq, Nil)
    case ShowBranches(catalog, ident) =>
      MergeTableShowRefsCommand(branches = true, catalog, ident.split('.').toSeq)
    case ShowTags(catalog, ident) =>
      MergeTableShowRefsCommand(branches = false, catalog, ident.split('.').toSeq)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

/** VACUUM → number of expired data directories; COMPACT → deltas
  * folded (0 when the table had none pending); OPTIMIZE ZORDER →
  * number of clustered files written; RESTORE → the new table version
  * carrying the restored snapshot (a timestamp resolves to the latest
  * commit at-or-before it, like the readers' `timestampAsOf`).
  */
case class MergeTableMaintenanceCommand(op: String, catalogName: String,
                                        ident: Seq[String],
                                        zorderCols: Seq[String] = Nil,
                                        restoreTo: Option[Either[Long, String]] = None,
                                        expireKeep: Option[Int] = None,
                                        copyFrom: Option[String] = None,
                                        optimizeWhere: Option[String] = None,
                                        migrateBuckets: Option[Int] = None) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident, op)
    val t = MergeTable.open(session, path)
    val n: Long = op match {
      case "vacuum" => t.vacuum().toLong
      case "copyinto" => t.copyInto(copyFrom.get).toLong
      case "compact" =>
        val before = t.versions().size
        t.compact()
        (t.versions().size - before).toLong
      case "optimize" =>
        t.cluster(zorderCols, keepLeaf = whereKeep(path))
        t.prunableFiles(t.currentEntries()).map(_.size.toLong).getOrElse(0L)
      case "sort_buckets" => t.sortBuckets(zorderCols).toLong
      // zorderCols carries the target partition columns here
      case "migrate_layout" => t.migrateLayout(migrateBuckets, zorderCols)
      case "optimize_files" =>
        val target = session.conf.getOption("graft.mergetable.targetFileBytes")
          .map(_.toLong).getOrElse(128L * 1024 * 1024)
        t.optimizeFiles(target, whereKeep(path)).toLong
      case "expire" => t.expireSnapshots(expireKeep.get).toLong
      case "restore" =>
        val version = restoreTo.get match {
          case Left(v) => v
          case Right(ts) =>
            val micros = MergeTable.parseTimestampMicros(ts)
            MergeTable.versionAtTimestamp(path, micros).getOrElse(
              throw new IllegalArgumentException(
                s"no commit at or before TIMESTAMP AS OF '$ts' at $path"))
        }
        t.restore(version)
    }
    Seq(Row(n))
  }

  /** The leaf-dir predicate an `OPTIMIZE … WHERE` clause compiles to.
    * On a value-partitioned table: equality conjunction over
    * partition columns, decided EXACTLY per dir on the rendered value
    * (Delta's OPTIMIZE t WHERE shape). On a hash-bucketed table: the
    * scoped equivalent `WHERE bucket = <id>` on the pseudo-column
    * `bucket` — the operational handle SHOW PARTITIONS reports — so a
    * single fragmented bucket can be maintained without rewriting its
    * siblings. Anything else errors loudly rather than silently
    * optimizing the wrong set.
    */
  private def whereKeep(path: String): String => Boolean = optimizeWhere match {
    case None => _ => true
    case Some(w) =>
      val meta = MergeTable.readMeta(path).getOrElse(
        throw new IllegalArgumentException(s"no mergetable at $path"))
      val eqs = GraftSqlParser.parsePartitionEqualities(w)
      if (meta.numBuckets.isDefined && meta.partitionCols.nonEmpty) {
        // composed layout: partition equalities and/or bucket = <id>,
        // conjoined — a leaf is `<partition segs>/_graft_bucket=<i>`
        val (bucketEqs, partEqs) = eqs.partition(_._1.equalsIgnoreCase("bucket"))
        val ids = bucketEqs.map { case (_, v) =>
          if (v.isEmpty || !v.forall(_.isDigit))
            throw new IllegalArgumentException(
              s"OPTIMIZE ... WHERE bucket = <id> needs an integer id, got '$v'")
          v.toLong
        }.toSet
        if (ids.size > 1)
          throw new IllegalArgumentException(
            s"OPTIMIZE ... WHERE bucket = <id> takes exactly one bucket; " +
              s"got contradictory ids (${ids.toSeq.sorted.mkString(", ")})")
        val cols = partEqs.map { case (c, v) =>
          meta.partitionCols.find(_.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"OPTIMIZE ... WHERE supports partition columns and 'bucket' " +
                s"only; '$c' is not one of (${meta.partitionCols.mkString(", ")})")) -> v
        }
        leaf =>
          ids.forall(i => leaf.endsWith(s"/_graft_bucket=$i")) &&
            cols.forall { case (c, v) =>
              PartitionFilters.exact(leaf, meta.partitionCols,
                org.apache.spark.sql.sources.EqualTo(c, v)).contains(true)
            }
      } else if (meta.numBuckets.isDefined) {
        val ids = eqs.map { case (c, v) =>
          if (!c.equalsIgnoreCase("bucket"))
            throw new IllegalArgumentException(
              s"OPTIMIZE ... WHERE on a bucketed table supports only " +
                s"bucket = <id>; got column '$c'")
          if (v.isEmpty || !v.forall(_.isDigit))
            throw new IllegalArgumentException(
              s"OPTIMIZE ... WHERE bucket = <id> needs an integer id, got '$v'")
          v.toLong
        }.toSet
        // two distinct bucket ids conjoined select nothing — refuse
        // loudly like every other malformed OPTIMIZE WHERE instead of
        // silently rewriting zero dirs
        if (ids.size > 1)
          throw new IllegalArgumentException(
            s"OPTIMIZE ... WHERE bucket = <id> takes exactly one bucket; " +
              s"got contradictory ids (${ids.toSeq.sorted.mkString(", ")})")
        leaf => ids.forall(i => leaf == s"_graft_bucket=$i")
      } else {
        require(meta.partitionCols.nonEmpty,
          "OPTIMIZE ... WHERE requires a value-partitioned or bucketed table")
        val cols = eqs.map { case (c, v) =>
          meta.partitionCols.find(_.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"OPTIMIZE ... WHERE supports partition columns only; '$c' " +
                s"is not one of (${meta.partitionCols.mkString(", ")})")) -> v
        }
        leaf => cols.forall { case (c, v) =>
          PartitionFilters.exact(leaf, meta.partitionCols,
            org.apache.spark.sql.sources.EqualTo(c, v)).contains(true)
        }
      }
  }
}

object GraftSqlParser {
  /** The table's logical surface schema for DDL checks: live snapshot
    * columns UNION declared-but-not-yet-written columns (ADD COLUMNS
    * on a table with no write carrying them yet — the snapshot alone
    * would not see them and a follow-up DROP/RENAME/ADD would
    * mis-judge existence, or worse, re-derive the declared schema
    * without them).
    */
  private[sources] def surfaceSchema(t: MergeTable, meta: MergeTable.Meta): StructType = {
    val declared = meta.schemaJson.map(j => DataType.fromJson(j).asInstanceOf[StructType])
    val live = if (t.exists) Some(t.read().schema) else None
    (live, declared) match {
      case (Some(l), Some(d)) =>
        StructType(l.fields ++ d.fields.filterNot(f => l.fieldNames.contains(f.name)))
      case (Some(l), None) => l
      case (None, Some(d)) => d
      case _ => new StructType()
    }
  }

  private[sources] def mergetablePath(session: SparkSession, catalogName: String,
      ident: Seq[String], op: String): String =
    GraftSqlBridge.catalogPlugin(session, catalogName) match {
      case c: MergeTableCatalog => c.pathForIdent(ident)
      case other => throw new UnsupportedOperationException(
        s"$op targets a mergetable catalog; '$catalogName' is ${other.getClass.getName}")
    }

  /** True iff `name` resolves to a [[MergeTableCatalog]] in the
    * active session — the guard that keeps statements Spark ALSO
    * parses (SHOW PARTITIONS) delegating for every other catalog. No
    * active session (or an unresolvable name) delegates too.
    */
  private[sources] def isMergetableCatalog(name: String): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists { sp =>
      try GraftSqlBridge.catalogPlugin(sp, name).isInstanceOf[MergeTableCatalog]
      catch { case _: Throwable => false }
    }

  /** `col = 'v'[, col2 = 3 …]` — the Hive PARTITION-spec shape (comma-
    * separated equalities; `NULL` names the null partition). Anything
    * else errors loudly rather than silently dropping the wrong dirs.
    */
  private[sources] def parsePartitionSpec(spec: String): Seq[(String, Option[String])] = {
    val Eq = """\s*([a-zA-Z0-9_]+)\s*=\s*(?:'([^']*)'|"([^"]*)"|([a-zA-Z0-9_.\-]+))\s*""".r
    spec.split(',').toSeq.map {
      case Eq(c, q1, q2, bare) =>
        val v = Option(q1).orElse(Option(q2)).orElse(Option(bare)).get
        if (q1 == null && q2 == null && v.equalsIgnoreCase("null")) c -> None
        else c -> Some(v)
      case other => throw new IllegalArgumentException(
        s"PARTITION spec expects col = value equalities; got '${other.trim}'")
    }
  }

  /** `col = 'val' [AND col2 = 3 …]` — the only predicate shape
    * OPTIMIZE … WHERE accepts (partition equalities; anything else
    * errors loudly rather than silently optimizing the wrong set).
    */
  private[sources] def parsePartitionEqualities(w: String): Seq[(String, String)] = {
    // consume equalities left-to-right instead of splitting the raw
    // text on AND: a quoted value may itself contain " AND " (e.g.
    // region = 'a AND b'), which a split would shred mid-literal
    val Eq = """\s*([a-zA-Z0-9_]+)\s*=\s*(?:'([^']*)'|([a-zA-Z0-9_.\-]+))\s*""".r
    val AndSep = """(?i)AND\b""".r
    def bad(at: String): Nothing = throw new IllegalArgumentException(
      "OPTIMIZE ... WHERE supports only conjunctions of partition " +
        s"equalities (col = 'value'), got: '${at.trim}'")
    val acc = Seq.newBuilder[(String, String)]
    var rest = w
    var done = false
    while (!done) {
      val m = Eq.findPrefixMatchOf(rest).getOrElse(bad(rest))
      acc += (m.group(1) -> Option(m.group(2)).getOrElse(m.group(3)))
      rest = rest.substring(m.end)
      if (rest.trim.isEmpty) done = true
      else {
        // anything after an equality must be AND + another equality
        // (a dangling AND falls through to the Eq failure above)
        val sep = AndSep.findPrefixMatchOf(rest).getOrElse(bad(rest))
        rest = rest.substring(sep.end)
      }
    }
    acc.result()
  }
}

/** `SHOW PARTITIONS graft.db.t` — the metadata-only per-partition
  * summary (partition spec, file count, exact row count from footer
  * stats when complete, bytes); pending MOR deltas surface as one
  * "(pending deltas)" row since their rows are not yet
  * partition-attributed. O(files) driver-side walk, zero data reads.
  */
case class MergeTableShowPartitionsCommand(catalogName: String,
                                           ident: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)(),
    AttributeReference("bytes", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "SHOW PARTITIONS")
    val meta = MergeTable.readMeta(path).getOrElse(
      throw new IllegalArgumentException(s"no mergetable at $path"))
    require(meta.partitionCols.nonEmpty || meta.numBuckets.isDefined,
      s"SHOW PARTITIONS: table ${ident.mkString(".")} is neither " +
        "value-partitioned nor hash-bucketed")
    val t = MergeTable.open(session, path)
    if (!t.exists) Seq.empty
    else {
      // a bucketed table's operational units are its buckets — report
      // them with the same (spec, files, rows, bytes) shape; a
      // COMPOSED table's partitions are its VALUE partitions (each
      // row folding that partition's bucket cells)
      val summary =
        if (meta.numBuckets.isDefined && meta.partitionCols.isEmpty)
          t.bucketSummary()
        else t.partitionSummary()
      summary.map { case (spec, nf, rows, bytes) =>
        Row(spec, nf, rows.map(Long.box).orNull, bytes)
      }
    }
  }
}

/** `CREATE TABLE graft.db.c SHALLOW CLONE graft.db.t [VERSION AS OF n]`
  * — Delta's zero-copy clone: the new table's first commit references
  * the source's data dirs (see [[graft.cdc.MergeTable.shallowClone]]);
  * no rows move. Returns the cloned snapshot's row-bearing entry count.
  */
case class MergeTableCloneCommand(catalogName: String, ident: Seq[String],
                                  srcCatalogName: String, srcIdent: Seq[String],
                                  versionAsOf: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val srcPath = GraftSqlParser.mergetablePath(session, srcCatalogName,
      srcIdent, "SHALLOW CLONE")
    val dstPath = GraftSqlParser.mergetablePath(session, catalogName,
      ident, "SHALLOW CLONE")
    val t = MergeTable.shallowClone(session, srcPath, dstPath, versionAsOf)
    Seq(Row(t.currentEntries().size.toLong))
  }
}

/** `DESCRIBE HISTORY graft.db.t` — the commit log, newest first:
  * one row per committed version with the commit wall-clock time
  * (the manifest mtime `TIMESTAMP AS OF` resolves against) and the
  * snapshot's base/delta entry counts. Reports exactly what the log
  * records — no invented operation labels.
  */
/** `ALTER TABLE graft.db.t ADD CONSTRAINT name CHECK (expr)` /
  * `... DROP CONSTRAINT name` — write-side CHECK constraints (the
  * Delta constraints surface). ADD validates existing data first and
  * every subsequent append/upsert batch is rejected atomically if any
  * row fails a check.
  */
case class MergeTableConstraintCommand(catalogName: String, ident: Seq[String],
                                       name: String, check: Option[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "ALTER TABLE ... CONSTRAINT")
    val t = MergeTable.open(session, path)
    check match {
      case Some(sql) => t.addConstraint(name, sql)
      case None => t.dropConstraint(name)
    }
    Seq(Row(1L))
  }
}

/** `ALTER TABLE graft.db.t ADD COLUMNS (name TYPE, ...)` — declared
  * schema evolution (the Delta/Iceberg ADD COLUMNS surface): the new
  * columns are recorded in `_META.json`'s declared schema and
  * immediately read as typed nulls on every row (the read-side
  * backfill in `MergeTableRelation`); the first write that carries
  * them persists real values via the existing write-side
  * `unionByName` evolution. Duplicate names are rejected against the
  * CURRENT snapshot schema, not just the declared one.
  */
case class MergeTableAddColumnsCommand(catalogName: String, ident: Seq[String],
                                       columnsDdl: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "ALTER TABLE ... ADD COLUMNS")
    val added = StructType.fromDDL(columnsDdl)
    val meta = MergeTable.readMeta(path).getOrElse(
      throw new IllegalArgumentException(s"no mergetable at $path"))
    val t = new MergeTable(session, path, meta.keys, meta.mode, meta.numBuckets)
    val current: StructType = GraftSqlParser.surfaceSchema(t, meta)
    added.fieldNames.foreach { n =>
      require(!current.fieldNames.contains(n),
        s"column '$n' already exists in ${ident.mkString(".")}")
    }
    // re-adding a DROPPED name is legal under the column mapping: the
    // new logical column maps to a FRESH physical id, so values of
    // the dropped column (still present in unreclaimed data files
    // under the old physical name) can never resurrect — the Delta
    // column-mapping contract
    val taken: Set[String] = meta.droppedColumns.toSet ++
      meta.renames.values ++ current.fieldNames
    val newRenames = added.fieldNames.filter(meta.droppedColumns.contains)
      .map { n =>
        val fresh = Iterator.from(1).map(i => s"${n}_r$i")
          .find(!taken.contains(_)).get
        n -> fresh
      }.toMap
    val merged = StructType(current.fields ++ added.fields)
    MergeTable.writeMeta(path, meta.copy(schemaJson = Some(merged.json),
      renames = meta.renames ++ newRenames))
    Seq(Row(added.fields.length.toLong))
  }
}

/** `ALTER TABLE graft.db.t RENAME COLUMN a TO b` — column rename via
  * NAME MAPPING (the Delta/Iceberg column-mapping idea): a pure
  * metadata commit recording logical `b` → the column's unchanged
  * PHYSICAL name, so no data file is touched, every read surface —
  * current snapshot, time travel of PRE-rename versions, the change
  * feed — immediately sees the new name, and writes using the new
  * name translate back to the physical column. Key columns (they
  * drive joins, bucketing and MOR reconciliation in physical space)
  * and constraint-referenced columns refuse to rename; renaming onto
  * an existing or previously-dropped-and-unreclaimed name is
  * rejected.
  */
case class MergeTableRenameColumnCommand(catalogName: String, ident: Seq[String],
                                         from: String, to: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "ALTER TABLE ... RENAME COLUMN")
    val meta = MergeTable.readMeta(path).getOrElse(
      throw new IllegalArgumentException(s"no mergetable at $path"))
    val t = new MergeTable(session, path, meta.keys, meta.mode, meta.numBuckets)
    val current: Array[String] = GraftSqlParser.surfaceSchema(t, meta).fieldNames
    require(current.contains(from),
      s"column '$from' does not exist in ${ident.mkString(".")}")
    require(!current.contains(to),
      s"column '$to' already exists in ${ident.mkString(".")}")
    require(!meta.keys.contains(from), s"cannot rename key column '$from'")
    require(!meta.sortBy.contains(from),
      s"cannot rename declared sortBy column '$from': future seeds would " +
        "sort by a stale name — drop the property first")
    require(!meta.derivedPartitions.values.toSeq.contains(from),
      s"cannot rename column '$from': a hidden partition derives from it " +
        "(future writes would inject from a stale name)")
    require(!meta.droppedColumns.contains(to),
      s"column '$to' was previously dropped from ${ident.mkString(".")} and " +
        "not yet reclaimed — renaming onto it would shadow its pending data")
    meta.constraints.foreach { case (name, sql) =>
      val refs = session.sessionState.sqlParser.parseExpression(sql)
        .references.map(_.name.toLowerCase).toSet
      require(!refs.contains(from.toLowerCase),
        s"cannot rename '$from': referenced by CHECK constraint '$name'")
    }
    val physical = meta.renames.getOrElse(from, from)
    val newSchema = meta.schemaJson.map { j =>
      val st = DataType.fromJson(j).asInstanceOf[StructType]
      StructType(st.fields.map(f => if (f.name == from) f.copy(name = to) else f)).json
    }
    MergeTable.writeMeta(path, meta.copy(
      renames = meta.renames - from + (to -> physical),
      schemaJson = newSchema))
    Seq(Row(1L))
  }
}

/** `ALTER TABLE graft.db.t DROP COLUMN(S) (a, b)` — metadata-only
  * column drop (the Iceberg contract): the columns disappear from
  * every current-snapshot read immediately, data files keep them
  * until the next COW rewrite / compaction physically removes them,
  * and time travel / the change feed still see history. Key columns
  * and constraint-referenced columns refuse to drop.
  */
case class MergeTableDropColumnsCommand(catalogName: String, ident: Seq[String],
                                        cols: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "ALTER TABLE ... DROP COLUMNS")
    val meta = MergeTable.readMeta(path).getOrElse(
      throw new IllegalArgumentException(s"no mergetable at $path"))
    val t = new MergeTable(session, path, meta.keys, meta.mode, meta.numBuckets)
    val current: Array[String] = GraftSqlParser.surfaceSchema(t, meta).fieldNames
    cols.foreach { c =>
      require(current.contains(c),
        s"column '$c' does not exist in ${ident.mkString(".")}")
      require(!meta.keys.contains(c), s"cannot drop key column '$c'")
      require(!meta.sortBy.contains(c),
        s"cannot drop declared sortBy column '$c'")
      // the partition-scoped merge derives leaf dirs from this column
      // on every write — dropping it would wedge the write path with
      // an unresolvable reference on the next upsert/delete
      require(!meta.partitionCols.contains(c),
        s"cannot drop partition column '$c'")
      require(!meta.derivedPartitions.values.toSeq.contains(c),
        s"cannot drop column '$c': a hidden partition derives from it")
      meta.constraints.foreach { case (name, sql) =>
        // resolve actual attribute references, not a textual match —
        // a column name inside a string LITERAL (CHECK (tag != 'v'))
        // must not block dropping an unreferenced column 'v'
        val refs = session.sessionState.sqlParser.parseExpression(sql)
          .references.map(_.name.toLowerCase).toSet
        require(!refs.contains(c.toLowerCase),
          s"cannot drop '$c': referenced by CHECK constraint '$name'")
      }
    }
    val newSchema = meta.schemaJson.map { j =>
      val st = DataType.fromJson(j).asInstanceOf[StructType]
      StructType(st.fields.filterNot(f => cols.contains(f.name))).json
    }
    // record the PHYSICAL name (what data files carry — the name a
    // future rewrite must reclaim) and retire the mapping entry
    val physical = cols.map(c => meta.renames.getOrElse(c, c))
    MergeTable.writeMeta(path, meta.copy(
      droppedColumns = (meta.droppedColumns ++ physical).distinct,
      renames = meta.renames -- cols,
      schemaJson = newSchema))
    Seq(Row(cols.length.toLong))
  }
}

/** `ALTER TABLE graft.db.t DROP [IF EXISTS] PARTITION (col = 'v'[, …])`
  * — the explicit twin of the partition-complete DELETE: drop the
  * named partition's dirs from the manifest in ONE metadata commit,
  * zero data I/O (history preserved; vacuum reclaims). A PARTIAL spec
  * (a prefix of the partition columns, or any subset) drops every
  * matching leaf — the Hive multi-level semantics. Hidden layouts
  * address the DERIVED column (`ts_day = '2024-03-01'`). Unlike the
  * predicate DELETE, this command never falls back to a row-level
  * path: a snapshot whose rows live outside pv dirs (pending MOR
  * deltas, dv masks, bucketed/composed layouts) refuses loudly —
  * metadata-only is the CONTRACT here, not an optimization.
  */
case class MergeTableDropPartitionCommand(catalogName: String, ident: Seq[String],
    spec: Seq[(String, Option[String])], ifExists: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("dropped_partitions", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "ALTER TABLE ... DROP PARTITION")
    val meta = MergeTable.readMeta(path).getOrElse(
      throw new IllegalArgumentException(s"no mergetable at $path"))
    require(meta.partitionCols.nonEmpty,
      s"${ident.mkString(".")} is not a partitioned table")
    spec.foreach { case (c, _) =>
      require(meta.partitionCols.exists(_.equalsIgnoreCase(c)),
        s"'$c' is not a partition column of ${ident.mkString(".")} " +
          s"(partitioned by ${meta.partitionCols.mkString(", ")})")
    }
    // WAP routing like every other write: the drop lands on the branch
    val t = MergeTable.forWrite(session, path, meta.keys, meta.mode,
      meta.numBuckets, meta.partitionCols)
    val wanted = spec.map { case (c, v) =>
      val canonical = meta.partitionCols.find(_.equalsIgnoreCase(c)).get
      val rendered = v.map(ExternalCatalogUtils.escapePathName)
        .getOrElse("__HIVE_DEFAULT_PARTITION__")
      s"${MergeTable.PartPrefixName}$canonical=$rendered"
    }
    val drop: String => Boolean = leaf => {
      val segs = leaf.split('/').toSet
      wanted.forall(segs.contains)
    }
    t.deletePartitions(drop) match {
      case None => throw new IllegalStateException(
        s"DROP PARTITION on ${ident.mkString(".")} requires a snapshot of " +
          "pure partition leaves (value-partitioned or composed " +
          "partition×bucket): pending MOR deltas / dv masks hold rows " +
          "outside the partition dirs — run COMPACT TABLE first " +
          "(unpartitioned bucketed layouts have no partition dirs to drop)")
      case Some(0) if !ifExists => throw new IllegalArgumentException(
        s"no partition of ${ident.mkString(".")} matches " +
          spec.map { case (c, v) => s"$c=${v.getOrElse("NULL")}" }.mkString(", ") +
          " (use IF EXISTS to ignore)")
      case Some(n) => Seq(Row(n.toLong))
    }
  }
}

/** `DESCRIBE DETAIL graft.db.t` — Delta's one-row table summary:
  * location, write mode, key columns, bucket count, live file count
  * and bytes, committed versions, and registered CHECK constraints.
  */
case class MergeTableDetailCommand(catalogName: String,
                                   ident: Seq[String]) extends LeafRunnableCommand {

  import org.apache.spark.sql.types.StringType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("keys", StringType, nullable = false)(),
    AttributeReference("num_buckets", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_versions", LongType, nullable = false)(),
    AttributeReference("constraints", StringType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("column_mapping", StringType, nullable = false)(),
    AttributeReference("dropped_columns", StringType, nullable = false)(),
    AttributeReference("branches", StringType, nullable = false)(),
    AttributeReference("tags", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      "DESCRIBE DETAIL")
    val t = MergeTable.open(session, path)
    val es = t.currentEntries()
    val files = es.map(_._2).map(d =>
      graft.cdc.FileStats.listParquetFiles(
        java.nio.file.Paths.get(path, "data", d)).size.toLong).sum
    val cs = t.constraints.toSeq.sortBy(_._1)
      .map { case (n, sql) => s"$n CHECK ($sql)" }.mkString("; ")
    val meta = MergeTable.readMeta(path)
    val mapping = meta.map(_.renames).getOrElse(Map.empty).toSeq.sorted
      .map { case (logical, physical) => s"$logical->$physical" }.mkString(",")
    Seq(Row(path, t.mode, t.keys.mkString(","),
      t.numBuckets.getOrElse(0).toLong, files, t.snapshotBytes(es),
      t.versions().size.toLong, cs,
      t.partitionCols.mkString(","), mapping,
      meta.map(_.droppedColumns).getOrElse(Nil).mkString(","),
      t.branches().mkString(","),
      t.tags().map(g => s"$g=v${t.tagVersion(g)}").mkString(",")))
  }
}

case class MergeTableHistoryCommand(catalogName: String,
                                    ident: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", org.apache.spark.sql.types.TimestampType,
      nullable = false)(),
    AttributeReference("base_entries", LongType, nullable = false)(),
    AttributeReference("delta_entries", LongType, nullable = false)(),
    AttributeReference("operation", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident, "DESCRIBE HISTORY")
    MergeTable.open(session, path).history().sortBy(-_._1).map {
      case (v, millis, bases, deltas, op) =>
        Row(v, new java.sql.Timestamp(millis), bases.toLong, deltas.toLong, op)
    }
  }
}

/** Branch/tag ref maintenance (Iceberg refs on graft tables):
  *
  * {{{
  *   ALTER TABLE graft.db.t CREATE BRANCH audit [VERSION AS OF 3]
  *   ALTER TABLE graft.db.t CREATE TAG release [VERSION AS OF 3]
  *   ALTER TABLE graft.db.t DROP BRANCH audit
  *   ALTER TABLE graft.db.t DROP TAG release
  *   ALTER TABLE graft.db.t FAST FORWARD audit   -- publish the branch
  * }}}
  *
  * `affected`: the forked/tagged version on create, the published
  * head on fast-forward, 1 on drop.
  */
case class MergeTableRefCommand(op: String, catalogName: String,
                                ident: Seq[String], refName: String,
                                version: Option[Long] = None) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident, op)
    val t = MergeTable.open(session, path)
    val n: Long = op match {
      case "create_branch" => t.createBranch(refName, version)
      case "create_tag" => t.createTag(refName, version)
      case "drop_branch" => t.dropBranch(refName); 1L
      case "drop_tag" => t.dropTag(refName); 1L
      case "fast_forward" => t.fastForward(refName)
    }
    Seq(Row(n))
  }
}

/** `SHOW BRANCHES graft.db.t` / `SHOW TAGS graft.db.t` — the table's
  * refs with their anchor versions (branches also report the fork).
  */
case class MergeTableShowRefsCommand(branches: Boolean, catalogName: String,
                                     ident: Seq[String]) extends LeafRunnableCommand {

  import org.apache.spark.sql.types.StringType

  override val output: Seq[Attribute] =
    if (branches) Seq(
      AttributeReference("branch", StringType, nullable = false)(),
      AttributeReference("head_version", LongType, nullable = false)(),
      AttributeReference("fork_version", LongType, nullable = false)())
    else Seq(
      AttributeReference("tag", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident,
      if (branches) "SHOW BRANCHES" else "SHOW TAGS")
    val t = MergeTable.open(session, path)
    if (branches) t.branches().map { b =>
      val head = t.forBranch(b).versions().lastOption.getOrElse(t.forkVersion(b))
      Row(b, head, t.forkVersion(b))
    } else t.tags().map(g => Row(g, t.tagVersion(g)))
  }
}

/** `ANALYZE TABLE graft.db.t COMPUTE STATISTICS [FOR COLUMNS a, b |
  * FOR ALL COLUMNS]` — one aggregate job computes per-column NDV
  * (HLL++), null count, and avg/max lengths, persisted beside the file
  * stats; the DSv2 scan serves them through `columnStats()` so
  * `spark.sql.cbo.enabled` join reordering sees real NDVs.
  * `affected` = columns analyzed.
  */
case class MergeTableAnalyzeCommand(catalogName: String, ident: Seq[String],
                                    cols: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.mergetablePath(session, catalogName, ident, "ANALYZE")
    val stats = MergeTable.open(session, path).analyzeColumns(cols)
    Seq(Row(stats.cols.size.toLong))
  }
}
