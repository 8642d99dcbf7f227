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

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Maintenance(op, catalog, ident) =>
      MergeTableMaintenanceCommand(op.toLowerCase, catalog,
        ident.split('.').toSeq)
    case Optimize(catalog, ident, cols) =>
      MergeTableMaintenanceCommand("optimize", catalog, ident.split('.').toSeq,
        cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
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
  * number of clustered files written.
  */
case class MergeTableMaintenanceCommand(op: String, catalogName: String,
                                        ident: Seq[String],
                                        zorderCols: Seq[String] = Nil) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val catalog = GraftSqlBridge.catalogPlugin(session, catalogName) match {
      case c: MergeTableCatalog => c
      case other => throw new UnsupportedOperationException(
        s"$op targets a mergetable catalog; '$catalogName' is ${other.getClass.getName}")
    }
    val path = catalog.pathForIdent(ident)
    val t = MergeTable.open(session, path)
    val n: Long = op match {
      case "vacuum" => t.vacuum().toLong
      case "compact" =>
        val before = t.versions().size
        t.compact()
        (t.versions().size - before).toLong
      case "optimize" =>
        t.cluster(zorderCols)
        t.prunableFiles(t.currentEntries()).map(_.size.toLong).getOrElse(0L)
    }
    Seq(Row(n))
  }
}
