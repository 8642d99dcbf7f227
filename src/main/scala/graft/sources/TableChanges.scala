package graft.sources

import graft.cdc.MergeTable
import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `table_changes(table_or_path, start[, end])` —
  * Delta's CDF table-valued function over MergeTables, registered
  * through `SparkSessionExtensions.injectTableFunction` so it
  * composes inside any SELECT:
  *
  * {{{
  *   SELECT * FROM table_changes('graft.db.t', 2)
  *   SELECT * FROM table_changes('/path/to/table', 0, 5) WHERE _change = 'D'
  *   SELECT * FROM table_changes('graft.db.t', '2026-01-01 00:00:00')
  * }}}
  *
  * Bounds are versions when integral, TIMESTAMPS when strings —
  * resolved like the reader options (Delta parity): a starting
  * timestamp INCLUDES the first commit at-or-after it, an ending
  * timestamp ends at the latest commit at-or-before it.
  *
  * Semantics are [[MergeTable.changeFeed]]'s per-version replay (each
  * key's latest change in the window; `endingVersion` defaults to the
  * current version) — identical to the `readChangeFeed` reader
  * option, so the SQL and DataFrame surfaces cannot drift. The first
  * argument resolves as a catalog identifier unless it contains a
  * path separator. Arguments must be literals: the window selects
  * which COMMITTED SNAPSHOTS to diff, which is planning-time
  * information (the same reason Delta's TVF takes literals).
  */
object TableChanges {

  def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "table_changes expects (table_or_path, startingVersion[, endingVersion])")
    require(args.forall(_.foldable), "table_changes arguments must be literals")
    val spark = SparkSession.active
    val target = String.valueOf(args.head.eval())
    val path =
      if (target.contains("/")) target
      else {
        val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(target)
        require(parts.size >= 2,
          s"table_changes table identifier must be catalog-qualified, got '$target'")
        GraftSqlParser.mergetablePath(spark, parts.head, parts.tail, "table_changes")
      }
    val from = args(1).eval() match {
      case n: Number => n.longValue()
      case s0 if s0 != null =>
        // timestamp start: the feed INCLUDES the first commit
        // at-or-after the bound; all commits earlier -> empty feed
        val micros = MergeTable.parseTimestampMicros(String.valueOf(s0))
        MergeTable.versionAtOrAfterTimestamp(path, micros).map(_ - 1)
          .getOrElse(MergeTable.versionAtTimestamp(path, Long.MaxValue).getOrElse(0L))
      case other => throw new IllegalArgumentException(
        s"table_changes start must be a version or timestamp, got $other")
    }
    val t = MergeTable.open(spark, path)
    val to = args.lift(2).map(_.eval() match {
      case n: Number => n.longValue()
      case s1 if s1 != null =>
        val micros = MergeTable.parseTimestampMicros(String.valueOf(s1))
        MergeTable.versionAtTimestamp(path, micros).getOrElse(
          throw new IllegalArgumentException(
            s"table_changes: no commit at or before ending timestamp '$s1' at $path"))
      case other => throw new IllegalArgumentException(
        s"table_changes end must be a version or timestamp, got $other")
    }).getOrElse(t.versions().maxOption.getOrElse(throw new IllegalArgumentException(
      s"table_changes: mergetable at $path has no commits")))
    GraftSqlBridge.logicalPlan(t.changeFeed(from, to))
  }
}
