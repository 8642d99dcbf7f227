package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point: enables graft's planner strategy
  * and native functions via configuration —
  * `spark.sql.extensions=graft.GraftExtensions` — so a cluster picks
  * them up without code changes. (The library also self-registers at
  * first use for programmatic sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // histogram-driven skew salting: ANALYZE's heavy-hitter signal
    // re-shapes shuffle joins AQE's byte thresholds would miss
    ext.injectOptimizerRule(session => graft.plans.SaltSkewedJoin(session))
    ext.injectResolutionRule(session => new graft.sources.ResolveMergeTableDml(session))
    ext.injectResolutionRule(session => new graft.plans.RewriteToMaterializedView(session))
    ext.injectParser((_, delegate) => new graft.sources.GraftSqlParser(delegate))
    // one function table shared with GraftFunctions.register — the two
    // registration paths (config-driven vs programmatic) cannot drift
    GraftFunctions.all.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
    // Delta-parity CDF table function: SELECT * FROM table_changes(t, v1[, v2])
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.sources.TableChanges.getClass.getName, "table_changes"),
      graft.sources.TableChanges.plan))
  }
}
