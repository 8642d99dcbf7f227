package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs, plus the plan-shape helpers
  * the DSv2 specs share — ONE definition of the AQE-aware plan walker
  * so a plan-shape change can't get fixed in one spec's copy and
  * silently miss another's.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Set confs for the body, restoring prior values (incl. unset). */
  def withSQLConf[T](kv: (String, String)*)(body: => T): T = {
    val prior = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** (shuffles, sorts) in the EXECUTED plan — materializes the frame
    * first so AQE finalizes, then walks children, subqueries, and
    * every adaptive/query-stage wrapper.
    */
  def planCounts(df: DataFrame): (Int, Int) = {
    df.collect()
    var shuffles = 0
    var sorts = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      if (p.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
        shuffles += 1
      if (p.isInstanceOf[org.apache.spark.sql.execution.SortExec]) sorts += 1
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case r: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          walk(r.shuffle)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => ()
      }
    }
    walk(df.queryExecution.executedPlan)
    (shuffles, sorts)
  }

  /** Shuffle count in the executed plan (see [[planCounts]]). */
  def shuffles(df: DataFrame): Int = planCounts(df)._1

  /** RESOLVED `tag:rest` lines of a table's newest manifest —
    * manifests may be stored incrementally (`@delta` bodies), so
    * specs asserting on snapshot content must read the materialized
    * view, not raw bytes.
    */
  def latestManifestLines(tableRoot: String): Seq[String] =
    manifestLinesOf(tableRoot,
      new java.io.File(s"$tableRoot/manifests").list().sorted.last)

  /** RESOLVED lines of one named manifest file under `root/manifests`.
    * `op:` labels are commit metadata, not snapshot content — dropped
    * here for the same reason `entries()` drops them, so content
    * assertions stay stable as mutators gain labels.
    */
  def manifestLinesOf(tableRoot: String, name: String): Seq[String] =
    graft.cdc.MergeTable.manifestLines(
      java.nio.file.Paths.get(s"$tableRoot/manifests/$name"))
      .filterNot(_.startsWith("op:"))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("graft-test", "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
