package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§6.
  *
  * Queries are contributed by module registries; each module pairs a
  * Spark implementation with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    graft.analytics.Queries,
    graft.analytics.Queries2,
    graft.analytics.Queries3,
    graft.analytics.Queries4,
    graft.analytics.Queries5,
    graft.analytics.Queries6,
    graft.analytics.Queries7,
    graft.analytics.Queries8,
    graft.analytics.PartsuppQueries,
    graft.analytics.MvQueries,
    graft.analytics.GraphQueries,
    graft.analytics.SeriesQueries,
    graft.cdc.CdcQueries,
    graft.ops.TextQueries,
    graft.ops.SimilarityQueries,
    graft.ops.CorpusQueries,
    graft.ops.SearchQueries,
    graft.ops.QualityQueries,
    graft.ops.ProfileQueries,
  )

  private lazy val allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
