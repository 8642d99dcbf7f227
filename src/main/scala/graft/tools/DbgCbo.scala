package graft.tools
object DbgCbo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("dbg", "local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.cdc.MergeTable.drop("target/graft_warehouse/dbgcbo")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbgcbo")
    spark.sql("CREATE TABLE graft.dbgcbo.t (id BIGINT, k BIGINT) TBLPROPERTIES('keys'='id')")
    (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L))
      .toDF("id", "k").createOrReplaceTempView("src")
    spark.sql("INSERT INTO graft.dbgcbo.t SELECT * FROM src")
    spark.conf.set("graft.mergetable.histogramBins", "10")
    spark.sql("ANALYZE TABLE graft.dbgcbo.t COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val base = spark.table("graft.dbgcbo.t")
    println("BASE stats: " + base.queryExecution.optimizedPlan.stats)
    val f = spark.sql("SELECT * FROM graft.dbgcbo.t WHERE k = 7")
    println("FILTER plan: " + f.queryExecution.optimizedPlan)
    println("FILTER stats: " + f.queryExecution.optimizedPlan.stats)
    f.queryExecution.optimizedPlan.foreach(p =>
      println(s"  node ${p.nodeName}: rowCount=${p.stats.rowCount} attrs=${p.stats.attributeStats.map{case(a,s)=>a.name->s}}"))
    spark.stop()
  }
}
