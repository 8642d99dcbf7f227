package graft.tools

/** Prints the join/exchange skeleton of named queries' physical plans
  * — the "would this plan survive 100×?" audit: forced broadcasts of
  * SF-scaled tables show up here as BroadcastExchange under a fact
  * scan. Usage: runMain graft.tools.PlanAudit <sfDir> [q1,q2,...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // GRAFT_AUDIT_AUTOBROADCAST=-1 disables size-based broadcasts: any
    // BroadcastExchange left in the plan is an explicit hint — the way
    // to prove no SF-scaled table is force-broadcast
    val spark = graft.GraftSession.builder("graft-plan-audit", "local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_AUDIT_AUTOBROADCAST", "10485760"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_AUDIT_AUTOBROADCAST", "10485760"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = args.lift(1).map(_.split(",").toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.forall(_.contains(n)))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        // GRAFT_AUDIT_EXECUTE=1: run the query first so the printed
        // plan is AQE's FINAL plan (runtime broadcast conversions,
        // skew splits), not the initial static one. Must execute THIS
        // df's own QueryExecution — df.count() would build a new one
        // and leave this plan un-finalized
        if (sys.env.get("GRAFT_AUDIT_EXECUTE").contains("1"))
          df.queryExecution.toRdd.count()
        val plan = df.queryExecution.executedPlan.toString
        val skeleton = plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("WholeStageCodegen") || l.contains("TopKPerKey"))
          .map(_.replaceAll("#\\d+L?", "").trim.take(140))
          .mkString("\n  ")
        println(s"== $n\n  $skeleton")
      } catch { case e: Throwable => println(s"== $n FAILED: ${e.getMessage}") }
      graft.Caches.clear()
    }
    spark.stop()
  }
}
