package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage breakdown of named queries: stage id, task count,
  * executor run time, input/shuffle volumes and the first call-site
  * line — the local stand-in for the Spark UI's stage table (UI is
  * off in this harness). Usage:
  *   runMain graft.tools.StageProfile <sfDir> q1[,q2,...]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-stage-profile", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val site = si.details.linesIterator.find(l =>
          l.contains("graft") && !l.contains("StageProfile")).getOrElse("").trim
        stages.add(f"  stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"run=${m.executorRunTime / 1e3}%8.2fs " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%8.1fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB  ${si.name.take(40)}%s  $site")
      }
    })
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { n =>
      stages.clear()
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Thread.sleep(300) // drain listener
        println(f"== $n  wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
        stages.forEach(s => println(s))
      } catch { case e: Throwable => println(s"== $n FAILED: ${e.getMessage}") }
      graft.Caches.clear()
    }
    spark.stop()
  }
}
