package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Writes `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (plans/rNN/<query>_<tag>.txt).
  * Runs at the bench's core count so exchange partitioning matches
  * what the bench times.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r15")
    val tag = args.lift(2).getOrElse("before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-plan-dump", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val wanted = args.lift(3).map(_.split(",").toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.forall(_.contains(n)))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        // capture the pre-execution formatted plan (deterministic;
        // AQE's final plan varies with runtime sizes) — expression ids
        // normalized so before/after diffs show structure, not ids
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
          txt.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"wrote $outDir/${n}_$tag.txt")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      graft.Caches.clear()
    }
    spark.stop()
  }
}
