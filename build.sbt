ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdcdatalakepysparkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// the container's default locale is POSIX, which makes the JVM's
// sun.jnu.encoding ASCII and breaks non-ASCII FILE NAMES (e.g.
// partition dirs for unicode partition values) — real Spark images
// ship C.UTF-8, so match that for the forked JVMs
Test / envVars ++= Map("LANG" -> "C.UTF-8", "LC_ALL" -> "C.UTF-8")
run / envVars ++= Map("LANG" -> "C.UTF-8", "LC_ALL" -> "C.UTF-8")
// raw stdout for forked runMain: sbt's LoggedOutput prefixes every
// line with "[info] ", so Bench's JSON artifact line never started
// with '{' — a driver-side startswith parse can't see it otherwise
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
scalacOptions ++= Seq("-encoding", "UTF-8")
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // whole-stage codegen emits fresh classes per query; a ~70-query
  // suite overflows smaller code caches and the JIT silently stops
  // compiling — per-row hot loops then run interpreted (measured:
  // 240m default ~40% slower suite, 1g still ~15% slower than 2g)
  "-XX:ReservedCodeCacheSize=2g",
  // batch throughput beats pause latency here: one JVM, 32 threads,
  // no interactive consumers of short pauses
  "-XX:+UseParallelGC",
)
