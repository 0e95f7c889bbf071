ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openseizuredatabasespark"
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
// The driver parses the bench's stdout JSON line. sbt's default forked
// output strategy routes the child's stdout through the logger, which
// prefixes every line with "[info] " and broke the driver's JSON parse
// in rounds 18-19 (BENCH_r*.json parsed: null). StdoutOutput hands the
// forked JVM the real stdout/stderr; showSuccess drops the "[success]
// Total time" trailer sbt would otherwise print AFTER our final line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint so the bench stdout stays warning-free.
Global / excludeLintKeys += showSuccess
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
  // 32g of the host's 128 GiB: the bench drives ~100 queries (array
  // fixtures, streaming state stores, JSON round-trips) through ONE
  // long-lived JVM — at 8g the old-gen fills over a sweep and GC pauses
  // land on whichever query is running, the residual source of
  // code-unchanged slow reps after the r6 interleaving fix.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
// Engine suites share one local SparkSession; run them sequentially so
// streaming state-store tests don't contend for the 4 task slots.
Test / parallelExecution := false
