ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// No "[success] Total time: ..." trailer after a task finishes: the bench
// harness parses the LAST stdout line as the summary JSON, and sbt's own
// success banner printing after the forked JVM's output broke that parse
// (exit code still reports success/failure to callers).
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — the
// unused-key lint can't see that
Global / excludeLintKeys += showSuccess
name := "prototoavroqlspark"
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
// The bench driver may invoke `sbt "runMain graft.Bench"` BARE (not via
// scripts/bench.sh) and parse the last stdout line as JSON. A forked JVM's
// stdout normally routes through sbt's logger, decorating every line with
// "[info] " and breaking that parse. StdoutOutput makes the forked process
// inherit the real stdout, bypassing the logger entirely.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
)
