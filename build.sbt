ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
scalacOptions += "-deprecation"
name := "dataengineeringprojectspark"
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
// Suites share one SparkSession (TestSpark) and some toggle session
// conf around a plan assertion — run them sequentially, not in
// parallel threads of the forked JVM.
Test / parallelExecution := false
// Forked-run output goes straight to stdout (no sbt [info]/[error] log
// prefixes) so the driver can parse Bench's single JSON line.
run / outputStrategy := Some(StdoutOutput)
Test / outputStrategy := Some(StdoutOutput)
// Suppress sbt's trailing "[success] Total time: …" line: the driver
// parses Bench's JSON from the tail of captured stdout, and the JSON
// line must be the LAST line to survive the driver's 2000-char window.
Global / showSuccess := false
// showSuccess is consumed by sbt's logger, not by other settings —
// silence the false-positive lint warning it triggers on every build
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
  // 16g default on this 128 GiB box: local[32] is one JVM acting as 32
  // executors, so unified memory is 0.6×heap shared by every concurrent
  // task — at 8g the sf1 banded-LSH join measurably spilled mid-stream
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
