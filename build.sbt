ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scaldingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession (SparkSpec): run them sequentially.
// Parallel suites race on session-global state — runtime conf flips
// (two specs toggle autoBroadcastJoinThreshold), the cache registry
// (BenchHygieneSpec asserts nothing stays resident while other suites
// legitimately persist mid-flight), and temp views. The suites all
// drive the same local[4] scheduler anyway, so serializing costs
// little wall-clock and makes the run deterministic.
Test / parallelExecution := false
run / fork := true
// Let the forked `run` JVM write straight to stdout — sbt's default
// LoggedOutput prefixes every line with [info]/[error], which breaks
// machine parsing of Bench's single JSON result line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // keep managed-table output (saveAsTable in specs) out of the repo
  "-Dspark.sql.warehouse.dir=/tmp/graft-warehouse",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Deep multi-stage plans (TrainingDataJob chains 5 operator
  // families) recurse hard in Catalyst's tree walks; the real fix is
  // lineage cuts between stages, the bigger stack is the belt.
  "-Xss8m",
)
