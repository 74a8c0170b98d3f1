ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dp1datawranglingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// No "[success] Total time: ..." epilogue: the round driver parses the
// LAST stdout line of `sbt "runMain graft.Bench"` as the bench JSON
// record, and sbt's success banner printed after the forked JVM exits
// made that parse fail every round. Errors still print (and Bench
// exits nonzero on a red run), so nothing diagnostic is lost.
Global / showSuccess := false
// Forked run output goes STRAIGHT to stdout, not through sbt's logger:
// the logger prefixes every program line with "[info] ", which breaks
// the driver's strict JSON parse of the bench total line even with the
// success banner gone.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / fork := true
// run/runMain MUST fork: Bench calls sys.exit on a red run (the
// exit-code gate), which on modern JDKs would kill the sbt JVM itself
// if run in-process; forking also makes the add-opens javaOptions
// below take effect at all. Explicit in both scopes so a future
// config-scoped override can't silently un-fork runMain.
Compile / run / fork := true
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
