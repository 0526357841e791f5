ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hrtechetlspark"
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
// The bench driver parses a JSON line from the last ~2000 chars of the
// run's output. sbt's default LoggedOutput prefixes every forked-run
// line with "[info] "/"[error] " and appends its own "[success] Total
// time..." line, which broke that parse 17 rounds running. Inherit the
// forked JVM's streams unwrapped and drop the success banner so the
// final stdout line is Bench's bare JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // 16g headroom: a contended full-suite bench run at 8g once lost the
  // DAGScheduler event loop to a fatal error near the end of the suite
  // (every later job then fails instantly with "SparkContext was shut
  // down"); the machine has 125 GiB and only one forked JVM runs at a
  // time, so the larger default costs nothing locally.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
