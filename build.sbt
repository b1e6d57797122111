ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtime_data_pipelinespark"
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
// Forked runMain output goes straight to stdout (no [info] prefix) so the
// driver can machine-parse Bench's single JSON line.
run / outputStrategy := Some(StdoutOutput)
outputStrategy := Some(StdoutOutput)
// Suppress sbt's trailing "[success] Total time: …" line: the driver keeps
// only the last 2000 chars of stdout, and anything printed after Bench's
// JSON line eats into that budget (round 4's bench JSON was truncated
// mid-line by exactly this).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // Scratch-medium A/B knob (optimization guide §6): point the forked JVM's
  // tmpdir (streaming checkpoints/sinks, memo spills, Spark local dirs all
  // derive from it) at a different filesystem, e.g. /dev/shm, without a
  // code edit. Unset = JVM default (/tmp).
  sys.env.get("SPARK_GRAFT_TMPDIR").map(d => s"-Djava.io.tmpdir=$d").toSeq
