ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automateddatapipelinepythonspark"
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
// The driver tail-captures `sbt runMain` output and json-parses the
// LAST line (BENCH contract). Two sbt behaviors broke that: the
// `[info] ` prefix the logger adds to forked output, and the
// `[success] Total time` epilogue printed after the program's final
// line. StdoutOutput passes the forked JVM's stdout through verbatim;
// showSuccess=false drops the epilogue — Bench's compact JSON record
// is then literally the last stdout line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 16g default: local[32] with localCheckpointed index artifacts needs
  // storage-memory headroom — eviction under an 8g heap recomputes
  // checkpoint lineage and showed up as 4-10x per-query spikes in
  // contended bench recordings (machine has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
Global / excludeLintKeys += showSuccess
