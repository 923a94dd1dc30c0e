ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jpqcewspark"
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
// Driver-parse contract (round 15): the harness archives `sbt "runMain
// graft.Bench"` by parsing a JSON line from the tail of the output, and
// BENCH_r10..r14 all carry parsed:null — the default fork output
// strategy routes the child's stdout through sbt's logger, so every
// line arrives as "[info] {...}" and the trailing "[success] Total
// time..." banner lands after it. StdoutOutput makes the forked JVM
// inherit sbt's own stdout/stderr (no logger prefixes), and
// showSuccess := false drops the banner, so the bench's one JSON line
// is byte-identical to what Bench.scala printed and is the last line
// on stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command loop, not a task — exclude it
// from the unused-key lint so batch runs don't print a [warn] block.
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
  // 16g default: local[32] runs 32 concurrent tasks in one JVM; 8g left
  // heavy window/agg queries GC-bound at the tail of a full bench run
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
