ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airbnbpysparkjobsspark"
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
// Forked `run` output must pass through UNPREFIXED: sbt's default logger
// decorates every forked-process line with "[info] ", which breaks the
// driver's line-oriented parse of Bench's one-line JSON metric (BENCH_r01
// and _r02 both show parsed:null with the JSON visible behind an "[info] "
// prefix in the captured tail).
outputStrategy := Some(StdoutOutput)
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
  // local[32] with wide aggregates + broadcast builds GC-thrashes at 8g
  // (bimodal 1s-vs-20s per-query timings); the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 137 benched queries x several whole-stage-codegen classes each overflow
  // the default ~240m code cache; eviction de-JITs hot generated loops and
  // single queries re-measure 3-6x slower late in a bench pass.
  "-XX:ReservedCodeCacheSize=512m",
)
