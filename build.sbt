ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "api_weather_kafka_clickhousespark"
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
// Forked run/runMain stdout passes through RAW: sbt's default strategy
// routes it through the logger, prefixing every line with "[info] " —
// which defeats any machine parse of graft.Bench's single JSON line
// (every BENCH_r1–r10 driver artifact has parsed:null from exactly this).
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default (was 8g): the measured sweet spot for the full-suite
  // bench — 97.6 s warm at 16g vs 102+ at 32g and a warm-pass collapse
  // at 8g once the suite hit 129 queries × cold+warm in one JVM
  // (BASELINE.md bench-hygiene notes). Oversized G1 heaps measurably
  // slow the shuffle-heavy dedup family — do not raise past 16g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
