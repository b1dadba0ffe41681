ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "climatedatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
scalacOptions ++= Seq("-deprecation", "-unchecked", "-Wunused:imports")
Test / fork := true
run / fork := true
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
  // 24g: at 8g the bench suite's cross-query System.gc() hygiene calls
  // compact a nearly full old gen (62 Full GCs, worst 1.05s, compounding
  // across 35 queries — see SCALE.md "Bench tail diagnosis"; the multi-
  // second tails themselves are host CPU steal, not GC). The box has
  // 125 GiB; 24g keeps compressed oops and makes the hygiene GCs cheap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 512m code cache (default 240m): the bench suite's ~1000 query
  // executions generate thousands of codegen classes; a saturated
  // segmented CodeCache silently disables JIT compilation and newly
  // generated operators run interpreted (~20x) — r13's upscale-probe
  // tail anomalies motivated instrumenting this (Bench records
  // per-iteration code-cache occupancy), and headroom removes the
  // failure class outright
  "-XX:ReservedCodeCacheSize=512m",
  // SPARK_GRAFT_JAVA_OPTS: extra flags for forked run/test JVMs
  // (e.g. "-Xlog:gc*,safepoint:file=gc.log" when diagnosing latency tails)
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
