ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "a_hierarchical_feature_engineering_and_evaluation_framework_for_ecommerce_purchase_predictionspark"
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
// Forked run output must reach stdout UNPREFIXED: the driver parses the
// final JSON line of `sbt runMain graft.Bench`, and sbt's default logger
// wraps every line in "[info] " (round 1's BENCH json was unparseable).
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
  // 8g default (round-6): the round-5 24g default cost the flagship TPS
  // ~1.7x (judge A/B: 2.12M turns/s at 8g vs 1.22M at 24g, same code —
  // a bigger G1 young gen lengthens the allocation-heavy PIT pipeline's
  // pauses). The late-pass GC debt that motivated 24g was addressed
  // structurally instead: Bench resets ALL retained storage between reps
  // (round 5), so the 128-execution pass no longer accumulates cache
  // pressure. SPARK_DRIVER_MEM still overrides for ad-hoc runs.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // per-PID so concurrent forked JVMs (test + run) never clobber one log;
  // kept on permanently: GC evidence was needed twice to adjudicate bench
  // outliers (it exonerated GC and pointed at hypervisor CPU steal)
  "-Xlog:gc:file=/tmp/graft_gc_%p.log:time,uptime",
)
