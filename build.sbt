ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "endtoenddataengineeringandmlsystemspark"
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
// The default `sbt test` EXCLUDES graft.Slow-tagged tests (multi-JVM
// crash sweeps, crash-at-every-promote-step fsck sweeps, fullIngest /
// CLI end-to-end chains: 20 s – 4 min apiece, ~30 min total) so the
// fast suite fits a CI/driver test budget. The slow set still runs
// with SPARK_GRAFT_SLOW_TESTS=1 sbt test (everything) or
// sbt "testOnly * -- -n graft.Slow" (only the slow set).
Test / testOptions ++= (
  if (sys.env.contains("SPARK_GRAFT_SLOW_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow")))
// TEST JVM ONLY (the last -Xmx wins): the long-match redelivery e2e
// OOMed at 12g when the 29 graft.Slow streaming/CLI e2es ran
// back-to-back in one JVM (round 19; same test was the 8g flake in
// round 18) — green at 16g. The run/bench JVM stays at the 12g the
// committed bench_reference.json was recorded under.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "16g")}"
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
  // 12g default: the full suite runs in ONE forked JVM and the heavier
  // streaming e2e tests sat within ~1 suite-growth of the old 8g
  // ceiling (observed as a flaky heap-space failure in the
  // long-match redelivery test only when the whole suite ran); the box
  // has 128 GiB, so headroom is free
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
