ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "workshoop2etlspark"
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
// Forked `run` output passes through VERBATIM instead of being re-logged
// line-by-line with sbt's `[info]`/`[error]` prefixes: the bench driver
// parses the final stdout JSON line, and the prefix made it unparseable
// for five rounds (BENCH_r0{2..6} `parsed: null` — VERDICT r6 item 4).
// (plain `outputStrategy` so the setting reaches `runMain`'s forkOptions
// too, which does not delegate through `run /`.)
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default (r7 verdict item 5): the 8g default left 32-task
  // shuffles squeezed while the 128 GiB sandbox sat idle — the other
  // plausible contributor to the r7 driver run's staged-write
  // slowdowns. The bench JSON records the heap it actually ran with.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
