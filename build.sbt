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
// Heap: 16g default (r7 verdict item 5: the 8g default squeezed 32-task
// shuffles while the 128 GiB sandbox sat idle), CLAMPED to the 16g the
// BASELINE.md pins were measured at (r8 verdict item 2): the r8 driver
// ran at 89g and a controlled A/B showed that alone drags the
// staged-write family 1.2-1.7× (pipeline_clean 2.48→4.19 s) — a silent
// config divergence eating the 2× gate's headroom. A larger
// SPARK_DRIVER_MEM now clamps down to the pin heap; SPARK_GRAFT_HEAP
// overrides explicitly (and whoever sets it owns re-pinning at it). The
// bench JSON records the heap it actually ran with (host.heap_gb).
val pinHeap = "16g"
val forkHeap: String = {
  // Strict ^[0-9]+[gmk]?$ (after trim/lowercase, ≤12 digits): anything
  // else — "16gb", "1t", empty — used to be guessed at via a GiB
  // catch-all, and a suffix-less raw-byte string passed through to
  // -Xmx verbatim, so a malformed SPARK_DRIVER_MEM could fail JVM
  // startup instead of falling back to the pin heap (ADVICE r9). Now a
  // value that doesn't parse falls back to pinHeap with a log line.
  val HeapPat = "^([0-9]{1,12})([gmk]?)$".r
  def mib(s: String): Option[Long] = s.trim.toLowerCase match {
    case HeapPat(n, u) =>
      val v = n.toLong
      Some(u match {
        case "g" => v * 1024
        case "m" => v
        case "k" => math.max(1L, v / 1024)
        case _   => math.max(1L, v / (1024 * 1024)) // suffix-less = raw bytes (JVM -Xmx semantics)
      })
    case _ => None
  }
  val pinMib = mib(pinHeap).get
  // SPARK_GRAFT_HEAP is the explicit override (exempt from the pin
  // clamp — whoever sets it owns re-pinning at it) but it gets the SAME
  // parse/floor validation as SPARK_DRIVER_MEM (ADVICE r10): a
  // malformed value flowing verbatim to -Xmx reproduces the exact
  // JVM-startup failure the validation exists to close.
  sys.env.get("SPARK_GRAFT_HEAP").map { h =>
    mib(h).filter(_ >= 512) match {
      case Some(_) => h.trim.toLowerCase
      case None =>
        println(s"[build] malformed or sub-512MiB SPARK_GRAFT_HEAP '$h' — falling back to pin heap $pinHeap")
        pinHeap
    }
  }.getOrElse {
    sys.env.get("SPARK_DRIVER_MEM") match {
      case None => pinHeap
      // < 512 MiB can't run a 32-thread Spark driver — '0g', '512k', or
      // a raw-byte '16' is a typo for a real heap, and passing it to
      // -Xmx fails JVM startup (the other malformed-value failure mode).
      case Some(req) => mib(req).filter(_ >= 512) match {
        case Some(m) => if (m > pinMib) pinHeap else req.trim.toLowerCase
        case None =>
          println(s"[build] malformed or sub-512MiB SPARK_DRIVER_MEM '$req' — falling back to pin heap $pinHeap")
          pinHeap
      }
    }
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkHeap",
)
