ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "blogsnapshotbackupazuredatalakespark"
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
// Forked `run` output must reach stdout RAW (no sbt "[info] " prefix):
// the driver parses graft.Bench's one-line JSON from stdout, and a
// logger prefix breaks that parse (round-1 BENCH had parsed:null).
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
// Default heap: SPARK_DRIVER_MEM if set, else half of physical RAM
// capped at 32 GiB (floor 2 GiB) — a fixed 32g would fail outright on
// smaller hosts than the benchmark machine.
val defaultHeapGb: Int = {
  val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
  val totalGb = osBean match {
    case b: com.sun.management.OperatingSystemMXBean =>
      (b.getTotalMemorySize / (1L << 30)).toInt
    case _ => 8
  }
  math.max(2, math.min(32, totalGb / 2))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // Whole-stage-codegen classes across the full query suite overflow
  // the default 240 MB JIT code cache; once it fills, HotSpot stops
  // compiling (or starts flushing hot methods back to interpreted —
  // bimodal 4-5× spikes on random queries). 512m sufficed at 66
  // queries; at 133 queries × warmup + 2 timed passes the flusher
  // kicked in again (q_json/q_corr read 6.6 s/4.6 s in one run and
  // 1.4 s in the next, same binary), so: 1g.
  "-XX:ReservedCodeCacheSize=1g",
)
