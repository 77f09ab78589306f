package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` per query to <outDir>/<query><suffix>.txt —
  * the plan evidence OPTIMIZATION rounds commit under plans/rNN/.
  *
  * usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>")
      sys.exit(2)
    }
    val Array(d, outDir, suffix, names) = args.take(4)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // a query whose plan fails to build must not silently yield no
    // evidence file — track failures and exit non-zero so an
    // incomplete plans/rNN/ dir is loud
    val failed = names.split(",").filter { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$q$suffix.txt"), plan)
        System.err.println(s"[explain] $q ok")
        false
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $q FAILED: ${e.getMessage}")
        true
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[explain] ${failed.length} failed: ${failed.mkString(",")}")
      sys.exit(1)
    }
  }
}
