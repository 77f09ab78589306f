package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Local perf probe — times named SparkEntry queries (twice each, to
  * separate JIT/IO warm-up from steady state) and optionally prints
  * the formatted plan. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.Probe <sfDir> <q1,q2,...> [explain]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val doExplain = args.lift(2).contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (cold, n) = once()
      val (warm, _) = once()
      println(f"[probe] $name%-24s cold=$cold%7.2f s  warm=$warm%7.2f s  rows=$n")
      if (doExplain) fn(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
