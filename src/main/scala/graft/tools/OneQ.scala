package graft.tools
import org.apache.spark.sql.SparkSession
/** Time single queries: runMain graft.tools.OneQ <sfDir> <q1,q2,...> [passes] */
object OneQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    args(1).split(",").foreach { q =>
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, args(0))
          .write.format("noop").mode("overwrite").save()
        println(f"[oneq] $q pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
