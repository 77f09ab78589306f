package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Before/after probe for the ev_sliding decomposition (round 10):
  * times the OLD per-type RANGE window (partitionBy event_type — the
  * corpus sort at |types|-way parallelism the r9 verdict flagged)
  * against the SHIPPED (type, day) overlap decomposition on the same
  * data, and asserts their outputs hash-identical. Usage:
  *   runMain graft.tools.SlidingProbe <sfDir>
  */
object SlidingProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def decV(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

    def old(): org.apache.spark.sql.DataFrame = {
      val win = Window.partitionBy("event_type").orderBy("t")
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(spark, d)
        .withColumn("t", unix_micros(col("ts")))
        .withColumn("n_1h", count(lit(1)).over(win))
        .withColumn("sum_1h", round(sum(decV(col("value"))).over(win).cast(DoubleType), 4))
        .select("event_id", "event_type", "t", "n_1h", "sum_1h")
    }
    def decomposed(): org.apache.spark.sql.DataFrame =
      graft.operators.Events.queries("ev_sliding")(spark, d)

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag $s%.2f s")
      s
    }
    // warm both once, then time
    time("old(warm)", old); time("new(warm)", decomposed)
    val a = time("old", old)
    val b = time("new", decomposed)
    println(f"[probe] speedup ${a / b}%.1fx")
    val ha = old().select(xxhash64(col("event_id"), col("n_1h"), col("sum_1h")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    val hb = decomposed().select(xxhash64(col("event_id"), col("n_1h"), col("sum_1h")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    println(s"[probe] hash old=$ha new=$hb identical=${ha == hb}")
    spark.stop()
  }
}
