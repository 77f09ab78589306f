package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Persists the binary media table (`media.parquet`: doc_id, png, jpg,
  * wav, wav2 — every payload a pure function of doc_id through the
  * REAL JDK codecs) beside an sf dir's tables, so the mm_ queries scan
  * real binary-column parquet and measure the DECODE under test
  * instead of re-running the encoders in-query. The driver's
  * /root/testdata dirs are read-only — there [[Multimodal.mediaFor]]
  * synthesizes the identical bytes on the fly; run this against
  * writable dirs (the ScaleData sf1 output, which also calls it).
  *
  * Usage: runMain graft.tools.MediaGen <sfDir> */
object MediaGen {
  def writeMedia(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    Multimodal.synthesizeMedia(ids)
      .write.mode("overwrite").parquet(s"$dir/media.parquet")
    println(s"[media] $dir/media.parquet -> " +
      s"${spark.read.parquet(s"$dir/media.parquet").count()} rows")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeMedia(spark, args(0))
    spark.stop()
  }
}
