package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Drives the streaming operators end-to-end against a live
  * MicroBatchExecution (memory source → graft ops → memory sink) and
  * prints what each query emits. Local evidence surface, not part of
  * the driver contract. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

    val input = MemoryStream[Event]
    val q = StreamOps.sessionize(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      Event(1L, ts(0), 10L, "click", 1.0),
      Event(2L, ts(10), 10L, "view", 2.0),
      Event(3L, ts(12), 20L, "click", 7.0))
    q.processAllAvailable()
    input.addData(Event(4L, ts(120), 10L, "click", 5.0), Event(5L, ts(121), 20L, "view", 1.0))
    q.processAllAvailable()
    println("[demo] closed sessions after 2 batches:")
    spark.sql("SELECT * FROM sessions ORDER BY user_id").show(truncate = false)

    val snapIn = MemoryStream[(Long, Timestamp, String)]
    val q2 = StreamOps.incrementalSnapshot(snapIn.toDF().toDF("k", "ts", "v"), "k", "ts")
      .writeStream.format("memory").queryName("snap")
      .outputMode(OutputMode.Append()).start()
    snapIn.addData((1L, ts(0), "a"), (1L, ts(0), "a-dup"), (2L, ts(1), "b"))
    q2.processAllAvailable()
    println("[demo] deduped snapshot rows:")
    spark.sql("SELECT * FROM snap ORDER BY k").show(truncate = false)

    val tumbleIn = MemoryStream[Event]
    val q3 = StreamOps.tumblingCounts(tumbleIn.toDF(), "1 hour")
      .writeStream.format("memory").queryName("tumble")
      .outputMode(OutputMode.Update()).start()
    tumbleIn.addData(Event(1L, ts(0), 1L, "click", 1.0), Event(2L, ts(30), 1L, "click", 2.0),
      Event(3L, ts(70), 2L, "view", 3.0))
    q3.processAllAvailable()
    println("[demo] tumbling counts:")
    spark.sql("SELECT * FROM tumble ORDER BY event_type").show(truncate = false)

    q.stop(); q2.stop(); q3.stop()
    spark.stop()
  }
}
