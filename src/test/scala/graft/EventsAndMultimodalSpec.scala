package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Events, Multimodal}

class EventsAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("sessionize splits on gaps > threshold") {
    val df = Seq(
      (1L, ts(0), 10L), (2L, ts(10), 10L),   // session 1
      (3L, ts(60), 10L),                     // session 2 (50 min gap)
      (4L, ts(5), 20L)                       // other user
    ).toDF("event_id", "ts", "user_id")
    val out = Events.sessionize(df, 1800L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 2L)
    assert(out(4L) == 1L)
  }

  test("decodeImageMeta attaches deterministic metadata") {
    val df = Seq((1L, "imagebytes".getBytes), (2L, "other".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodeImageMeta(df, "id", "payload")
    assert(out.columns.toSet == Set("id", "payload", "width", "height", "channels", "format"))
    val meta = out.select("id", "width", "height", "channels", "format").collect()
    assert(meta.forall(_.getAs[Int]("width") >= 64))
    // determinism: same payload → same metadata (byte arrays excluded —
    // Array equality is referential and poisons Row/Set comparison)
    val again = Multimodal.decodeImageMeta(df, "id", "payload")
      .select("id", "width", "height", "channels", "format").collect()
    assert(meta.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("sampleFrames fans out strided fixed-size windows") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq((7L, payload)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", frameBytes = 10, stride = 2).collect()
    assert(frames.length == 5) // 10 windows, every 2nd
    assert(frames.forall(_.getAs[Long]("id") == 7L))
    assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq == Seq(0L, 2L, 4L, 6L, 8L))
  }
}
