package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Dedup
import graft.streaming.StreamOps
import graft.streaming.StreamOps.StreamDoc

class StreamingMinhashSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textB = "completely unrelated content about spark catalyst optimizer internals"

  test("minhashBandKeys is bit-exact with the batch lshBuckets path") {
    import spark.implicits._
    val docs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val batch = Dedup.lshCandidates _ // touch to keep import meaningful
    val buckets = Dedup.lshBuckets(Dedup.minhashSignatures(docs, 3, 32), 8, 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val local = Seq((1L, textA), (2L, textB)).flatMap { case (id, t) =>
      Dedup.minhashBandKeys(t, 3, 32, 8).map { case (b, h) => (id, b, h) }
    }.toSet
    assert(local == buckets)
    assert(batch != null)
  }

  test("streaming near-dup is flagged against an earlier batch's doc") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[StreamDoc]
    val verdicts = StreamOps.minhashDedup(input.toDS())
    val query = verdicts.writeStream
      .format("memory").queryName("graft_mh_verdicts").outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamDoc(1L, ts(0), textA))
      query.processAllAvailable()
      // batch 2: an exact near-dup of doc 1, plus an unrelated doc
      input.addData(StreamDoc(2L, ts(5), textA), StreamDoc(3L, ts(5), textB))
      query.processAllAvailable()
      val byDoc = StreamOps.collapseVerdicts(spark.table("graft_mh_verdicts"))
        .collect().map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Boolean]("is_dup"), Option(r.getAs[Any]("dup_of"))))).toMap
      assert(byDoc(1L) == ((false, None)))
      assert(byDoc(2L)._1 && byDoc(2L)._2.contains(1L))
      assert(byDoc(3L) == ((false, None)))
    } finally query.stop()
  }

  test("hyperplaneBandKeys is bit-exact with the batch embBandKeys path") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(3)
    val emb = (0L until 20L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val batch = Dedup.embBandKeys(emb.toDF("vec_id", "embedding"), 16, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val local = emb.flatMap { case (id, e) =>
      Similarity.hyperplaneBandKeys(e, 16, 4).map { case (b, h) => (id, b, h) }
    }.toSet
    assert(local == batch && local.size == 20 * 4)
  }

  test("streaming embedding near-dup is flagged against an earlier batch's vector") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.StreamVec

    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val nearDup = base.map(x => x * 1.01f)
    val unrelated = Array.fill(16)(rnd.nextFloat() - 0.5f)

    val input = MemoryStream[StreamVec]
    val verdicts = StreamOps.embDedup(input.toDS())
    val query = verdicts.writeStream
      .format("memory").queryName("graft_emb_verdicts").outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamVec(1L, ts(0), base))
      query.processAllAvailable()
      input.addData(StreamVec(2L, ts(5), nearDup), StreamVec(3L, ts(5), unrelated))
      query.processAllAvailable()
      val byVec = StreamOps.collapseVerdicts(spark.table("graft_emb_verdicts"), "vec_id")
        .collect().map(r => (r.getAs[Long]("vec_id"),
          (r.getAs[Boolean]("is_dup"), Option(r.getAs[Any]("dup_of"))))).toMap
      assert(byVec(1L) == ((false, None)))
      assert(byVec(2L)._1 && byVec(2L)._2.contains(1L))
      assert(byVec(3L) == ((false, None)))
    } finally query.stop()
  }

  test("within one batch the earliest doc owns the bucket") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[StreamDoc]
    val verdicts = StreamOps.minhashDedup(input.toDS())
    val query = verdicts.writeStream
      .format("memory").queryName("graft_mh_same_batch").outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamDoc(7L, ts(1), textA), StreamDoc(8L, ts(2), textA))
      query.processAllAvailable()
      val byDoc = StreamOps.collapseVerdicts(spark.table("graft_mh_same_batch"))
        .collect().map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Boolean]("is_dup"), Option(r.getAs[Any]("dup_of"))))).toMap
      assert(byDoc(7L) == ((false, None)))
      assert(byDoc(8L)._1 && byDoc(8L)._2.contains(7L))
    } finally query.stop()
  }
}
