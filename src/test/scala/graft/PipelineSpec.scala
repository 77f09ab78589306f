package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCorpus gates short and digit-heavy docs, dedups, and reports per lang") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again today"), // survivor
      (2L, "en", "The  quick brown fox jumps over the lazy dog again today"), // dup of 1
      (3L, "en", "too short"),                                               // gated: tokens
      (4L, "de", "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890"),       // gated: digits
      (5L, "de", "der hund und die katze spielen zusammen im garten heute abend") // survivor
    ).toDF("doc_id", "lang", "text")

    val report = Pipeline.corpusReport(Pipeline.cleanCorpus(docs, 10, 0.3))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(report("en") == ((1L, 1L, 11L))) // one survivor, one dup, 11 tokens
    assert(report("de") == ((1L, 0L, 11L))) // digit doc gated before dedup
    assert(report.size == 2)
  }

  test("survivor is the lowest doc_id of each content group") {
    val docs = Seq(
      (9L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (7L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "lang", "text")
    val kept = Pipeline.cleanCorpus(docs, 5, 1.0)
      .filter($"keep").select("doc_id").collect().map(_.getLong(0)).toList
    assert(kept == List(3L))
  }
}
