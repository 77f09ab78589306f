package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private def large = (1L to 10000L).map(i => (i, s"row$i")).toDF("k", "payload")
  private def small = Seq(3L, 500L, 9999L).toDF("dk")

  test("prune keeps every actually-matching row (no false negatives)") {
    val pruned = BloomPrune.prune(large, col("k"), small, col("dk"),
      expectedItems = 1000, fpp = 0.01)
    val exact = pruned.join(small, col("k") === col("dk"), "left_semi")
      .select("k").as[Long].collect().toSet
    assert(exact == Set(3L, 500L, 9999L))
  }

  test("prune + exact join equals the unpruned join") {
    val viaBloom = BloomPrune.prune(large, col("k"), small, col("dk"))
      .join(small, col("k") === col("dk"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    val plain = large.join(small, col("k") === col("dk"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    assert(viaBloom == plain)
  }

  test("prune actually reduces the probe side") {
    val n = BloomPrune.prune(large, col("k"), small, col("dk"),
      expectedItems = 1000, fpp = 0.01).count()
    // 3 true matches + fpp·10000 ≈ 103 expected; anything well under
    // the full 10000 proves the scan-side filter fires
    assert(n >= 3 && n < 1000, s"pruned count $n")
  }

  test("empty build side prunes everything") {
    val pruned = BloomPrune.prune(large, col("k"), small.filter(col("dk") < 0), col("dk"))
    assert(pruned.count() == 0)
  }
}
