package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the snapshot-diff accelerant.
  *
  * Incremental backup at 100 TB joins a huge base snapshot against a
  * small delta (restore, changed-row lookback, CDC merge). A plain
  * join shuffles the ENTIRE base on the key; with a Bloom filter of
  * the delta's keys applied at the base scan, only rows that might
  * match ever enter the shuffle — the exchange shrinks from |base| to
  * ~|matches| + fpp·|base|.
  *
  * This is the same mechanism as Spark's own runtime-filter injection
  * (`InjectRuntimeFilter`), exposed as an explicit operator so it also
  * fires where the optimizer's heuristics do not (semi-joins built
  * from `queries()` lambdas, pre-shuffle pruning ahead of a
  * `SnapshotStore.diff`), with the filter size under caller control.
  *
  * The filter is BUILT distributed (partial Bloom filters per
  * partition, OR-merged), collected once to the driver (~`numBits/8`
  * bytes), and re-embedded as a literal so `might_contain` runs inside
  * whole-stage codegen on the probe side. Building is an eager action
  * on `small`.
  *
  * Bloom membership is approximate (false positives only), so `prune`
  * must be followed by the exact join it accelerates — results are
  * then identical to the unpruned plan, which is how the spec and the
  * `snap_bloom_prune` oracle check it.
  */
object BloomPrune {

  /** `large` filtered to rows whose `largeKey` might appear in
    * `small`'s `smallKey` set (no false negatives). */
  def prune(
      large: DataFrame,
      largeKey: Column,
      small: DataFrame,
      smallKey: Column,
      expectedItems: Long = 4L * 1000 * 1000,
      fpp: Double = 0.03): DataFrame = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(smallKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = small.select(ExpressionUtils.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bytes == null) {
      // empty build side: nothing can match
      large.filter(org.apache.spark.sql.functions.lit(false))
    } else {
      large.filter(ExpressionUtils.column(BloomFilterMightContain(
        Literal(bytes, BinaryType),
        new XxHash64(Seq(ExpressionUtils.expression(largeKey))))))
    }
  }
}
