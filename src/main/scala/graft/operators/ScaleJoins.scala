package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for 100 TB fact tables (SURVEY §1 scale posture).
  *
  * - Bucketed co-located joins: both sides pre-bucketed on the join
  *   key at write time → repeated joins pay ZERO shuffle (the scan is
  *   already hash-distributed). This is the backbone of a snapshot
  *   store that gets diffed every run: bucket by business key once,
  *   every incremental diff after that is shuffle-free.
  * - Salted joins: a skewed key (one customer with 10% of all rows)
  *   turns one reducer into the whole job's critical path. Salting
  *   splits each fact key across `salt` sub-keys and replicates the
  *   (small) other side per sub-key — trading `salt`× duplication of
  *   the small side for even fan-out of the big one. AQE's skew-join
  *   handles moderate skew automatically; salting is for the
  *   pathological tail.
  */
object ScaleJoins {

  /** Write `df` bucketed+sorted by `key` as a managed table — the
    * write-once cost that makes every later join on `key` shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Join two tables previously written with [[writeBucketed]] on the
    * same key and bucket count. The plan contains no Exchange. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-safe equi-join: `fact` (large, skewed) ⋈ `dim` (small).
    * Each fact row gets a deterministic salt derived from its full row
    * hash; `dim` is exploded `salt`× so every (key, salt) bucket finds
    * its dim rows. Result equals the plain join, with the skewed key's
    * work spread over `salt` reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val factSalted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salt)).cast("int"))
    val dimExploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    factSalted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }
}
