package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` is the union of every operator module's entries; each key
  * with an `oracleSql` entry is hash-checked against DuckDB at sf0.01,
  * the rest get a rows-only check (minhash/simhash/LSH buckets, whose
  * hash families are Spark-internal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ Snapshot.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Events.queries ++
      Multimodal.queries ++ AsofJoin.queries ++ Pipeline.queries ++
      DataQuality.queries ++ RangeJoins.queries ++ Graph.queries)
      .map { case (name, fn) =>
        // install graft SQL functions + TopKPerKey rule/strategy into
        // whatever session the driver hands us (idempotent)
        name -> { (s: SparkSession, d: String) =>
          org.apache.spark.sql.graft.GraftExtensions.register(s)
          fn(s, d)
        }
      }

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Snapshot.oracles ++ Dedup.oracles ++
      TextAnalysis.oracles ++ TextAnalysis.oraclesIndexed ++
      Similarity.oracles ++ Events.oracles ++
      Multimodal.oracles ++ AsofJoin.oracles ++ Pipeline.oracles ++
      DataQuality.oracles ++ RangeJoins.oracles ++ Graph.oracles
}
