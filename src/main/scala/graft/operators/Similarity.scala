package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Fx._
import graft.sources.Tables

/** Similarity search over embedding columns (SURVEY §2 group 4).
  *
  * `bruteForceTopK` is the exact baseline: query-set × corpus with
  * codegen'd higher-order-function dot products. At 100 TB the corpus
  * side stays partitioned and the (small) query set is broadcast — the
  * product is embarrassingly parallel and never shuffles the corpus.
  *
  * `lshTopK` is the scale path: random-hyperplane signatures bucket
  * the corpus (one narrow projection), candidates meet through an
  * equi-join on bucket key, and only candidates pay the exact-distance
  * cost. Hyperplanes are derived from a seeded hash of (plane, dim) —
  * deterministic, no driver-side random state to ship.
  */
object Similarity {

  /** Corpus with precomputed L2 norm (computed once, reused per pair). */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("norm", l2norm(col("embedding")))

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val c = withNorm(corpus).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val pairs = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Random-hyperplane LSH signature: bit p = sign of a pseudo-random
    * projection where plane p's weight on dimension i is a
    * deterministic ±1 from a murmur mix of (p, i).
    *
    * Typed map, not `planes`× interpreted `zip_with`+`aggregate`
    * passes: higher-order functions have no codegen, so the
    * declarative version re-walks the array `planes` times per row
    * through interpreted lambdas. One JVM pass computes all planes. */
  def lshSignature(emb: DataFrame, planes: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // only (vec_id, embedding) survive — extra columns are dropped
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        var bits = 0L
        var p = 0
        while (p < planes) {
          var s = 0.0
          var i = 0
          while (i < e.length) {
            val h = scala.util.hashing.MurmurHash3.productHash((p, i))
            s += (if ((h & 1) == 1) e(i).toDouble else -e(i).toDouble)
            i += 1
          }
          if (s > 0) bits |= 1L << p
          p += 1
        }
        (id, e, bits)
      }
      .toDF("vec_id", "embedding", "bucket")
  }

  /** ANN via LSH buckets: exact cosine only within matching buckets. */
  def lshTopK(emb: DataFrame, planes: Int, k: Int): DataFrame = {
    // Two independently-built sides (disjoint names): a same-lineage
    // self-join degrades to a nested-loop — see Dedup.ngramJaccardPairs.
    def side(q: String, n: String, b: String): DataFrame =
      withNorm(lshSignature(emb, planes))
        .select(col("vec_id").as(q), col("embedding").as(n), col("norm").as(s"${n}_norm"), col("bucket").as(b))
    val a = side("query_id", "q_emb", "bucket_a")
    val b = side("neighbor_id", "c_emb", "bucket_b")
    val pairs = a.join(b,
        col("bucket_a") === col("bucket_b") && col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")), 4).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType)).filter(col("rk") <= k)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the first
    * `nCells` vectors act as seed centroids — a production build would
    * k-means them) assigns every vector to its nearest cell; search is
    * exact cosine within the query's cell only. One broadcast of the
    * tiny centroid set for assignment, one equi-join on cell id for
    * search — the corpus is never cross-joined. */
  def ivfTopK(emb: DataFrame, nCells: Int, k: Int): DataFrame = {
    def assigned(idCol: String, embCol: String): DataFrame = {
      val cents = emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      val scored = emb.select(col("vec_id").as(idCol), col("embedding").as(embCol))
        .join(broadcast(cents), lit(true))
        .withColumn("cent_cos", cosine(col(embCol), col("cent_emb")))
      val w = Window.partitionBy(idCol).orderBy(col("cent_cos").desc, col("cent_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col(idCol), col(embCol), col("cent_id").as(s"${idCol}_cell"))
    }
    val a = assigned("query_id", "q_emb").withColumn("q_norm", l2norm(col("q_emb")))
    val b = assigned("neighbor_id", "c_emb").withColumn("c_norm", l2norm(col("c_emb")))
    val pairs = a.join(b,
        col("query_id_cell") === col("neighbor_id_cell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 4).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType)).filter(col("rk") <= k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      bruteForceTopK(emb.filter(col("vec_id") < 50), emb, 5)
        .orderBy("query_id", "rk")
    },

    "ann_lsh" -> { (s, d) =>
      // Rows-only oracle: bucket membership depends on Spark murmur3.
      lshTopK(Tables.embeddings(s, d), 12, 5).orderBy("query_id", "rk")
    },

    "ann_ivf" -> { (s, d) =>
      // Rows-only oracle (cell assignment is an internal artifact).
      ivfTopK(Tables.embeddings(s, d), 16, 5).orderBy("query_id", "rk")
    }
  )

  val oracles: Map[String, String] = Map(
    "ann_cosine_topk" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    ROUND(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT query_id, neighbor_id, cos, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM pairs) t
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  )
}
