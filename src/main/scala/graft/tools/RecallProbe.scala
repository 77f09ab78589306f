package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Prints the RAW mean recall@k of each ANN family member against its
  * exact baseline at a given sf dir — the measurement behind the
  * pinned thresholds in the `ann_*_recall` correctness entries. Run it
  * before moving a threshold: `runMain graft.tools.RecallProbe <sfDir>`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.plantedQueries(emb, 50).localCheckpoint()
    val exactCos = Similarity.bruteForceTopK(q, emb, 1).localCheckpoint()
    val exactL2 = Similarity.bruteForceTopKL2(q, emb, 1).localCheckpoint()

    def rawRecall(approx: org.apache.spark.sql.DataFrame,
        exact: org.apache.spark.sql.DataFrame): Double = {
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .join(exact.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("__hits"))
      exact.groupBy("query_id").agg(count(lit(1)).as("__k"))
        .join(hits, Seq("query_id"), "left").na.fill(0L, Seq("__hits"))
        .agg(avg(col("__hits").cast("double") / col("__k"))).head().getDouble(0)
    }

    val lsh = Similarity.lshTopKFor(q, emb, 12, 5, probes = 4)
    println(f"[recall] lsh(12 planes, 4 probes)      vs cos: ${rawRecall(lsh, exactCos)}%.4f")

    val cents = Similarity.kmeansCentroids(emb, Similarity.autoCells(emb.count()), 2)
    val ivf = Similarity.ivfTopKProbed(q, emb, cents, k = 5, nprobe = 3)
    println(f"[recall] ivf(auto cells, nprobe=3)     vs cos: ${rawRecall(ivf, exactCos)}%.4f")

    val ivfpq = Similarity.ivfpqTopK(emb, q, nCells = 32, m = 8, ksub = 16,
      iters = 2, k = 5, nprobe = 4)
    println(f"[recall] ivfpq(32c, 8x16, nprobe=4)    vs L2:  ${rawRecall(ivfpq, exactL2)}%.4f")

    val (r, books) = Similarity.opqTrain(emb.filter(col("vec_id") % 4 === 0),
      8, 16, lloydIters = 2, opqIters = 2)
    val opq = Similarity.opqTopK(q, Similarity.opqEncode(emb, r, books), r, books, 5)
    println(f"[recall] opq(8x16, 2 iters)            vs L2:  ${rawRecall(opq, exactL2)}%.4f")
    spark.stop()
  }
}
