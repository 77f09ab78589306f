package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Fx._
import graft.operators.Dedup
import graft.sources.Tables

/** Local perf probe — times pipeline stages of the dedup path.
  * Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, d)
    time("docs.count")(docs.count())
    time("tokens only")(docs.select(tokens(col("text")).as("t")).count())
    time("shingles array")(docs.select(shingles(tokens(col("text")), 3).as("sh")).count())
    time("docShingles explode 1st")(Dedup.docShingles(docs, 3).count())
    time("docShingles explode 2nd")(Dedup.docShingles(docs, 3).count())
    // pre-materialized tokens through an explicit projection barrier
    val pre = docs.select(col("doc_id"), split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ").as("toks"))
    time("explode w/ materialized toks")(
      pre.select(col("doc_id"), explode(shingles(col("toks"), 3)).as("shingle")).count())
    val sh = Dedup.docShingles(docs, 3)
      .select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = Dedup.docShingles(docs, 3)
      .select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    time("shingle join")(sh.join(shB,
      col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b")).count())
    time("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, 3, 1, 2).count())
    Dedup.ngramJaccardPairs(docs, 3, 1, 2).explain("formatted")
    spark.stop()
  }
}
