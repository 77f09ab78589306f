package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Fx._
import graft.sources.Tables

/** End-to-end corpus-cleaning pipeline — the composition a training-
  * data preparation run actually executes over a raw crawl: quality
  * gate → exact dedup → per-language corpus accounting. The point of
  * the operator (vs calling the stages separately) is the PLAN SHAPE:
  * every gate signal is computed in ONE narrow projection (no
  * self-joins of derived frames back onto the corpus — each would be
  * a shuffle at 100 TB), and the only wide operation in the whole
  * pipeline is the dedup hash partition, reused by the min-over-window
  * survivor pick without a second exchange.
  */
object Pipeline {

  /** Gate + dedup + survivor marking, one row per gated doc:
    * `keep` marks the canonical survivor (lowest doc_id) of each
    * normalized-content group. */
  def cleanCorpus(docs: DataFrame, minTokens: Int, maxDigitRatio: Double): DataFrame = {
    val nChars = length(col("text"))
    val nDigit = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val gated = docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
      .withColumn("digit_ratio", round(nDigit.cast(DoubleType) / nChars, 4))
      .filter(col("n_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio)
      .withColumn("text_hash", md5(normText(col("text"))))
    // survivor = lowest doc_id in the content group; min-over-window
    // needs no ordered sort buffer (running min), one shuffle total
    val keepId = min(col("doc_id")).over(Window.partitionBy("text_hash"))
    gated.withColumn("keep", col("doc_id") === keepId)
  }

  /** Per-language corpus accounting after [[cleanCorpus]]: surviving
    * docs, removed duplicates, total surviving tokens. */
  def corpusReport(cleaned: DataFrame): DataFrame =
    cleaned.groupBy("lang")
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dups"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("n_tokens"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_clean" -> { (s, d) =>
      corpusReport(cleanCorpus(Tables.documents(s, d), 10, 0.3)).orderBy("lang")
    }
  )

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  val oracles: Map[String, String] = Map(
    "pipe_clean" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |marked AS (
         |  SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep
         |  FROM gated)
         |SELECT lang,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,
         |  CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens
         |FROM marked GROUP BY lang ORDER BY lang""".stripMargin
  )
}
