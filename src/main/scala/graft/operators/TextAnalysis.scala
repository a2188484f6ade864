package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: language ID, quality scoring, token counting,
  * document fingerprinting. All column-level (codegen'd built-ins or
  * native expressions) — embarrassingly parallel, no shuffle except the
  * final aggregation, so they scale linearly with executors at 100 TB.
  */
object TextAnalysis {

  import Tables._

  /** Heuristic stopword-overlap language ID; returns the predicted
    * language distribution (stable aggregate shape for the oracle). */
  def qLangId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(langId(col("text")).as("lang_pred"))
      .groupBy("lang_pred").agg(count("*").as("n"))

  /** Per-document token counts: whitespace tokens and BPE-ish subword
    * tokens, aggregated per source for a compact, oracle-checkable shape. */
  def qTokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"),
        tokenCount(col("text")).as("ws_tokens"),
        bpeishTokenCount(col("text")).as("bpe_tokens"))
      .groupBy("source")
      .agg(sum("ws_tokens").as("sum_ws_tokens"),
        sum("bpe_tokens").as("sum_bpe_tokens"),
        count("*").as("n_docs"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length, repetition (distinct-token ratio), and a composite
    * score. Returned per document (doc_id keyed) so the oracle checks
    * every row. */
  def qTextQuality(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      tokenCount(col("text")).as("n_tokens"),
      round(punctRatio(col("text")), 4).as("punct_ratio"),
      round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
      round(meanTokenLen(col("text")), 4).as("mean_token_len"),
      round(distinctTokenRatio(col("text")), 4).as("distinct_ratio"))

  /** Composite quality filter: keep documents that pass simple
    * training-data heuristics (long enough, not too repetitive, low
    * punctuation noise). */
  def qQualityFilter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(length(col("text")) >= 50 &&
        distinctTokenRatio(col("text")) >= 0.1 &&
        punctRatio(col("text")) <= 0.2)
      .agg(count("*").as("n_kept"), sum(tokenCount(col("text"))).as("sum_tokens"))

  /** Document fingerprinting via winnowing (native expression): number
    * of distinct fingerprint hashes per document — the bucket-joinable
    * containment-detection primitive. No SQL oracle (rolling hash is not
    * expressible in DuckDB); correctness is covered by FingerprintSpec. */
  def qFingerprint(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    documents(s, d)
      .select(col("doc_id"), winnowFingerprint(col("text"), 8, 4).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"))
  }
}
