package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality filtering for LLM-training pipelines: per-document
  * rule signals in the style of the Gopher rules (Rae et al. 2021,
  * appendix A1) and C4 (Raffel et al. 2020), plus within-document
  * repetition signals (duplicate-n-gram fraction).
  *
  * Scale design (100 TB): every signal is a pure column expression over
  * one row (codegen'd built-ins — no UDFs, no shuffle); the rule filter
  * is applied at the scan, so Parquet sees the pushed-down predicate on
  * any materialized signal columns. Repetition needs one groupBy per
  * document (keys = doc ids, perfectly spreadable) and never holds more
  * than one document's n-gram counts per group.
  */
object QualityRules {

  /** Single-space tokenization, empty tokens dropped — the engine-portable
    * token bag (mirrors `string_split(text, ' ')` + non-empty filter in
    * the DuckDB oracles).
    */
  def spaceTokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Distinct word n-gram shingles joined by single spaces; empty array
    * when the document has fewer than `n` tokens.
    */
  def wordShingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n))))))

  /** Stopwords used for the presence signal (tiny on purpose — the
    * signal is "does the document contain ANY glue words", not a ratio).
    */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  /** Gopher-style rule signals appended as columns:
    * `n_words`, `mean_word_len` (non-space chars per word),
    * `stop_hits` (distinct stopwords present), `gopher_pass`.
    */
  def gopherSignals(
      df: DataFrame,
      textCol: String,
      minWords: Int = 20,
      maxWords: Int = 90,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 4.6): DataFrame = {
    val t = col(textCol)
    val toks = spaceTokens(t)
    val nWords = size(toks)
    val nChars = length(t)
    val nSpace = nChars - length(regexp_replace(t, "\\s", ""))
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise((nChars - nSpace).cast("double") / nWords)
    val stopHits = size(array_intersect(
      array_distinct(toks), array(stopwords.map(lit): _*)))
    df.withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len", meanLen)
      .withColumn("stop_hits", stopHits.cast("long"))
      .withColumn(
        "gopher_pass",
        nWords.between(minWords, maxWords) &&
          meanLen.between(minMeanWordLen, maxMeanWordLen) &&
          stopHits >= 1)
  }

  /** Within-document repetition: the duplicate-bigram signal. For each
    * document, the count of its most frequent word bigram, the total
    * bigram count, and their ratio — the standard "top n-gram fraction"
    * repetition rule. Documents with fewer than 2 tokens drop out.
    */
  def duplicateBigramFraction(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = spaceTokens(col(textCol))
    val bigrams = df
      .select(col(idCol), toks.as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(
        col(idCol),
        explode(transform(
          sequence(lit(1), size(col("__tk")) - 1),
          i => concat_ws(" ", slice(col("__tk"), i, lit(2))))).as("__bg"))
    bigrams
      .groupBy(col(idCol), col("__bg"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(
        max(col("__n")).as("top_bigram_n"),
        sum(col("__n")).as("n_bigrams"))
      .withColumn(
        "dup_bigram_frac",
        col("top_bigram_n").cast("double") / col("n_bigrams"))
  }
}
