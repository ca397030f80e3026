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
    * when the document has fewer than `n` tokens. Native codegen'd
    * expression ([[graft.functions.WordNGrams]]) — the equivalent
    * higher-order-function chain runs interpreted and costs ~20× on
    * shingle-heavy scans.
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.internal.Cols.of(graft.functions.WordNGrams(
      graft.internal.Cols.expressionOf(text), n, distinct = true))

  /** All word n-grams in order, duplicates kept (repetition signals). */
  def wordNGramsAll(text: Column, n: Int): Column =
    graft.internal.Cols.of(graft.functions.WordNGrams(
      graft.internal.Cols.expressionOf(text), n, distinct = false))

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
    val bigrams = Spread.ensure(df.select(col(idCol), col(textCol)))
      .select(
        col(idCol),
        explode(wordNGramsAll(col(textCol), 2)).as("__bg"))
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
