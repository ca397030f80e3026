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
    // tokenize/regex per row is the cost — spread a small single-block
    // scan across cores first (no-op on a many-block production input)
    val src = Spread.ensure(df)
    val t = col(textCol)
    val toks = spaceTokens(t)
    val nWords = size(toks)
    val nChars = length(t)
    // explicit class, not \s: Java's \s includes vertical tab, RE2's
    // (DuckDB) does not — the explicit class is engine-independent
    val nSpace = nChars - length(regexp_replace(t, "[ \\t\\n\\f\\r]", ""))
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise((nChars - nSpace).cast("double") / nWords)
    val stopHits = size(array_intersect(
      array_distinct(toks), array(stopwords.map(lit): _*)))
    src.withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len", meanLen)
      .withColumn("stop_hits", stopHits.cast("long"))
      .withColumn(
        "gopher_pass",
        nWords.between(minWords, maxWords) &&
          meanLen.between(minMeanWordLen, maxMeanWordLen) &&
          stopHits >= 1)
  }

  /** Statistical quality score: mean add-one-smoothed bigram
    * log-probability of each document under the corpus's own bigram
    * language model — the KenLM-style "perplexity filter" of training
    * pipelines (score low ⇒ text is unlike the corpus: boilerplate,
    * gibberish, wrong language), self-trained so no external model is
    * needed. score = mean over bigrams (w1,w2) of
    * ln((c(w1 w2) + 1) / (c(w1) + V)), V = distinct unigram count.
    *
    * Scale design: two count tables (unigram, bigram) built map-side
    * combinable from one exploded scan each; scoring joins the
    * document's bigrams to the two tables on their keys (hash joins on
    * count tables ~vocabulary-sized, far smaller than the corpus) and
    * one per-doc average. Documents with fewer than 2 tokens drop.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val src = Spread.ensure(df.select(col(idCol), col(textCol)))
    // Count tables and the scoring join run on 64-bit token hashes, not
    // strings: after the explode, nothing string-typed ever shuffles
    // (same reasoning as the q58 similarity join — collisions ~2e-9 at
    // 1e5 distinct tokens, and the oracle agrees because counts, not
    // token identities, reach the output).
    // checkpoint BEFORE the count: V is read off the materialized table,
    // not by re-running the corpus scan + shuffle agg a second time
    val uni = src
      .select(explode(wordNGramsAll(col(textCol), 1)).as("__w1"))
      .select(xxhash64(col("__w1")).as("__w1h"))
      .groupBy("__w1h").agg(count(lit(1)).as("__cu"))
      .localCheckpoint(true)
    val vocab = uni.count()
    // one shingle pass serves both the bigram count table and the
    // scoring join (localCheckpoint: materialized once, lineage cut)
    val bgr = src
      .select(col(idCol), explode(wordNGramsAll(col(textCol), 2)).as("__bg"))
      .select(
        col(idCol),
        xxhash64(col("__bg")).as("__bgh"),
        xxhash64(substring_index(col("__bg"), " ", 1)).as("__w1h"))
      .localCheckpoint(true)
    val bi = bgr.groupBy("__bgh").agg(count(lit(1)).as("__cb"))
    bgr
      .join(bi, "__bgh")
      .join(uni, "__w1h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(log((col("__cb") + 1).cast("double") / (col("__cu") + vocab)))
          .as("lm_logprob"))
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
      // 64-bit hash key: only counts reach the output, so the bigram
      // string itself never needs to shuffle (cf. bigramLmScore)
      .select(col(idCol), xxhash64(col("__bg")).as("__bgh"))
    bigrams
      .groupBy(col(idCol), col("__bgh"))
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
