package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, and document fingerprinting.
  * All pure column expressions (codegen'd built-ins) — a single scan, no
  * shuffle, trivially 100 TB-scalable.
  */
object TextAnalysis {

  /** Whitespace token count (empty string ⇒ 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword piece count: collapse each maximal run of letters,
    * digits, or punctuation into one sentinel char and count them —
    * approximates tokenizer load (a word-piece per class run) without
    * shipping a vocab, using only RE2-safe regex (portable to DuckDB
    * oracles; lookbehind is not).
    */
  def subwordCount(text: Column): Column =
    length(regexp_replace(
      regexp_replace(text, "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+", "\u0001"),
      "\\s", ""))

  /** Quality heuristics: length, token count, mean word length,
    * punctuation ratio, stopword ratio — the usual Gopher/C4-style
    * filter features (cf. Rae et al. 2021, appendix A1).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChars = length(t)
    val nSpaces = nChars - length(regexp_replace(t, "\\s", ""))
    val nPunct = nChars - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    val stop = array("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
      .cast("array<string>")
    val stopRatio = when(nTok === 0, lit(0.0)).otherwise(
      size(filter(split(lower(trim(t)), "\\s+"), w => array_contains(stop, w)))
        .cast("double") / nTok)
    df.withColumn("n_tokens", nTok)
      .withColumn("n_chars_m", nChars)
      .withColumn("mean_word_len",
        when(nTok === 0, lit(0.0))
          .otherwise((nChars - nSpaces).cast("double") / nTok))
      .withColumn("punct_ratio",
        when(nChars === 0, lit(0.0)).otherwise(nPunct.cast("double") / nChars))
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score",
        when(nTok.between(5, 100000) && col("mean_word_len").between(2.0, 12.0), 1.0)
          .otherwise(0.0))
  }

  /** Marker words per language — shared single source of truth with the
    * native expression and the q18 oracle (see [[graft.functions.LangId]]).
    */
  private def langMarkers: Seq[(String, Seq[String])] =
    graft.functions.LangId.markers

  /** Language-ID: count marker-word hits per language over the lowercased
    * token bag; emit the argmax (ties → lexicographically LAST language,
    * via struct-max ordering — deterministic) or "unknown" when nothing
    * matches.
    */
  def languageId(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val scored = langMarkers.map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      struct(
        size(filter(tokens, w => array_contains(m, w))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown"))
  }

  /** Language-ID as a DataFrame stage. */
  def withLanguage(df: DataFrame, textCol: String, out: String = "lang_pred"): DataFrame =
    df.withColumn(out, languageId(col(textCol)))

  /** Content-defined 64-bit fingerprint: xxhash64 of the normalized text
    * (lowercased, whitespace-collapsed) — the cheap exact-dup key.
    * For locality-sensitive fingerprints use
    * [[Dedup.simHashFingerprints]].
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 128-bit digest as hex (portable across engines — md5). */
  def digestHex(text: Column): Column = md5(text)

  /** PII patterns — RE2-safe (no lookaround/backrefs) so the identical
    * pattern runs in the DuckDB oracle: emails and phone-shaped digit
    * groups.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "[0-9]{3}-[0-9]{2,}"

  /** Redact emails/phones with typed placeholders. One scan, two
    * codegen'd regex passes, no shuffle — trivially scan-parallel.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Count of matches of `pattern` in `text` (codegen'd builtin). */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Strided context-window chunks of `text` (token windows of `size`
    * every `stride` tokens — the "split long documents" step). Native
    * codegen'd pass; see [[graft.functions.WordChunks]].
    */
  def chunkWindows(text: Column, size: Int, stride: Int): Column =
    graft.internal.Cols.of(graft.functions.WordChunks(
      graft.internal.Cols.expressionOf(text), size, stride))
}
