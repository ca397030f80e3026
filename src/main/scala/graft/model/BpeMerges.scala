package graft.model

/** Frozen BPE tokenizer — the [[IvfCentroids]] freeze discipline applied
  * to [[graft.operators.Bpe]]: the iterative merge TRAINING (not
  * SQL-replayable — each iteration's argmax depends on the previous
  * merge) runs ONCE offline in [[BpeMergesTrainer]]; the merge table
  * freezes as a committed CSV resource; the consuming encode queries
  * apply it as plan literals and are hash-checked against a DuckDB
  * replay that re-applies the SAME frozen table (one source of truth —
  * this object — interpolated into both engines, the
  * `MinHashSig.saltsFor` pattern).
  *
  * Unlike the per-scale blocking codebooks there is ONE table, not one
  * per corpus generation: a tokenizer is a production artifact trained
  * once and applied to every corpus thereafter (GPT-2's BPE outlived
  * its training set by years) — re-training per corpus would change
  * every token id downstream. Coverage, not correctness, is what a
  * corpus shift moves: unseen CHARACTERS encode as id −1
  * (see [[idOf]]), unseen character SEQUENCES simply merge less.
  *
  * Vocabulary ids, deterministic by construction:
  *   - 0                : the `</w>` end-of-word marker
  *   - 1 .. 66          : the fixed base alphabet 0–9, A–Z, a–z, ß é ö ü
  *                        (code-point order) — fixed rather than
  *                        corpus-observed so the id space never depends
  *                        on which corpus trained the table
  *   - 67 .. 322        : the 256 byte-fallback tokens `<0x00>`–`<0xFF>`
  *                        (GPT-2/SentencePiece byte_fallback): a
  *                        character OUTSIDE the base alphabet decomposes
  *                        into its UTF-8 bytes, one token each — so the
  *                        tokenizer has NO out-of-vocabulary input and
  *                        `decode(encode(x))` is lossless on ANY text
  *                        (r13 verdict #4; before this block, unseen
  *                        characters encoded as id −1 and decoded as `?`)
  *   - 323 + i          : merge i's output token, in training order
  *                        (two merges CAN produce the same string, e.g.
  *                        a+bc and ab+c; the string keeps its FIRST id)
  *
  * Provenance: trained on the union of /root/testdata/sf0.01 documents
  * (500 docs, 31-word vocabulary) and [[BpeMergesTrainer.syntheticVocab]]
  * — a deterministic mixed-alphabet word-frequency table (~25k distinct
  * words: lowercase/Capitalized/CamelCase morphology, digit-bearing
  * identifiers, BMP accents) sized so the table sustains a
  * production-shaped merge count (the r12 fixture was 96 [a-z]-corpus
  * merges — machinery advertised for tens of thousands of rules but
  * never exercised past 96). minFreq 2 — see [[BpeMergesTrainer]].
  */
object BpeMerges {

  val endWord = "</w>"

  /** Fixed base alphabet (code-point order: digits < uppercase <
    * lowercase < the BMP accent set).
    */
  val baseAlphabet: Seq[String] =
    (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z')).map(_.toString) ++
      Seq("ß", "é", "ö", "ü") // ß é ö ü

  /** [[baseAlphabet]] as a char set — the byte-fallback gate: characters
    * in it are their own symbol, everything else decomposes to UTF-8
    * byte tokens.
    */
  val alphabetSet: Set[Char] = baseAlphabet.map(_.charAt(0)).toSet

  /** The 256 byte-fallback tokens, `<0x00>` … `<0xFF>` (uppercase hex —
    * matching both Spark's and DuckDB's `hex()` rendering, so the two
    * engines spell the identical token).
    */
  val byteTokens: Seq[String] = (0 until 256).map(byteToken)

  def byteToken(b: Int): String = f"<0x$b%02X>"

  /** The frozen merge rules, training order, from the committed CSV. */
  lazy val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.csv")
    require(in != null, "missing fixture /graft/bpe_merges.csv — run " +
      "sbt \"runMain graft.model.BpeMergesTrainer\"")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val Array(l, r) = line.split(",", 2)
      (l, r)
    }.toSeq
    finally src.close()
  }

  /** token → id (first writer wins on duplicate merge strings). */
  lazy val idOf: Map[String, Int] = {
    val base = (endWord -> 0) +:
      baseAlphabet.zipWithIndex.map { case (c, i) => c -> (i + 1) }
    val bytes = byteTokens.zipWithIndex
      .map { case (t, i) => t -> (baseAlphabet.size + 1 + i) }
    val mergeBase = baseAlphabet.size + 1 + byteTokens.size // 323
    val merged = merges.zipWithIndex
      .map { case ((l, r), i) => (l + r) -> (mergeBase + i) }
    (base ++ bytes ++ merged).foldLeft(Map.empty[String, Int]) {
      case (m, (t, id)) => if (m.contains(t)) m else m + (t -> id)
    }
  }
}
