package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016), the way
  * it actually scales: every iteration runs on the WORD-FREQUENCY table,
  * not the corpus. Zipf's law makes that table vocabulary-sized — a
  * 100 TB corpus compresses to a few million (word, freq) rows in one
  * combinable aggregation, after which each merge iteration is one tiny
  * pair-count aggregation plus one map over the vocab frame.
  *
  * The only driver-side data is ONE row per iteration (the argmax pair) —
  * the same bounded-by-construction pattern as the IVF quantizer sample.
  * The merge application itself is a pure Catalyst `aggregate` HOF fold:
  * no UDF, no collect of the vocabulary.
  *
  * Matches the reference algorithm exactly: merges apply left-to-right,
  * non-overlapping (after `a b → ab` in `a b b`, the remaining `b` does
  * NOT re-pair with the new `ab`s tail within the same pass), ties on
  * pair count break by (left, right) lexicographic order, and words carry
  * a `</w>` end marker so prefixes and whole words stay distinct tokens.
  */
object Bpe {

  /** Word-frequency table for a text column: one combinable agg pass. */
  def wordFreq(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merge rules over a (w, freq) vocabulary frame.
    * Returns the merges in training order. Stops early when no pair
    * occurs at least `minFreq` times.
    */
  def train(
      vocab: DataFrame,
      numMerges: Int,
      minFreq: Long = 2L): Seq[(String, String)] = {
    var syms = vocab
      .select(
        concat(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          array(lit("</w>"))).as("syms"),
        col("freq").cast("long").as("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      // tie-break order is (l, r) in Spark's UTF8String comparison =
      // UTF-8 byte order = Unicode CODE POINT order. Note for BMP-only
      // corpora this equals Java String order too; past the BMP the two
      // diverge (UTF-16 code units sort surrogates low) — the spec's
      // independent reference implementation therefore also ties on code
      // points, and the character split itself assumes BMP input (both
      // sides would split a surrogate pair differently).
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // exactly one row — the argmax merge rule
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val old = syms
        syms = syms
          .select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
          .localCheckpoint(true) // vocab-sized; truncates the per-iteration lineage
        old.unpersist()
      }
      it += 1
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Frequency-weighted adjacent-pair counts over a (syms, freq) frame. */
  private[operators] def pairCounts(syms: DataFrame): DataFrame =
    syms
      .filter(size(col("syms")) >= 2)
      .select(
        col("freq"),
        explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** One left-to-right, non-overlapping merge pass `(a, b) → ab` over a
    * symbol array, as a Catalyst fold: state = (emitted prefix, pending
    * symbol). A match emits the merged token and clears the pending slot,
    * so the merged token cannot chain into the next pair within this
    * pass — exactly the reference BPE semantics. The empty-string
    * sentinel is safe: every symbol is a non-empty character or a prior
    * merge of non-empty symbols.
    */
  private[operators] def applyMerge(syms: Column, a: String, b: String): Column = {
    // a LITERAL empty array<string> — NOT slice(syms, 1, 0): that would
    // reference `syms` a second time, and under [[segment]]'s nesting
    // each layer's input is the previous layer's whole expression tree,
    // so one extra reference per layer is a 2^depth tree blowup (96
    // frozen merges OOM'd the driver building the plan)
    val empty = typedlit(Seq.empty[String])
    aggregate(
      syms,
      struct(empty.as("acc"), lit("").as("prev")),
      (st, x) => {
        val acc = st.getField("acc")
        val prev = st.getField("prev")
        when(prev === lit(a) && x === lit(b),
          struct(concat(acc, array(lit(a + b))).as("acc"), lit("").as("prev")))
          .otherwise(struct(
            when(prev === lit(""), acc).otherwise(concat(acc, array(prev))).as("acc"),
            x.as("prev")))
      },
      st =>
        when(st.getField("prev") === lit(""), st.getField("acc"))
          .otherwise(concat(st.getField("acc"), array(st.getField("prev")))))
  }

  /** Segment a text column with a trained merge list: chars + `</w>`,
    * then every merge applied in training order. The merge rules are
    * literals compiled into the expression tree — broadcast-by-construction.
    *
    * `chunk` bounds the expression DEPTH: every `chunk` merges the frame
    * is eagerly localCheckpointed, so a production-sized merge table
    * (tens of thousands of rules) compiles as many shallow expression
    * trees instead of one tree deep enough to break codegen — the
    * intended input here is the DICTIONARY frame (distinct words), so
    * each checkpoint materializes a vocabulary-sized, not corpus-sized,
    * frame.
    */
  def segment(
      corpus: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      chunk: Int = 32): DataFrame = {
    // sequence(1, 0) would count DOWN ([1, 0]); empty text gets just the marker
    val base = when(length(col(textCol)) === 0, array(lit("</w>")))
      .otherwise(concat(
        expr(s"transform(sequence(1, length($textCol)), i -> substring($textCol, i, 1))"),
        array(lit("</w>"))))
    val step = math.max(1, chunk)
    merges.grouped(step).zipWithIndex
      .foldLeft(corpus.withColumn("bpe_tokens", base)) {
        case (df, (grp, gi)) =>
          val applied = df.withColumn("bpe_tokens",
            grp.foldLeft(col("bpe_tokens")) {
              case (c, (a, b)) => applyMerge(c, a, b)
            })
          // checkpoint BETWEEN chunks only (the last chunk stays lazy so
          // trivial merge tables add no materialization at all); `step`,
          // not raw `chunk`, so chunk<=0 doesn't eagerly pin every merge
          if ((gi + 1) * step < merges.size) applied.localCheckpoint(true)
          else applied
      }
  }

  /** Encode a corpus to BPE token ids under a FROZEN merge table + id
    * vocabulary (e.g. the committed [[graft.model.BpeMerges]] fixture) —
    * the tokenizer-apply stage of a training-data pipeline. Output one
    * row per document: `n_tokens` (total BPE tokens, the number sequence
    * packing actually batches by) and `bpe_ids` (the id stream,
    * space-joined — deterministic, engine-portable). Tokens outside the
    * id vocabulary (e.g. characters the table was never trained over)
    * encode as −1, the documented OOV convention.
    *
    * Scale design — the same Zipf observation that makes [[train]]
    * feasible: the corpus is NOT segmented row by row. Distinct words
    * (vocabulary-sized) are segmented once each, then the encoded
    * dictionary joins back to the corpus' exploded word stream and one
    * per-document pass stitches the streams. Plan shape: one exploded
    * corpus pass → distinct (map-side combinable) → vocabulary-sized
    * segmentation (the expensive fold runs per TYPE, not per
    * occurrence) → SHUFFLE_HASH dictionary join (the r11 broadcast-OOM
    * lesson: a "small" dictionary grows with vocabulary; shuffle-hash
    * keeps the build per-partition-sized at any corpus) → the
    * per-document assembly as a [[SortedGroupFold.reduceGroups]]
    * streaming fold — NOT a `collect_list` aggregate, whose per-group
    * object buffers are untracked heap and OOM'd the 8 GB bench JVM at
    * the 200k-doc TEXTSCALE point; the fold holds exactly one
    * document's id stream at a time over a spillable sort. The id map
    * itself is fixture-sized (vocab of the FROZEN tokenizer, not the
    * corpus) and compiles into the plan as a literal map.
    */
  def encode(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      idOf: Map[String, Int]): DataFrame = {
    val words = Spread.ensure(corpus.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
    val (toks, ids) = idOf.toSeq.sorted.unzip
    val idMap = map_from_arrays(
      lit(toks.toArray), lit(ids.map(_.toLong).toArray))
    val dict = segment(words.select(col("__w")).distinct(), "__w", merges)
      .select(
        col("__w"),
        size(col("bpe_tokens")).cast("long").as("__n"),
        array_join(
          transform(col("bpe_tokens"),
            t => coalesce(element_at(idMap, t), lit(-1L)).cast("string")),
          " ").as("__ids"))
    val joined = words
      .join(dict.hint("shuffle_hash"), Seq("__w"))
      .select(col(idCol), col("__pos"), col("__n"), col("__ids"))
    val ni = joined.schema.fieldIndex("__n")
    val si = joined.schema.fieldIndex("__ids")
    SortedGroupFold.reduceGroups(
      joined, idCol, Seq("__pos"),
      Seq(
        org.apache.spark.sql.types.StructField(
          "n_tokens", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "bpe_ids", org.apache.spark.sql.types.StringType, nullable = false))) {
      () => new SortedGroupFold.GroupReducer {
        private var n = 0L
        private val sb = new java.lang.StringBuilder
        def start(r: Row): Unit = { n = 0L; sb.setLength(0) }
        def next(r: Row): Unit = {
          n += r.getLong(ni)
          if (sb.length > 0) sb.append(' ')
          sb.append(r.getString(si))
        }
        def finish(): Seq[Any] = Seq(n, sb.toString)
      }
    }
  }
}
