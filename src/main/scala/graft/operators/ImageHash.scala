package graft.operators

import graft.functions
import graft.internal.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing for near-duplicate image dedup — the pixel
  * member of the dedup family (r13 verdict #3): multimodal corpora drop
  * re-encoded / slightly-retouched copies by Hamming distance over a
  * tiny grid hash, not by byte equality (a JPEG re-save changes every
  * byte). Two standard 64-bit hashes over an 8×8 grayscale grid:
  *
  *  - aHash (average hash): bit j = pixel j brighter than the image
  *    mean. Spelled integer-exactly as `p·64 > Σp` — no float mean, so
  *    the DuckDB replay cannot drift.
  *  - dHash (gradient hash): bit (r,c) = p(r,c) < p(r,c+1), 8 rows × 7
  *    columns = 56 bits. Robust to global brightness shifts that move
  *    every aHash bit together.
  *
  * All native codegen'd `Expression`s over an `array<int>` gray column
  * ([[graft.functions.ImageFp]] — one fused JVM pass per kernel inside
  * whole-stage codegen; r16 replaced the interpreted-HOF spellings,
  * whose lambdas were dispatched per grid cell × per block pixel) — no
  * UDF, no shuffle; `ImageHashSpec` pins the kernels bit-identical to
  * independent references. The 64-bit aHash rides as two 32-bit
  * halves (`lo` bits 0–31, `hi` bits 32–63): `acc·2` packing on 32-bit
  * halves stays far from Long overflow, so the expressions are safe
  * under ANSI arithmetic on BOTH engines (a 64-bit single-long pack
  * would overflow the sign bit). Candidate generation is LSH-style
  * banding (the q21 shape): the aHash splits into four 16-bit bands,
  * near-dup pairs must agree on ≥ 1 band, so the join is band-equi —
  * never all-pairs — and a band table at 100 TB partitions by
  * (band_idx, band_val) exactly like a MinHash bucket table.
  */
object ImageHash {

  /** Block-average reduction of an arbitrary W×H row-major gray array
    * to the 8×8 grid [[aHashLo]]/[[aHashHi]]/[[dHash]] consume — the
    * downsample step every real aHash implementation starts with (r15
    * verdict #1: the operators previously ASSUMED an already-8×8
    * array; the corpus happened to be generated at 8×8). Grid cell
    * (r, c) is the floor-mean over the pixel block
    * rows [⌊r·H/8⌋, ⌊(r+1)·H/8⌋) × cols [⌊c·W/8⌋, ⌊(c+1)·W/8⌋) — the
    * standard equal-ish partition; blocks differ by at most one
    * row/column when 8 ∤ H or 8 ∤ W. Integer-exact (sum then DIV), so
    * an oracle replay cannot drift. 8×8 input reduces to itself
    * (identity — the fixture corpora and their oracles are untouched).
    *
    * Loud on bad input: width/height below 8 (an upscale is not a
    * hash-preserving reduction) or `size(gray) ≠ width·height` raise
    * instead of hashing garbage. One fused JVM pass over the gray
    * array + the width/height columns — per-row, no shuffle.
    */
  def gridReduce(grayCol: String, widthCol: String, heightCol: String): Column =
    Cols.of(functions.GridReduce(
      Cols.expressionOf(col(grayCol)),
      Cols.expressionOf(col(widthCol)),
      Cols.expressionOf(col(heightCol))))

  /** Σ of the gray values (the integer mean gate's right side). */
  def graySum(gray: Column): Column =
    Cols.of(functions.GraySum(Cols.expressionOf(gray)))

  /** aHash bits 0–31 packed as Σ bit_j·2^j (needs a `totCol` holding
    * [[graySum]] — hoist it, don't inline it 32×).
    */
  def aHashLo(grayCol: String, totCol: String): Column =
    Cols.of(functions.AHashBits(
      Cols.expressionOf(col(grayCol)), Cols.expressionOf(col(totCol)), fromBit = 0))

  /** aHash bits 32–63 packed as Σ bit_j·2^(j−32). */
  def aHashHi(grayCol: String, totCol: String): Column =
    Cols.of(functions.AHashBits(
      Cols.expressionOf(col(grayCol)), Cols.expressionOf(col(totCol)), fromBit = 32))

  /** dHash: 56 gradient bits (8 rows × 7 columns, row-major
    * k = r·7 + c), packed as Σ bit_k·2^k — < 2^56, overflow-safe.
    */
  def dHash(grayCol: String): Column =
    Cols.of(functions.DHash56(Cols.expressionOf(col(grayCol))))

  /** The four 16-bit LSH bands of the (hi, lo) aHash.
    *
    * Recall regime (r14 verdict #3, measured in `ImageHashSpec`): the
    * pigeonhole argument makes banding EXACT only to Hamming distance
    * 3 — with 4 bands, ≤ 3 differing bits leave at least one band
    * clean. A downstream gate ABOVE 3 (q151 uses ≤ 6) is genuinely
    * approximate: a pair whose diffs touch all four bands generates no
    * candidate. For uniformly-placed diffs the analytic recall is the
    * fraction of diff-position sets NOT covering all 4 bands —
    * ≈ 0.897 at distance 4, ≈ 0.742 at 5, ≈ 0.583 at 6 (hypergeometric
    * inclusion–exclusion over 4 bands × 16 bits; the spec measures a
    * seeded planted ensemble within ±0.05 of each and pins the
    * adversarial one-diff-per-band pair as a certain miss). Standard
    * LSH recall<1 territory; to make distance ≤ 7 exact instead, band
    * into 8 bytes — at ~2× the candidate volume.
    */
  def bands(lo: Column, hi: Column): Column =
    array(
      lo.bitwiseAND(lit(65535L)),
      shiftright(lo, 16).bitwiseAND(lit(65535L)),
      hi.bitwiseAND(lit(65535L)),
      shiftright(hi, 16).bitwiseAND(lit(65535L)))

  /** Two 32-bit bands (band 0 = lo, band 1 = hi) — the scale-path
    * banding for corpora whose window-print volume makes the 16-bit
    * buckets collide quadratically (AUSCALE's measured axis: sub-
    * fingerprint tables hold clips × windows prints, and bucket
    * occupancy at 2.5M prints is ~39, squaring into ~hundreds of
    * millions of chance candidates). Occupancy drops by 2^16;
    * pigeonhole exactness narrows from Hamming ≤ 3 to ≤ 1 — the right
    * trade once near-dups are expected at tiny distances (re-levels,
    * shifts) and the print count, not the distance, is the threat.
    */
  def bandsWide(lo: Column, hi: Column): Column = array(lo, hi)

  /** Hamming distance of two (hi, lo) hash pairs. */
  def hamming(loA: Column, hiA: Column, loB: Column, hiB: Column): Column =
    bit_count(loA.bitwiseXOR(loB)) + bit_count(hiA.bitwiseXOR(hiB))

  /** Banded candidates of a PROBE frame against an INDEX frame — the
    * two-table layout incremental dedup needs (today's batch probing
    * the history band table). Inputs are hashed frames
    * `(doc_id, lo, hi)`; output one row per banded agreement:
    * `(bidx, bval, p_id, p_lo, p_hi, i_id, i_lo, i_hi)` — callers gate
    * on [[hamming]] and aggregate. At 100 TB the index side is a
    * STORED band table partitioned by (bidx, bval), appended per batch;
    * probes shuffle by the same key, so the history is only touched in
    * the buckets the batch lands in — never rescanned, never all-pairs.
    */
  def bandCandidatesAgainst(probes: DataFrame, index: DataFrame): DataFrame = {
    def banded(df: DataFrame, p: String) = df.select(
      col("doc_id").as(s"${p}_id"), col("lo").as(s"${p}_lo"),
      col("hi").as(s"${p}_hi"),
      posexplode(bands(col("lo"), col("hi"))).as(Seq("bidx", "bval")))
    banded(probes, "p").join(banded(index, "i"), Seq("bidx", "bval"))
  }

  /** Incremental near-dup dedup — the arrival-driven shape a training
    * pipeline runs daily (the q99/q131 pattern applied to
    * perceptual-hash bands, r15 verdict next #6): `isBatch` splits a
    * hashed frame `(doc_id, lo, hi)` into today's batch and the
    * history; each batch doc reports
    *  - `dup_of_history` (dup_of = min history id within the gate) — a
    *    near-copy of something already ingested;
    *  - else `dup_in_batch` (dup_of = min EARLIER batch id within the
    *    gate) — deterministic first-keeps-it attribution, the
    *    [[graft.operators.ExactSubstr]] keep policy's id order;
    *  - else `kept` — appended to the history band table.
    * Modality-agnostic over the (lo, hi) shape: image aHash and audio
    * energy-delta prints run the SAME operator (q155/q156).
    *
    * Multi-print docs (`multiPrint = true`): the hashed frame may hold
    * SEVERAL (lo, hi) rows per doc_id — sub-fingerprint window prints
    * ([[AudioHash.subFingerprints]]) — and the semantics generalize
    * for free: a batch doc matches history when ANY of its window
    * prints is within the gate of ANY history window print (the
    * union-over-windows match unit), because the min-id aggregation
    * already folds over every gate-passing candidate row. The only
    * structural change is deduplicating the attribution base (one
    * output row per batch DOC, not per print). q159 runs this over
    * variable-length audio; the single-print q155/q156 path is the
    * `multiPrint = false` default and its plan is unchanged.
    *
    * @note builds on an eager localCheckpoint of the hashed frame (it
    *       is consumed three times: history index + both probe arms) —
    *       constructing this frame materializes the hash pass, the
    *       q151 pin discipline.
    */
  def incrementalNearDup(
      hashed: DataFrame, isBatch: Column, maxHamming: Int = 6,
      multiPrint: Boolean = false): DataFrame = {
    val pinned = hashed.localCheckpoint(true)
    val batch = pinned.filter(isBatch)
    val hist = pinned.filter(!isBatch)
    def gate = hamming(
      col("p_lo"), col("p_hi"), col("i_lo"), col("i_hi")) <= maxHamming
    val vsHist = bandCandidatesAgainst(batch, hist)
      .filter(gate)
      .groupBy(col("p_id")).agg(min(col("i_id")).as("hist_dup"))
    val inBatch = bandCandidatesAgainst(batch, batch)
      .filter(col("i_id") < col("p_id") && gate)
      .groupBy(col("p_id")).agg(min(col("i_id")).as("batch_dup"))
    val base =
      if (multiPrint) batch.select(col("doc_id")).distinct()
      else batch.select(col("doc_id"))
    base
      .join(vsHist, col("doc_id") === col("p_id"), "left").drop("p_id")
      .join(inBatch, col("doc_id") === col("p_id"), "left").drop("p_id")
      .select(
        col("doc_id"),
        when(col("hist_dup").isNotNull, lit("dup_of_history"))
          .when(col("batch_dup").isNotNull, lit("dup_in_batch"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("hist_dup"), col("batch_dup")).as("dup_of"))
  }

  /** LSH candidate pairs over a hashed frame `(doc_id, lo, hi, dh)`:
    * explode the four 16-bit aHash bands, band-equi self-join (the
    * MinHash bucket shape — at 100 TB the band table partitions by
    * (bidx, bval); never all-pairs), `a_id < b_id` orders each pair
    * once. Pairs agreeing on SEVERAL bands surface once per band —
    * callers dedup after their distance gate (cheaper than deduping
    * the wider candidate set). Shared by q151 and the recall spec so
    * the measured recall is the recall of the SHIPPED pipeline.
    */
  def bandCandidatePairs(hashed: DataFrame): DataFrame = {
    val banded = hashed.select(
      col("doc_id"), col("lo"), col("hi"), col("dh"),
      posexplode(bands(col("lo"), col("hi"))).as(Seq("bidx", "bval")))
    val a = banded.select(
      col("doc_id").as("a_id"), col("lo").as("a_lo"), col("hi").as("a_hi"),
      col("dh").as("a_dh"), col("bidx"), col("bval"))
    val b = banded.select(
      col("doc_id").as("b_id"), col("lo").as("b_lo"), col("hi").as("b_hi"),
      col("dh").as("b_dh"), col("bidx"), col("bval"))
    a.join(b, Seq("bidx", "bval")).filter(col("a_id") < col("b_id"))
  }
}
