package graft.operators

import graft.functions
import graft.internal.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Acoustic fingerprinting for near-duplicate audio dedup — the audio
  * member of the dedup family, completing the modality set (text:
  * q21/q133; image: q151). The fingerprint is the classic
  * energy-delta-sign shape (the single-band core of Haitsma–Kalker's
  * "A Highly Robust Audio Fingerprint System", 2002): frame the PCM
  * stream, bit j = energy(frame j) > energy(frame j+1). Sign-of-delta
  * is invariant to uniform gain and robust to small re-levels — the
  * transformations audio near-dups actually differ by — and it is
  * INTEGER math end to end (Σ|s| per frame), so the DuckDB oracle
  * replays it exactly.
  *
  * Input shape (r15 verdict #1 — previously welded to the 520-sample
  * fixture): the frame count derives from `size(pcm)`, clips shorter
  * than one fingerprint window fail LOUDLY (`raise_error`) instead of
  * silently hashing zero-energy frames, and clips longer than one
  * window emit Haitsma–Kalker SUB-FINGERPRINTS — one 64-bit (lo, hi)
  * per 65-frame window at a caller-chosen frame hop — so a 3-minute
  * clip is a sequence of window prints, not one 64-bit summary. Two
  * clips near-match when ANY window pair is within the Hamming gate
  * (the union-over-windows match unit; [[subFpCandidatePairs]]).
  *
  * All native codegen'd `Expression`s over an `array<int>` PCM column
  * ([[graft.functions.AudioFp]] — one fused JVM pass per kernel inside
  * whole-stage codegen; r16 replaced the interpreted-HOF spellings,
  * which dispatched a lambda per element, ~4,000 applications per
  * sf0.1 clip) — no UDF, no shuffle; `AudioHashSpec` pins the kernels
  * bit-identical to an independent reference. 64 bits pack as the same
  * two 32-bit halves as
  * [[ImageHash]]'s aHash (`acc·2` on 32-bit halves — ANSI
  * overflow-safe on both engines), which means the ENTIRE candidate
  * machinery is reused, not re-implemented: [[ImageHash.bands]],
  * [[ImageHash.hamming]], [[ImageHash.bandCandidatePairs]] operate on
  * (lo, hi) unchanged, and the banding recall regime measured in
  * `ImageHashSpec` (pigeonhole-exact ≤ 3, ≈ 0.90/0.74/0.58 at 4/5/6)
  * carries over verbatim per WINDOW PAIR; the per-CLIP recall under
  * sub-fingerprints is the union over window pairs, measured in
  * `AudioHashSpec` (it can only exceed the single-window regime).
  */
object AudioHash {

  /** Frames per fingerprint window: 65 energies → 64 delta bits. */
  val WindowFrames = 65

  /** Per-frame magnitude energies: `array<long>` of `size(pcm) DIV
    * frameLen` sums of |sample| over `frameLen`-sample frames (the
    * trailing partial frame, if any, is dropped — a fingerprint bit
    * must compare equal-length frames). Clips with fewer than
    * [[WindowFrames]] complete frames raise — one window is the
    * minimum meaningful fingerprint (r15 verdict #1: the old
    * fixed-count spelling sliced past the array end on short input and
    * hashed zero-energy frames with no error).
    */
  def frameEnergies(pcmCol: String, frameLen: Int = AudioGen.FrameLen): Column = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    Cols.of(functions.FrameEnergies(Cols.expressionOf(col(pcmCol)), frameLen))
  }

  /** Fingerprint bits 0–31 of the FIRST window packed as Σ bit_j·2^j
    * (bit j = e(j) > e(j+1)); for multi-window clips see
    * [[subFingerprints]].
    */
  def fpLo(eCol: String): Column =
    Cols.of(functions.FpBits(Cols.expressionOf(col(eCol)), fromBit = 0))

  /** Fingerprint bits 32–63 of the first window packed as Σ bit_j·2^(j−32). */
  def fpHi(eCol: String): Column =
    Cols.of(functions.FpBits(Cols.expressionOf(col(eCol)), fromBit = 32))

  /** Haitsma–Kalker sub-fingerprints over an energy array: one 64-bit
    * (lo, hi) per [[WindowFrames]]-frame window, window w starting at
    * frame `w` for w = 0, hop, 2·hop, … ≤ frames − 65. Returns
    * `array<struct<w int, lo bigint, hi bigint>>`; raises on fewer
    * than [[WindowFrames]] frames (same loud-undersize contract as
    * [[frameEnergies]]).
    *
    * Hop trade (the HK paper uses maximal frame overlap, hop = 1):
    * hop = 1 catches any FRAME-ALIGNED time shift exactly (the shifted
    * clip's windows are a subset of the original's) at frames−64
    * sub-prints per clip; hop = h divides storage and band-join volume
    * by h but only guarantees window alignment for shifts that are
    * multiples of gcd-ish offsets — AUSCALE prices the axis. Sub-ms
    * non-frame-aligned shifts are out of scope for this integer
    * spelling (HK recovers them with 31/32-overlapped frames).
    */
  def subFingerprints(eCol: String, hopFrames: Int = 1): Column = {
    require(hopFrames >= 1, s"hopFrames must be >= 1, got $hopFrames")
    Cols.of(functions.SubFingerprints(Cols.expressionOf(col(eCol)), hopFrames))
  }

  /** Candidate CLIP pairs from sub-fingerprints — the union-over-windows
    * match unit: two clips are a candidate when any window pair shares
    * a 16-bit band, and the returned `min_hamming` is the minimum
    * window-pair Hamming over the surfaced candidates (callers gate on
    * it, e.g. ≤ 6). Input: `(doc_id, sfp array<struct<w, lo, hi>>)`.
    *
    * Scale shape: explode to (clip, window) rows, band-equi self-join
    * on (bidx, bval) exactly like [[ImageHash.bandCandidatePairs]] —
    * never all-pairs; the band table at 100 TB partitions by
    * (bidx, bval) and its row count is clips × windows-per-clip × 4.
    * The groupBy collapses the per-window pair fan-out to one row per
    * clip pair BEFORE the caller's gate, so downstream joins see clip
    * pairs, not window pairs.
    */
  def subFpCandidatePairs(
      clips: DataFrame,
      bander: (Column, Column) => Column = ImageHash.bands): DataFrame = {
    val wins = clips.select(col("doc_id"), explode(col("sfp")).as("s"))
      .select(col("doc_id"), col("s.lo").as("lo"), col("s.hi").as("hi"))
    val banded = wins.select(
      col("doc_id"), col("lo"), col("hi"),
      posexplode(bander(col("lo"), col("hi"))).as(Seq("bidx", "bval")))
    val a = banded.select(
      col("doc_id").as("a_id"), col("lo").as("a_lo"), col("hi").as("a_hi"),
      col("bidx"), col("bval"))
    val b = banded.select(
      col("doc_id").as("b_id"), col("lo").as("b_lo"), col("hi").as("b_hi"),
      col("bidx"), col("bval"))
    a.join(b, Seq("bidx", "bval"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(ImageHash.hamming(
        col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi")).cast("long"))
        .as("min_hamming"))
  }
}
