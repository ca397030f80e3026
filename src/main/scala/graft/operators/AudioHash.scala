package graft.operators

import org.apache.spark.sql.Column
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
  * All pure Catalyst HOF expressions over an `array<int>` PCM column —
  * codegen'd, no UDF, no shuffle. 64 bits pack as the same two 32-bit
  * halves as [[ImageHash]]'s aHash (`acc·2` on 32-bit halves — ANSI
  * overflow-safe on both engines), which means the ENTIRE candidate
  * machinery is reused, not re-implemented: [[ImageHash.bands]],
  * [[ImageHash.hamming]], [[ImageHash.bandCandidatePairs]] operate on
  * (lo, hi) unchanged, and the banding recall regime measured in
  * `ImageHashSpec` (pigeonhole-exact ≤ 3, ≈ 0.90/0.74/0.58 at 4/5/6)
  * carries over verbatim.
  */
object AudioHash {

  /** Per-frame magnitude energies: `array<long>` of
    * [[AudioGen.NumFrames]] sums of |sample| over
    * [[AudioGen.FrameLen]]-sample frames.
    */
  def frameEnergies(pcmCol: String): Column =
    expr(s"transform(sequence(0, ${AudioGen.NumFrames - 1}), " +
      s"f -> aggregate(slice($pcmCol, f * ${AudioGen.FrameLen} + 1, " +
      s"${AudioGen.FrameLen}), 0L, (a, x) -> a + abs(x)))")

  /** Fingerprint bits 0–31 packed as Σ bit_j·2^j (bit j = e(j) > e(j+1)). */
  def fpLo(eCol: String): Column =
    expr(s"aggregate(sequence(31, 0, -1), 0L, (acc, j) -> acc * 2 + " +
      s"IF(element_at($eCol, j + 1) > element_at($eCol, j + 2), 1L, 0L))")

  /** Fingerprint bits 32–63 packed as Σ bit_j·2^(j−32). */
  def fpHi(eCol: String): Column =
    expr(s"aggregate(sequence(63, 32, -1), 0L, (acc, j) -> acc * 2 + " +
      s"IF(element_at($eCol, j + 1) > element_at($eCol, j + 2), 1L, 0L))")
}
