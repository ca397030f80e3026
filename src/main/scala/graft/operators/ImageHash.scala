package graft.operators

import org.apache.spark.sql.Column
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
  * All pure Catalyst HOF expressions over an `array<int>` gray column —
  * codegen'd, no UDF, no shuffle. The 64-bit aHash rides as two 32-bit
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

  /** Σ of the gray values (the integer mean gate's right side). */
  def graySum(gray: Column): Column =
    aggregate(gray, lit(0L), (a, x) => a + x)

  /** aHash bits 0–31 packed as Σ bit_j·2^j (needs a `totCol` holding
    * [[graySum]] — hoist it, don't inline it 32×).
    */
  def aHashLo(grayCol: String, totCol: String): Column =
    expr(s"aggregate(sequence(31, 0, -1), 0L, (acc, j) -> acc * 2 + " +
      s"IF(element_at($grayCol, j + 1) * 64 > $totCol, 1L, 0L))")

  /** aHash bits 32–63 packed as Σ bit_j·2^(j−32). */
  def aHashHi(grayCol: String, totCol: String): Column =
    expr(s"aggregate(sequence(63, 32, -1), 0L, (acc, j) -> acc * 2 + " +
      s"IF(element_at($grayCol, j + 1) * 64 > $totCol, 1L, 0L))")

  /** dHash: 56 gradient bits (8 rows × 7 columns, row-major
    * k = r·7 + c), packed as Σ bit_k·2^k — < 2^56, overflow-safe.
    */
  def dHash(grayCol: String): Column =
    expr(s"aggregate(sequence(55, 0, -1), 0L, (acc, k) -> acc * 2 + " +
      s"IF(element_at($grayCol, CAST((k DIV 7) * 8 + (k % 7) + 1 AS INT)) < " +
      s"element_at($grayCol, CAST((k DIV 7) * 8 + (k % 7) + 2 AS INT)), 1L, 0L))")

  /** The four 16-bit LSH bands of the (hi, lo) aHash. */
  def bands(lo: Column, hi: Column): Column =
    array(
      lo.bitwiseAND(lit(65535L)),
      shiftright(lo, 16).bitwiseAND(lit(65535L)),
      hi.bitwiseAND(lit(65535L)),
      shiftright(hi, 16).bitwiseAND(lit(65535L)))

  /** Hamming distance of two (hi, lo) hash pairs. */
  def hamming(loA: Column, hiA: Column, loB: Column, hiB: Column): Column =
    bit_count(loA.bitwiseXOR(loB)) + bit_count(hiA.bitwiseXOR(hiB))
}
