package graft.operators

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
    * instead of hashing garbage. Pure HOFs over the gray array + the
    * width/height columns — per-row, no shuffle.
    */
  def gridReduce(grayCol: String, widthCol: String, heightCol: String): Column =
    expr(
      s"""CASE WHEN $widthCol < 8 OR $heightCol < 8
         |       OR size($grayCol) != $widthCol * $heightCol
         |  THEN raise_error(concat(
         |    'ImageHash.gridReduce: need width,height >= 8 and size(gray) = width*height, got (',
         |    CAST($widthCol AS STRING), 'x', CAST($heightCol AS STRING),
         |    ', ', CAST(size($grayCol) AS STRING), ' pixels)'))
         |  ELSE transform(sequence(0, 63), k -> CAST(
         |    aggregate(
         |      sequence((k DIV 8) * $heightCol DIV 8,
         |               ((k DIV 8) + 1) * $heightCol DIV 8 - 1),
         |      0L,
         |      (ra, rr) -> ra + aggregate(
         |        sequence((k % 8) * $widthCol DIV 8,
         |                 ((k % 8) + 1) * $widthCol DIV 8 - 1),
         |        0L,
         |        (ca, cc) -> ca + element_at($grayCol,
         |          CAST(rr * $widthCol + cc + 1 AS INT))))
         |    DIV ((((k DIV 8) + 1) * $heightCol DIV 8 - (k DIV 8) * $heightCol DIV 8)
         |         * (((k % 8) + 1) * $widthCol DIV 8 - (k % 8) * $widthCol DIV 8))
         |    AS INT))
         |END""".stripMargin)

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

  /** Hamming distance of two (hi, lo) hash pairs. */
  def hamming(loA: Column, hiA: Column, loB: Column, hiB: Column): Column =
    bit_count(loA.bitwiseXOR(loB)) + bit_count(hiA.bitwiseXOR(hiB))

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
