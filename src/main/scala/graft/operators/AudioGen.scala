package graft.operators

/** The deterministic synthetic audio corpus for q154 — the audio
  * sibling of [[ImageGen]]: docs come in groups of 4 (`g = id / 4`)
  * whose members are near-duplicate takes of one base waveform (a
  * re-level of two frames — the "same recording, different gain rides"
  * case audio dedup exists for), mixed so cross-group fingerprints are
  * independent.
  *
  * 520 16-bit PCM samples per doc = 65 frames × 8 samples, sized for
  * the 64 energy-delta fingerprint bits [[AudioHash]] computes. The
  * integer mixing chain is [[ImageGen]]'s (group-multiplicative +
  * xorshift + small-prime multiply — the anti-collision discipline
  * measured there), with its own constants; every product stays inside
  * i64 so the DuckDB oracle replays the arithmetic exactly.
  */
object AudioGen {

  val FrameLen = 8
  val NumFrames = 65
  val NumSamples: Int = FrameLen * NumFrames // 520

  /** Content fingerprint of the generator kernel (the [[ImageGen]]
    * marker discipline): stale on-disk AUSCALE file corpora regenerate
    * when the kernel constants change instead of silently benching
    * different waveforms than the packed arm.
    */
  lazy val kernelHash: String = {
    val crc = new java.util.zip.CRC32
    Seq(0L, 1L, 2L, 3L, 77L).foreach { id =>
      samplesVar(id, 2048).foreach { s =>
        crc.update(s & 0xff); crc.update((s >> 8) & 0xff)
      }
    }
    java.lang.Long.toHexString(crc.getValue)
  }

  /** Variable-length PCM for the scale record (AUSCALE) and the
    * sub-fingerprint recall spec — the same per-sample mixing kernel at
    * any length, with the variant set adjusted to exercise what
    * sub-fingerprints exist for. Variant v = id % 4:
    *  - v = 0: base take;
    *  - v = 1, 3: re-level of frames ≡ v (mod 32) — the [[samples]]
    *    fixture shape, flips a few energy-delta bits per window;
    *  - v = 2: the base take TIME-SHIFTED by 2 whole frames (content at
    *    i comes from position i − 2·frameLen; the lead-in extends the
    *    kernel to negative positions via floorMod). Frame-aligned, so
    *    the shifted clip's energy sequence is the base's shifted by 2 —
    *    its hop-1 sub-fingerprint windows are EXACTLY the base's at
    *    offset 2 (min window Hamming 0), while its first-window
    *    single fingerprint is ~uncorrelated with the base's. The
    *    variant a single 64-bit summary structurally misses and
    *    sub-fingerprints catch.
    *
    * Products stay inside i64 (|pos|·mg < 2^53 at any realistic
    * length), so an oracle can replay the arithmetic exactly.
    */
  def samplesVar(id: Long, numSamples: Int, frameLen: Int = FrameLen): Array[Short] = {
    require(numSamples >= 1 && frameLen >= 1)
    val g = id / 4
    val v = (id % 4).toInt
    val shift = if (v == 2) 2 * frameLen else 0
    val M = 4294967296L
    Array.tabulate(numSamples) { i =>
      val pos = i - shift
      val mg = ((g + 1L) * 2654435761L) % M
      val h0 = java.lang.Math.floorMod(mg * (pos + 29L) + pos * 69069L, M)
      val h = (((h0 ^ (h0 / 4096L)) * 104729L) % M)
      val base = (((h / 32768L) % 32768L) - 16384L).toInt
      val s =
        if ((v == 1 || v == 3) && (i / frameLen) % 32 == v)
          base + (if (base >= 0) 1500 else -1500)
        else base
      s.toShort
    }
  }

  /** The PCM samples of document `id`. Variant v = id % 4: v = 0 is
    * the base take; v in 1..3 bumps the magnitude of every sample in
    * frames f ≡ v (mod 32) by 1500 — a two-frame re-level that flips
    * only the energy-delta bits whose margin is under the bump, so
    * within-group Hamming distances are small and mostly inside q154's
    * ≤ 6 gate (the oracle replays the same pipeline, so the planted
    * recall is pinned, not assumed).
    */
  def samples(id: Long): Array[Short] = {
    val g = id / 4
    val v = (id % 4).toInt
    Array.tabulate(NumSamples) { i =>
      val mg = ((g + 1L) * 2654435761L) % 4294967296L
      val h0 = (mg * (i + 29L) + i * 69069L) % 4294967296L
      val h = (((h0 ^ (h0 / 4096L)) * 104729L) % 4294967296L)
      val base = (((h / 32768L) % 32768L) - 16384L).toInt
      val s =
        if (v > 0 && (i / FrameLen) % 32 == v)
          base + (if (base >= 0) 1500 else -1500)
        else base
      s.toShort
    }
  }
}
