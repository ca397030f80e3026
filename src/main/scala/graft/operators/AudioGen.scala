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
