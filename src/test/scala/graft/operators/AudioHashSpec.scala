package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The acoustic fingerprint pinned against an independent in-memory
  * implementation, the WAV roundtrip's bit-exactness on generator
  * output, and the planted near-dup structure q154 relies on.
  */
class AudioHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Independent energy-delta fingerprint (plain Scala, shares no code
    * with the Catalyst spelling): frame energies as Σ|s| over 8-sample
    * frames, bit j set iff e(j) > e(j+1).
    */
  private def refFingerprint(samples: Array[Short]): (Long, Long) = {
    val e = samples.grouped(AudioGen.FrameLen)
      .map(_.map(s => math.abs(s.toLong)).sum).toArray
    var lo = 0L; var hi = 0L
    for (j <- 0 until 64)
      if (e(j) > e(j + 1)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
    (lo, hi)
  }

  test("fpLo/fpHi Column expressions equal the independent bit-ops " +
    "reference on generator output and hand waveforms") {
    val gens = (0L until 40L).map(id => id -> AudioGen.samples(id))
    val hand = Seq(
      100L -> Array.fill(AudioGen.NumSamples)(0.toShort), // flat: no bit
      101L -> Array.tabulate(AudioGen.NumSamples)(i =>
        (if ((i / 8) % 2 == 0) 1000 else -1000).toShort), // alternating
      102L -> Array.tabulate(AudioGen.NumSamples)(i => (i * 7 % 101).toShort))
    val all = gens ++ hand
    val got = all.map { case (id, s) => (id, s.map(_.toInt).toSeq) }
      .toDF("doc_id", "pcm")
      .withColumn("e", AudioHash.frameEnergies("pcm"))
      .select(col("doc_id"), AudioHash.fpLo("e"), AudioHash.fpHi("e"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    all.foreach { case (id, s) =>
      assert(got(id) === refFingerprint(s), s"doc $id")
    }
    // flat audio has zero fingerprint (no strict energy drop anywhere);
    // |alternating| is constant magnitude per frame, so also zero —
    // both by the strict > (gain-invariance's tie side)
    assert(got(100L) === ((0L, 0L)))
  }

  test("WAV roundtrip is bit-exact on generator output (the oracle's " +
    "replay-the-generator license) and gain-invariance holds") {
    (0L until 16L).foreach { id =>
      val s = AudioGen.samples(id)
      val back = MediaCodecs.decodeWav(MediaCodecs.encodeWav(8000, s)).get
      assert(back.sampleRate == 8000 &&
        java.util.Arrays.equals(back.samples, s), s"doc $id")
    }
    // halving the gain leaves every energy-delta SIGN unchanged when
    // magnitudes halve exactly — the invariance the fingerprint exists
    // for (use even samples so /2 is exact in integer space)
    val base = AudioGen.samples(7L).map(s => ((s / 2) * 2).toShort)
    val half = base.map(s => (s / 2).toShort)
    assert(refFingerprint(base) === refFingerprint(half))
  }

  test("planted structure: within-group takes sit near each other, " +
    "cross-group fingerprints do not collide (q154's corpus contract)") {
    val n = 200
    val fps = (0L until n.toLong).map(id => id -> refFingerprint(AudioGen.samples(id)))
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val within = for {
      g <- 0 until n / 4; i <- 0 until 4; j <- i + 1 until 4
    } yield ham(fps(g * 4 + i)._2, fps(g * 4 + j)._2)
    val cross = for (g <- 0 until n / 4 - 1)
      yield ham(fps(g * 4)._2, fps(g * 4 + 4)._2)
    // the two-frame re-level flips few bits: most within-group pairs
    // pass the ≤ 6 gate; independent waveforms sit near 32
    assert(within.count(_ <= 6).toDouble / within.size > 0.5,
      s"within-group gate hit rate too low: ${within.count(_ <= 6)}/${within.size}")
    assert(cross.forall(_ > 6), s"cross-group collision: ${cross.min}")
    assert(cross.sum.toDouble / cross.size > 20.0)
  }
}
