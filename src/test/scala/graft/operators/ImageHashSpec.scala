package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The perceptual-hash Column expressions pinned against an INDEPENDENT
  * in-memory implementation (plain Scala bit ops, shares no code with
  * the Catalyst spelling), plus the behaviors that make the hashes
  * usable for near-dup dedup: brightness-shift sensitivity profiles and
  * the band/Hamming machinery.
  */
class ImageHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Independent aHash: (lo bits 0–31, hi bits 32–63), bit j set iff
    * p(j)·64 > Σp.
    */
  private def refAHash(px: Seq[Int]): (Long, Long) = {
    val tot = px.map(_.toLong).sum
    var lo = 0L; var hi = 0L
    for (j <- 0 until 64)
      if (px(j).toLong * 64 > tot) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
    (lo, hi)
  }

  /** Independent dHash: bit r·7+c set iff p(r,c) < p(r,c+1). */
  private def refDHash(px: Seq[Int]): Long = {
    var d = 0L
    for (r <- 0 until 8; c <- 0 until 7)
      if (px(r * 8 + c) < px(r * 8 + c + 1)) d |= 1L << (r * 7 + c)
    d
  }

  test("aHash/dHash Column expressions equal the independent bit-ops " +
    "reference on seeded random grids, flat images, and edge ramps") {
    val rng = new scala.util.Random(17)
    val grids: Seq[Seq[Int]] =
      (1 to 30).map(_ => Seq.fill(64)(rng.nextInt(256))) ++
        Seq(
          Seq.fill(64)(0),                      // flat black: no bit set
          Seq.fill(64)(255),                    // flat white: 255·64 > Σ is false
          (0 until 64).map(j => j * 4),         // ramp
          (0 until 64).map(j => 255 - j * 4))   // reverse ramp
    val df = grids.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "gray")
      .withColumn("tot", ImageHash.graySum(col("gray")))
      .select(col("id"),
        ImageHash.aHashLo("gray", "tot").as("lo"),
        ImageHash.aHashHi("gray", "tot").as("hi"),
        ImageHash.dHash("gray").as("dh"))
    val got = df.as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    grids.zipWithIndex.foreach { case (g, i) =>
      val (lo, hi) = refAHash(g)
      assert(got(i.toLong) === ((lo, hi, refDHash(g))), s"grid $i")
    }
    // flat images hash to zero on both axes (no pixel beats the mean
    // strictly, no gradient)
    assert(got(30L) === ((0L, 0L, 0L)) && got(31L) === ((0L, 0L, 0L)))
  }

  test("dHash is invariant to a global brightness shift; aHash flips " +
    "under inversion — the two hashes fail differently by design") {
    val rng = new scala.util.Random(23)
    val base = Seq.fill(64)(20 + rng.nextInt(200))
    val shifted = base.map(_ + 30)
    val inverted = base.map(255 - _)
    def hashes(px: Seq[Int]) = {
      val df = Seq((1L, px)).toDF("id", "gray")
        .withColumn("tot", ImageHash.graySum(col("gray")))
        .select(ImageHash.aHashLo("gray", "tot").as("lo"),
          ImageHash.aHashHi("gray", "tot").as("hi"),
          ImageHash.dHash("gray").as("dh"))
      df.as[(Long, Long, Long)].head()
    }
    val hb = hashes(base)
    val hs = hashes(shifted)
    val hi = hashes(inverted)
    assert(hb._3 == hs._3) // gradients unmoved by +30 everywhere
    // inversion flips (nearly) every aHash bit: Hamming ≥ 56 of 64
    val ham = java.lang.Long.bitCount(hb._1 ^ hi._1) +
      java.lang.Long.bitCount(hb._2 ^ hi._2)
    assert(ham >= 56, s"inversion hamming $ham")
  }

  test("bands cover the 64 aHash bits exactly: reassembling the four " +
    "16-bit bands restores (lo, hi)") {
    val rng = new scala.util.Random(31)
    val pairs = (1 to 20).map(_ =>
      (rng.nextLong() & 0xffffffffL, rng.nextLong() & 0xffffffffL))
    val out = pairs.toDF("lo", "hi")
      .select(col("lo"), col("hi"),
        ImageHash.bands(col("lo"), col("hi")).as("b"))
      .as[(Long, Long, Seq[Long])].collect()
    out.foreach { case (lo, hi, b) =>
      assert(b.length == 4 && b.forall(v => v >= 0 && v <= 65535))
      assert((b(1) << 16 | b(0)) == lo && (b(3) << 16 | b(2)) == hi)
    }
  }

  test("hamming equals Long.bitCount of the xor on random hash pairs") {
    val rng = new scala.util.Random(37)
    val rows = (1 to 25).map(_ => (
      rng.nextLong() & 0xffffffffL, rng.nextLong() & 0xffffffffL,
      rng.nextLong() & 0xffffffffL, rng.nextLong() & 0xffffffffL))
    val got = rows.toDF("la", "ha", "lb", "hb")
      .select(col("la"), col("ha"), col("lb"), col("hb"),
        ImageHash.hamming(col("la"), col("ha"), col("lb"), col("hb")).as("d"))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (la, ha, lb, hb, d) =>
      assert(d == java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb))
    }
  }
}
