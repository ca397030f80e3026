package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd kernels for the energy-delta audio fingerprint
  * ([[graft.operators.AudioHash]]) — the r16 "Not yet optimized #2"
  * item. These replace the interpreted higher-order-function spellings
  * (`transform(sequence(..), wi -> aggregate(..))`), whose lambdas are
  * dispatched per ELEMENT: a hop-2 sub-fingerprint pass evaluates
  * ~4,000 interpreted lambda applications per clip at the sf0.1 clip
  * lengths, and the cost grows with clip length — the same disease
  * [[MinHashSig]]'s scaladoc records for text shingles (147 s → ~1 s).
  * Each expression below is one tight JVM pass with `doGenCode`, so it
  * stays inside whole-stage codegen.
  *
  * Bit-for-bit identical to the HOF spelling on every reachable input:
  * `AudioHashSpec` pins all three against an independent plain-Scala
  * reference (generator output, hand waveforms, variable lengths,
  * hop 1/7), and the loud-undersize contract (r15 verdict #1) carries
  * over — the messages are kept verbatim so callers and specs see the
  * same failure.
  */
object AudioFp {

  /** Frames per fingerprint window (65 energies → 64 delta bits);
    * mirrors `AudioHash.WindowFrames` — `operators` depends on
    * `functions`, not the reverse, so the constant lives in both.
    */
  val WindowFrames = 65

  /** One pass of `size(pcm) DIV frameLen` frame energies Σ|s|. */
  def frameEnergies(pcm: ArrayData, frameLen: Int): ArrayData = {
    val n = pcm.numElements()
    val minSamples = WindowFrames * frameLen
    if (n < minSamples) {
      throw new IllegalStateException(
        s"AudioHash.frameEnergies: need >= $minSamples samples " +
          s"($WindowFrames frames x $frameLen), got $n")
    }
    val frames = n / frameLen
    val out = new Array[Long](frames)
    var f = 0
    var i = 0
    while (f < frames) {
      var s = 0L
      var k = 0
      while (k < frameLen) {
        s += math.abs(pcm.getInt(i)).toLong
        i += 1
        k += 1
      }
      out(f) = s
      f += 1
    }
    new GenericArrayData(out)
  }

  /** 32 delta bits from `fromBit`: bit (j − fromBit) = e(j) > e(j+1). */
  def fpBits(e: ArrayData, fromBit: Int): Long = {
    val n = e.numElements()
    if (n < WindowFrames) {
      throw new IllegalStateException(
        s"AudioHash.fpBits: need >= $WindowFrames frame energies, got $n")
    }
    var r = 0L
    var j = fromBit
    val end = fromBit + 32
    while (j < end) {
      if (e.getLong(j) > e.getLong(j + 1)) r |= 1L << (j - fromBit)
      j += 1
    }
    r
  }

  /** Haitsma–Kalker sub-fingerprints: one (w, lo, hi) struct per
    * [[WindowFrames]]-frame window at starts 0, hop, … ≤ frames − 65.
    */
  def subFingerprints(e: ArrayData, hopFrames: Int): ArrayData = {
    val frames = e.numElements()
    if (frames < WindowFrames) {
      throw new IllegalStateException(
        s"AudioHash.subFingerprints: need >= $WindowFrames frame energies, got $frames")
    }
    // one read of the energies, then pure register arithmetic per window
    val en = new Array[Long](frames)
    var i = 0
    while (i < frames) { en(i) = e.getLong(i); i += 1 }
    val numWindows = (frames - WindowFrames) / hopFrames + 1
    val rows = new Array[Any](numWindows)
    var wi = 0
    while (wi < numWindows) {
      val w = wi * hopFrames
      var lo = 0L
      var hi = 0L
      var j = 0
      while (j < 32) {
        if (en(w + j) > en(w + j + 1)) lo |= 1L << j
        j += 1
      }
      while (j < 64) {
        if (en(w + j) > en(w + j + 1)) hi |= 1L << (j - 32)
        j += 1
      }
      rows(wi) = new GenericInternalRow(Array[Any](w, lo, hi))
      wi += 1
    }
    new GenericArrayData(rows)
  }

  private[functions] def requireIntArray(
      e: Expression, name: String): TypeCheckResult = e.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<int>, got ${t.catalogString}")
  }

  private[functions] def requireLongArray(
      e: Expression, name: String): TypeCheckResult = e.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<bigint>, got ${t.catalogString}")
  }
}

/** `frame_energies(pcm, frameLen)` — array<bigint> of per-frame Σ|s|. */
case class FrameEnergies(child: Expression, frameLen: Int)
    extends UnaryExpression {

  require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")

  override def checkInputDataTypes(): TypeCheckResult =
    AudioFp.requireIntArray(child, prettyName)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "frame_energies"

  override protected def nullSafeEval(input: Any): Any =
    AudioFp.frameEnergies(input.asInstanceOf[ArrayData], frameLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AudioFp.frameEnergies($c, $frameLen)")

  override protected def withNewChildInternal(newChild: Expression): FrameEnergies =
    copy(child = newChild)
}

/** `fp_bits(e, fromBit)` — 32 packed delta-sign bits of window 0. */
case class FpBits(child: Expression, fromBit: Int) extends UnaryExpression {

  require(fromBit == 0 || fromBit == 32, s"fromBit must be 0 or 32, got $fromBit")

  override def checkInputDataTypes(): TypeCheckResult =
    AudioFp.requireLongArray(child, prettyName)

  override def dataType: DataType = LongType
  override def prettyName: String = "fp_bits"

  override protected def nullSafeEval(input: Any): Any =
    AudioFp.fpBits(input.asInstanceOf[ArrayData], fromBit)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioFp.fpBits($c, $fromBit)")

  override protected def withNewChildInternal(newChild: Expression): FpBits =
    copy(child = newChild)
}

/** `sub_fingerprints(e, hop)` — array<struct<w int, lo bigint, hi bigint>>. */
case class SubFingerprints(child: Expression, hopFrames: Int)
    extends UnaryExpression {

  require(hopFrames >= 1, s"hopFrames must be >= 1, got $hopFrames")

  override def checkInputDataTypes(): TypeCheckResult =
    AudioFp.requireLongArray(child, prettyName)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", IntegerType, nullable = false),
      StructField("lo", LongType, nullable = false),
      StructField("hi", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sub_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    AudioFp.subFingerprints(input.asInstanceOf[ArrayData], hopFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AudioFp.subFingerprints($c, $hopFrames)")

  override protected def withNewChildInternal(newChild: Expression): SubFingerprints =
    copy(child = newChild)
}
