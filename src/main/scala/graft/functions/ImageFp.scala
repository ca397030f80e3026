package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd kernels for the perceptual image hash
  * ([[graft.operators.ImageHash]]) — the image half of the r16
  * "Not yet optimized #2" item, same rationale as [[AudioFp]]: the
  * interpreted HOF spellings dispatch a lambda per grid cell × per
  * block pixel (gridReduce walks W·H pixels through three nested
  * interpreted lambdas), these run the identical integer arithmetic in
  * one fused JVM pass inside whole-stage codegen. Bit-identical on
  * every reachable input: `ImageHashSpec` pins aHash/dHash/gridReduce
  * against independent references and the loud-input contract keeps
  * its message verbatim.
  */
object ImageFp {

  /** Σ gray (the integer mean gate's right side). */
  def graySum(gray: ArrayData): Long = {
    val n = gray.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += gray.getInt(i); i += 1 }
    s
  }

  /** 32 aHash bits from `fromBit`: bit (j − fromBit) = gray(j)·64 > tot. */
  def aHashBits(gray: ArrayData, tot: Long, fromBit: Int): Long = {
    if (gray.numElements() < 64) {
      throw new IllegalStateException(
        s"ImageHash.aHash: need a 64-cell grid, got ${gray.numElements()}")
    }
    var r = 0L
    var j = fromBit
    val end = fromBit + 32
    while (j < end) {
      if (gray.getInt(j).toLong * 64L > tot) r |= 1L << (j - fromBit)
      j += 1
    }
    r
  }

  /** 56 dHash gradient bits: bit k = p(r,c) < p(r,c+1), k = r·7 + c. */
  def dHash(gray: ArrayData): Long = {
    if (gray.numElements() < 64) {
      throw new IllegalStateException(
        s"ImageHash.dHash: need a 64-cell grid, got ${gray.numElements()}")
    }
    var r = 0L
    var k = 0
    while (k < 56) {
      val base = (k / 7) * 8 + (k % 7)
      if (gray.getInt(base) < gray.getInt(base + 1)) r |= 1L << k
      k += 1
    }
    r
  }

  /** Block-floor-mean W×H → 8×8 grid reduction (integer-exact; cell
    * (r, c) averages rows [⌊r·H/8⌋, ⌊(r+1)·H/8⌋) × cols
    * [⌊c·W/8⌋, ⌊(c+1)·W/8⌋)). Message text kept verbatim from the HOF
    * spelling — `ImageHashSpec` matches on it.
    */
  def gridReduce(gray: ArrayData, width: Int, height: Int): ArrayData = {
    val n = gray.numElements()
    if (width < 8 || height < 8 || n != width * height) {
      throw new IllegalStateException(
        "ImageHash.gridReduce: need width,height >= 8 and size(gray) = " +
          s"width*height, got (${width}x$height, $n pixels)")
    }
    val out = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val r0 = (k / 8) * height / 8
      val r1 = ((k / 8) + 1) * height / 8
      val c0 = (k % 8) * width / 8
      val c1 = ((k % 8) + 1) * width / 8
      var s = 0L
      var rr = r0
      while (rr < r1) {
        val rowBase = rr * width
        var cc = c0
        while (cc < c1) { s += gray.getInt(rowBase + cc); cc += 1 }
        rr += 1
      }
      out(k) = (s / ((r1 - r0).toLong * (c1 - c0))).toInt
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `gray_sum(gray)` — Σ of the gray values as bigint. */
case class GraySum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    AudioFp.requireIntArray(child, prettyName)

  override def dataType: DataType = LongType
  override def prettyName: String = "gray_sum"

  override protected def nullSafeEval(input: Any): Any =
    ImageFp.graySum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageFp.graySum($c)")

  override protected def withNewChildInternal(newChild: Expression): GraySum =
    copy(child = newChild)
}

/** `ahash_bits(gray, tot, fromBit)` — 32 packed mean-gate bits. */
case class AHashBits(left: Expression, right: Expression, fromBit: Int)
    extends BinaryExpression {

  require(fromBit == 0 || fromBit == 32, s"fromBit must be 0 or 32, got $fromBit")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "ahash_bits"

  override protected def nullSafeEval(gray: Any, tot: Any): Any =
    ImageFp.aHashBits(gray.asInstanceOf[ArrayData], tot.asInstanceOf[Long], fromBit)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) =>
      s"graft.functions.ImageFp.aHashBits($g, $t, $fromBit)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AHashBits =
    copy(left = newLeft, right = newRight)
}

/** `dhash56(gray)` — 56 packed gradient bits. */
case class DHash56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    AudioFp.requireIntArray(child, prettyName)

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash56"

  override protected def nullSafeEval(input: Any): Any =
    ImageFp.dHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageFp.dHash($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash56 =
    copy(child = newChild)
}

/** `grid_reduce(gray, width, height)` — W×H → 8×8 block-floor-mean. */
case class GridReduce(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (g, w, h) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int, int), got " +
          s"(${g.catalogString}, ${w.catalogString}, ${h.catalogString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "grid_reduce"

  override protected def nullSafeEval(gray: Any, w: Any, h: Any): Any =
    ImageFp.gridReduce(
      gray.asInstanceOf[ArrayData], w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w, h) =>
      s"graft.functions.ImageFp.gridReduce($g, $w, $h)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GridReduce =
    copy(first = newFirst, second = newSecond, third = newThird)
}
