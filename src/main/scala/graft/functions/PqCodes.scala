package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_codes(vec)` — product-quantization code assignment against a
  * fixed codebook (Jégou et al., TPAMI 2011): subspace `j`'s code is the
  * argmin-squared-L2 centroid over components `[j·dim/m, (j+1)·dim/m)`,
  * first-wins on exact ties (positions ascend in code order, matching
  * the oracle's `ORDER BY d, c`).
  *
  * Native expression for the same reason as [[MinHashSig]]: the
  * higher-order-function spelling (`transform(sequence, j →
  * aggregate(...argmin...))`) evaluates its lambdas interpreted, per
  * element — m×ks×subDim frames per row put q123's encode pass at 26 s
  * for 2,000 rows; this one static call does the identical float work in
  * tight loops inside whole-stage codegen, in milliseconds. Summation
  * order (ascending component index) is preserved exactly, so results
  * are bit-identical to the HOF spelling and the DuckDB oracle.
  *
  * The codebook is a constructor field (Seq-of-Seq, not Array — see
  * [[AhoMatches]]: array fields compare by reference and would defeat
  * canonicalization/CSE), converted once to a primitive matrix for eval
  * and shipped in the plan as a reference object.
  */
case class PqCodes(child: Expression, centroids: Seq[Seq[Double]], m: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty && m > 0, "pq_codes needs centroids and m > 0")
  require(centroids.head.length % m == 0,
    s"dim ${centroids.head.length} must split evenly into $m subspaces")

  private val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  // default case-class toString would embed the full codebook (ks×dim
  // doubles) into every plan dump and log line
  override def toString: String =
    s"$prettyName($child, cents=${centroids.size}x${centroids.head.length}, m=$m)"

  override protected def nullSafeEval(input: Any): Any =
    PqCodes.compute(input.asInstanceOf[ArrayData].toDoubleArray(), cents, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqCodes.compute($c.toDoubleArray(), $ref, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  def compute(v: Array[Double], cents: Array[Array[Double]], m: Int): ArrayData = {
    val sub = v.length / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      // seed from centroid 0, not a sentinel: with a NaN/overflowed
      // component every comparison is false and a -1 sentinel would
      // escape into pq_adc's lookup (out-of-bounds). Seeding keeps the
      // first centroid — which is also what the oracle's all-NaN
      // tie-break (ORDER BY d, c) resolves to.
      val c0 = cents(0)
      var s0 = 0.0
      var i0 = base
      val end0 = base + sub
      while (i0 < end0) { val d = v(i0) - c0(i0); s0 += d * d; i0 += 1 }
      var best = s0
      var bp = 0
      var p = 1
      while (p < cents.length) {
        val cv = cents(p)
        var s = 0.0
        var i = base
        val end = base + sub
        while (i < end) { val d = v(i) - cv(i); s += d * d; i += 1 }
        if (s < best) { best = s; bp = p }
        p += 1
      }
      out(j) = bp
      j += 1
    }
    new GenericArrayData(out)
  }

  def toCol(vec: org.apache.spark.sql.Column, centroids: Seq[Seq[Double]], m: Int): org.apache.spark.sql.Column =
    graft.internal.Cols.of(
      PqCodes(graft.internal.Cols.expressionOf(vec), centroids.toList, m))
}

/** `pq_lut(vec)` — a query's ADC lookup table: `lut[j][p]` is the squared
  * L2 between the query's subspace-`j` components and centroid `p`'s.
  * Built once per query row; same summation order as [[PqCodes]] and the
  * oracle. (The HOF spelling of this table is a ~m×ks×subDim-node
  * expression tree — big enough that Janino compilation dominated q123's
  * runtime; the native call keeps the plan tree one node.)
  */
case class PqLut(child: Expression, centroids: Seq[Seq[Double]], m: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty && m > 0, "pq_lut needs centroids and m > 0")
  require(centroids.head.length % m == 0,
    s"dim ${centroids.head.length} must split evenly into $m subspaces")

  private val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override def toString: String =
    s"$prettyName($child, cents=${centroids.size}x${centroids.head.length}, m=$m)"

  override protected def nullSafeEval(input: Any): Any =
    PqLut.compute(input.asInstanceOf[ArrayData].toDoubleArray(), cents, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqLut.compute($c.toDoubleArray(), $ref, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {

  def compute(v: Array[Double], cents: Array[Array[Double]], m: Int): ArrayData = {
    val sub = v.length / m
    val rows = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val d = new Array[Double](cents.length)
      var p = 0
      while (p < cents.length) {
        val cv = cents(p)
        var s = 0.0
        var i = base
        val end = base + sub
        while (i < end) { val t = v(i) - cv(i); s += t * t; i += 1 }
        d(p) = s
        p += 1
      }
      rows(j) = new GenericArrayData(d)
      j += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  def toCol(vec: org.apache.spark.sql.Column, centroids: Seq[Seq[Double]], m: Int): org.apache.spark.sql.Column =
    graft.internal.Cols.of(
      PqLut(graft.internal.Cols.expressionOf(vec), centroids.toList, m))
}

/** `pq_residual(vec, cell)` — `vec − centroids[cell]`, the IVF residual
  * (encode and search both quantize the offset from the assigned coarse
  * centroid, the variance-killing trick of Jégou §IV). A native
  * expression for the same reason as [[PqLut]]: the `zip_with`/`typedlit`
  * spelling embeds the cells×dim centroid matrix as a LITERAL in the
  * plan — bloating every plan dump and the broadcast task binary —
  * where this ships it once as a reference object.
  */
case class PqResidual(left: Expression, right: Expression, centroids: Seq[Seq[Double]])
    extends BinaryExpression {

  require(centroids.nonEmpty, "pq_residual needs centroids")

  private val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, int), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_residual"

  override def toString: String =
    s"$prettyName($left, $right, cents=${centroids.size}x${centroids.head.length})"

  override protected def nullSafeEval(vec: Any, cell: Any): Any =
    PqResidual.compute(
      vec.asInstanceOf[ArrayData].toDoubleArray(), cell.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "double[][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqResidual.compute($v.toDoubleArray(), $c, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidual =
    copy(left = newLeft, right = newRight)
}

object PqResidual {

  def compute(v: Array[Double], cell: Int, cents: Array[Array[Double]]): ArrayData = {
    val cv = cents(cell)
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i) - cv(i); i += 1 }
    new GenericArrayData(out)
  }

  def toCol(
      vec: org.apache.spark.sql.Column,
      cell: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    graft.internal.Cols.of(PqResidual(
      graft.internal.Cols.expressionOf(vec),
      graft.internal.Cols.expressionOf(cell),
      centroids.toList))
}

/** `pq_adc(lut, codes)` — asymmetric distance: Σⱼ lut[j][codes[j]], the
  * per-candidate cost of a PQ scan reduced to `m` table lookups. `lut`
  * is the query's m×ks squared-subspace-distance table (built once per
  * query), `codes` a corpus row's [[PqCodes]] output.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<int>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdc.compute(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqAdc.compute($l, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  def compute(lut: ArrayData, codes: ArrayData): Double = {
    var s = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      s += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  def toCol(lut: org.apache.spark.sql.Column, codes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.internal.Cols.of(PqAdc(
      graft.internal.Cols.expressionOf(lut),
      graft.internal.Cols.expressionOf(codes)))
}
