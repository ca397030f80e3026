package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `triangle_credits(ns, nd, src, dst)` — the per-node triangle credits
  * contributed by one oriented edge (src→dst) in edge-iterator triangle
  * counting: with W = N⁺(src) ∩ N⁺(dst) (both arrays SORTED ascending),
  * emits `[(src,|W|), (dst,|W|)] ++ [(w,1) | w ∈ W]`, or the empty array
  * when the edge closes no triangle (so a bare `explode` drops it — no
  * separate filter pass).
  *
  * Why an expression and not `array_intersect` + `transform` + `concat`:
  * the built-in chain costs ~70 µs/row here (hash-set allocation per row
  * in ArrayIntersect, then interpreted higher-order lambdas) — measured
  * 4–10× the entire query budget at 1.2M edges. This kernel is one
  * allocation-free merge walk over two sorted primitive arrays (the
  * adjacency build sorts once per NODE, the walk runs once per EDGE) and
  * participates in whole-stage codegen via a single static call.
  */
case class TriangleCredits(ns: Expression, nd: Expression, src: Expression, dst: Expression)
    extends QuaternaryExpression {

  override def first: Expression = ns
  override def second: Expression = nd
  override def third: Expression = src
  override def fourth: Expression = dst

  override def checkInputDataTypes(): TypeCheckResult =
    (ns.dataType, nd.dataType, src.dataType, dst.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>, bigint, bigint), got $t")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("part_id", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean =
    ns.nullable || nd.nullable || src.nullable || dst.nullable
  override def prettyName: String = "triangle_credits"

  override protected def nullSafeEval(a: Any, b: Any, s: Any, d: Any): Any =
    TriangleCredits.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      s.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s, d) =>
      s"${ev.value} = graft.functions.TriangleCredits.compute($a, $b, $s, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): TriangleCredits =
    copy(ns = newFirst, nd = newSecond, src = newThird, dst = newFourth)
}

object TriangleCredits {

  def toCol(
      ns: org.apache.spark.sql.Column, nd: org.apache.spark.sql.Column,
      src: org.apache.spark.sql.Column, dst: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.internal.Cols.of(TriangleCredits(
      graft.internal.Cols.expressionOf(ns), graft.internal.Cols.expressionOf(nd),
      graft.internal.Cols.expressionOf(src), graft.internal.Cols.expressionOf(dst)))

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Static entry point shared by interpreted eval and generated code.
    * Both inputs must be sorted ascending; the walk is O(|ns| + |nd|).
    */
  def compute(ns: ArrayData, nd: ArrayData, src: Long, dst: Long): ArrayData = {
    val n = ns.numElements()
    val m = nd.numElements()
    var i = 0
    var j = 0
    // first walk: just count, so the output array is sized exactly once
    var k = 0
    while (i < n && j < m) {
      val a = ns.getLong(i)
      val b = nd.getLong(j)
      if (a == b) { k += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    if (k == 0) return EMPTY
    val out = new Array[Any](k + 2)
    out(0) = InternalRow(src, k.toLong)
    out(1) = InternalRow(dst, k.toLong)
    i = 0; j = 0
    var c = 2
    while (i < n && j < m) {
      val a = ns.getLong(i)
      val b = nd.getLong(j)
      if (a == b) { out(c) = InternalRow(a, 1L); c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    new GenericArrayData(out)
  }
}
