package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native vector×matrix kernels for the ANN operators. Both expressions
  * carry their (small) matrix as a flattened `Array[Double]` case-class
  * field — it ships with the serialized plan and lands in generated code
  * as one reference object — and fuse all dot products into a single
  * codegen'd pass over the row's vector. The higher-order-function
  * formulation they replace dispatches an interpreted lambda per element
  * per plane (see MinHashSig scaladoc for the measured cliff).
  */
private[graft] trait VecMatExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.catalogString}")
  }
  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `NearestCells(vec, cells, n)` → the ids (0-based) of the `n` cells
  * with the highest `dot(vec, centroid) − ‖centroid‖²/2` — i.e. the n
  * nearest centroids under Euclidean distance (argmin ‖v−c‖² ⇔ that
  * argmax; the v-norm term is constant per row). Ties break toward the
  * lower cell id. `cells` rows are laid out `[c₀…c_{dim−1}, ‖c‖²/2]`,
  * flattened row-major with stride `dim+1`.
  */
case class NearestCells(child: Expression, cellsFlat: Array[Double], stride: Int, n: Int)
    extends VecMatExpression {

  require(stride >= 2 && cellsFlat.length % stride == 0 && n >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], isFloat, cellsFlat, stride, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellsFlat", cellsFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCells.compute($c, $isFloat, $ref, $stride, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(v: ArrayData, vFloat: Boolean, flat: Array[Double], stride: Int, n: Int): ArrayData = {
    val dim = stride - 1
    val k = flat.length / stride
    val m = math.min(v.numElements(), dim)
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * stride
      var dot = 0.0
      var j = 0
      while (j < m) {
        val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * flat(base + j)
        j += 1
      }
      val s = dot - flat(base + dim)
      // NaN (from a NaN vector component or centroid) sorts below every
      // real score instead of poisoning the > comparisons below
      scores(c) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      c += 1
    }
    // selection of the top n indices (k is small — 8..256 cells)
    val nn = math.min(n, k)
    val out = new Array[Int](nn)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < nn) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        // best == -1 seeds with the first untaken cell, so an all
        // -Infinity round (every score NaN) still picks a valid index
        if (!taken(i) && (best == -1 || scores(i) > bestScore)) {
          best = i; bestScore = scores(i)
        }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: centroids → flattened [c…, ‖c‖²/2] rows. */
  def toCol(vec: org.apache.spark.sql.Column, centroids: Array[Array[Double]], n: Int): org.apache.spark.sql.Column = {
    val dim = centroids.head.length
    val flat = new Array[Double](centroids.length * (dim + 1))
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * (dim + 1), dim)
      flat(i * (dim + 1) + dim) = centroids(i).map(x => x * x).sum / 2
      i += 1
    }
    graft.internal.Cols.of(
      NearestCells(graft.internal.Cols.expressionOf(vec), flat, dim + 1, n))
  }
}

/** `LshBuckets(vec, planes, numTables, bits)` → one sign-pattern bucket id
  * per hash table: bucket_t = Σ_{i<bits} [dot(vec, plane_{t·bits+i}) ≥ 0]·2^i.
  * `planes` is `numTables·bits` hyperplanes of `dim` components, flattened
  * row-major. All `numTables·bits` dot products run in one fused pass.
  */
case class LshBuckets(child: Expression, planesFlat: Array[Double], dim: Int, numTables: Int, bits: Int)
    extends VecMatExpression {

  require(dim >= 1 && bits >= 1 && numTables >= 1 &&
    planesFlat.length == numTables * bits * dim && bits <= 62)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], isFloat, planesFlat, dim, numTables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.compute($c, $isFloat, $ref, $dim, $numTables, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(v: ArrayData, vFloat: Boolean, flat: Array[Double], dim: Int, numTables: Int, bits: Int): ArrayData = {
    val m = math.min(v.numElements(), dim)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0.0
        var j = 0
        while (j < m) {
          val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
          dot += x * flat(base + j)
          j += 1
        }
        if (dot >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder over seeded hyperplane tables (same generator as
    * [[graft.operators.Similarity.hyperplanes]] — table t uses seed+t, so
    * buckets are bit-identical to the per-table HOF formulation).
    */
  def toCol(
      vec: org.apache.spark.sql.Column,
      planes: Array[Array[Double]],
      dim: Int,
      numTables: Int,
      bits: Int): org.apache.spark.sql.Column = {
    require(planes.length == numTables * bits && planes.forall(_.length == dim))
    val flat = new Array[Double](numTables * bits * dim)
    var i = 0
    while (i < planes.length) {
      System.arraycopy(planes(i), 0, flat, i * dim, dim)
      i += 1
    }
    graft.internal.Cols.of(
      LshBuckets(graft.internal.Cols.expressionOf(vec), flat, dim, numTables, bits))
  }
}
