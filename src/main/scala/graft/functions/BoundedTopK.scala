package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a `TypedImperativeAggregate`: per group, keep the k
  * (key, ord) pairs with the highest ord (ties broken toward the
  * SMALLER key, so the result is deterministic under any input order).
  *
  * This is the scale-correct spelling of "top 3 per group": a window
  * `row_number` must SORT every row of every partition (full sort
  * shuffle of the fact table), while this aggregate ships k-entry
  * buffers through an ordinary partial+final aggregation — map-side
  * combine reduces each partition to k rows per group before anything
  * shuffles, and memory per group is O(k) regardless of group size.
  * `WarehouseQueriesSpec` pins result-equality against the window
  * formulation; the q112 oracle hash-checks it against DuckDB.
  */
case class BoundedTopK(
    key: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  require(k >= 1, "bounded_top_k needs k >= 1")

  override def children: Seq[Expression] = Seq(key, ord)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("ord", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): TypeCheckResult = (key.dataType, ord.dataType) match {
    case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (kt, ot) => TypeCheckResult.TypeCheckFailure(
      s"bounded_top_k requires (bigint, double), got (${kt.catalogString}, ${ot.catalogString})")
  }

  /** Heap ordering puts the WORST retained entry on top (smallest ord;
    * ties: largest key), so replacing the evictable element is O(log k).
    */
  private val worstFirst: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
    def compare(a: (Long, Double), b: (Long, Double)): Int = {
      val byOrd = java.lang.Double.compare(b._2, a._2) // smaller ord = larger
      if (byOrd != 0) byOrd else java.lang.Long.compare(a._1, b._1) // larger key = larger
    }
  }

  /** True if `cand` beats the current worst `top` (strictly better ord,
    * or equal ord with smaller key).
    */
  private def beats(cand: (Long, Double), top: (Long, Double)): Boolean =
    cand._2 > top._2 || (cand._2 == top._2 && cand._1 < top._1)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Long, Double)],
      e: (Long, Double)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (beats(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, Double)],
      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val kv = key.eval(input)
    val ov = ord.eval(input)
    if (kv != null && ov != null) {
      offer(buf, (kv.asInstanceOf[Long], ov.asInstanceOf[Double]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Double)],
      other: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any = {
    // best-first output: ord desc, key asc
    val arr = buf.toArray.sortBy { case (kk, oo) => (-oo, kk) }
    new GenericArrayData(arr.map { case (kk, oo) => InternalRow(kk, oo) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, oo) => out.writeLong(kk); out.writeDouble(oo) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((in.readLong(), in.readDouble())); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(key = newChildren(0), ord = newChildren(1))
}

object BoundedTopK {

  /** Column builder: `topKBy($"id", $"score", 3)` aggregate — array of
    * (key, ord) structs, best first.
    */
  def topKBy(key: org.apache.spark.sql.Column, ord: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    graft.internal.Cols.of(
      BoundedTopK(
        graft.internal.Cols.expressionOf(key),
        graft.internal.Cols.expressionOf(ord),
        k).toAggregateExpression())
}
