package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a `TypedImperativeAggregate` — the
  * deepest custom-aggregation surface Catalyst offers: an arbitrary JVM
  * buffer with explicit serialize/merge, run by Spark as an ordinary
  * partial+final aggregation (map-side combine, spill-safe shuffle of
  * `k`-entry summaries instead of full frequency tables).
  *
  * Guarantees (Misra & Gries 1982): with capacity `k`, every reported
  * count is an UNDERCOUNT by at most n/(k+1) (n = stream length), and any
  * term with true frequency > n/(k+1) is guaranteed present. When the
  * column's distinct cardinality is ≤ k the summary never decrements and
  * the counts are EXACT — which is what the DuckDB oracle checks; the
  * error bound on >k cardinalities is pinned by a spec.
  *
  * This is the 100 TB "top terms" path: per group, state is k entries —
  * independent of data volume — where an exact `GROUP BY term` would
  * shuffle the whole vocabulary.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k => buf.update(key, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros — this is
        // what buys the n/(k+1) bound; amortized O(1) per item (each
        // decrement pass cancels k prior increments)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key2 =>
          val c = buf(key2) - 1
          if (c == 0) dead += key2 else buf.update(key2, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key2, c) =>
      buf.update(key2, buf.getOrElse(key2, 0L) + c)
    }
    if (buf.size > k) {
      // standard MG merge (Agarwal et al. 2013): subtract the (k+1)-th
      // largest count from everything, keep the positive remainder —
      // error bounds add across merged summaries
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key2 =>
        val c = buf(key2) - cut
        if (c <= 0) dead += key2 else buf.update(key2, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic output order: count desc, term asc
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {

  /** Column builder: `heavyHitters($"term", k)` aggregate. */
  def heavyHitters(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    graft.internal.Cols.of(
      MisraGries(graft.internal.Cols.expressionOf(c), k).toAggregateExpression())
}
