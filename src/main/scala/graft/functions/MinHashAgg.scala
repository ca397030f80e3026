package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Group-level MinHash signature as a typed `Aggregator` (the UDAF
  * surface of SURVEY §2.10): aggregates per-document signatures into one
  * signature for the WHOLE group by element-wise minimum — mathematically
  * exact, because min-of-mins over documents equals the MinHash of the
  * union of their shingle sets.
  *
  * Use: estimate Jaccard similarity BETWEEN corpora/sources/partitions
  * ("how much does crawl A overlap crawl B?") without materializing any
  * shingle sets — each group reduces to k longs. Associative and
  * commutative ⇒ Spark runs it as partial+final aggregation with
  * map-side combine; k·8 bytes of state per group.
  */
class MinHashAgg(numHashes: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(acc: Array[Long], sig: Array[Long]): Array[Long] = {
    // null signature (e.g. from minhash_sig over a NULL text) contributes
    // nothing; a short signature is a caller error worth a clear message
    if (sig == null) return acc
    require(
      sig.length >= numHashes,
      s"signature has ${sig.length} slots, aggregator expects $numHashes")
    var i = 0
    while (i < numHashes) {
      if (sig(i) < acc(i)) acc(i) = sig(i)
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(acc: Array[Long]): Array[Long] = acc

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {

  /** Column form: aggregate a signature column (array<bigint>, e.g. from
    * `minhash_sig`) into the group-union signature.
    */
  def unionSignature(numHashes: Int): org.apache.spark.sql.TypedColumn[Array[Long], Array[Long]] =
    new MinHashAgg(numHashes).toColumn
}
