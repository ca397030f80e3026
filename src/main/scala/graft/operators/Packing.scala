package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Greedy sequence packing: assign ordered documents to fixed-capacity
  * bins (the training-batch "sequence packing" step — concatenate docs
  * up to the context length, start a new pack when the next doc would
  * overflow). First-fit in arrival order, no splitting: a document larger
  * than the capacity gets a bin of its own.
  *
  * Scale design (100 TB): same shape as [[Allocation.greedy]] — one hash
  * shuffle on the group key, a partition-local sort, then a streaming
  * O(1)-state pass. Packing is sequential WITHIN a group (that is its
  * semantics — pack order must be deterministic for reproducible
  * training); parallelism comes from packing groups (language, shard,
  * source bucket) independently. For a single giant group, pre-shard by
  * `hashBucket(id)` into synthetic subgroups first — packs stay valid,
  * only pack boundaries differ.
  */
object Packing {

  /** Appends `binCol`: the 0-based pack index within `groupCol`.
    *
    * @param groupCol  independent packing domains (e.g. lang, shard)
    * @param sizeCol   numeric size (token count); null/negative ⇒ 0
    * @param orderCols deterministic total order within a group
    * @param capacity  pack capacity in the same unit as sizeCol
    */
  def greedyPack(
      df: DataFrame,
      groupCol: String,
      sizeCol: String,
      orderCols: Seq[String],
      capacity: Long,
      binCol: String = "bin"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val si = df.schema.fieldIndex(sizeCol)
    SortedGroupFold.appendColumn(df, groupCol, orderCols, binCol, LongType) {
      () => new SortedGroupFold.Fold {
        // O(1) state: (bin index, used capacity) of the current group
        private var bin = 0L
        private var used = 0L
        private def sz(r: Row): Long =
          if (r.isNullAt(si)) 0L
          else math.max(0L, r.get(si).asInstanceOf[Number].longValue())
        override def start(r: Row): Unit = { bin = 0L; used = -1L }
        override def next(r: Row): Any = {
          val s = sz(r)
          if (used < 0L) used = s // first row of the group
          else if (used + s > capacity) { bin += 1L; used = s }
          else used += s
          bin
        }
      }
    }
  }
}
