package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming variant of the greedy inventory allocator (SURVEY.md §7.4.6):
  * the same per-key fold as [[graft.operators.Allocation.greedy]], with
  * remaining capacity held in the streaming state store instead of a
  * partition-local variable — so allocation continues correctly across
  * micro-batches (the reference's "inventory carries over across days",
  * re-expressed as stream state).
  *
  * Within one batch, a key's rows are ordered by `seq`; across batches,
  * arrival order is batch order — matching the reference's day-major
  * processing (one day per micro-batch under the Airflow-shaped runner).
  */
object AllocationStreaming {

  /** Input line: capacity rides on every row (join your dimension before
    * grouping); `seq` is the deterministic within-batch order.
    */
  final case class AllocLine(key: Long, seq: Long, qty: Double, cap: Double)
  final case class AllocResult(key: Long, seq: Long, qty: Double, alloc_qty: Double)
  final case class StockState(remaining: Double)

  implicit private val lineEnc: org.apache.spark.sql.Encoder[AllocLine] = Encoders.product[AllocLine]
  implicit private val resEnc: org.apache.spark.sql.Encoder[AllocResult] = Encoders.product[AllocResult]
  implicit private val stEnc: org.apache.spark.sql.Encoder[StockState] = Encoders.product[StockState]
  implicit private val keyEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong

  def greedy(lines: Dataset[AllocLine]): Dataset[AllocResult] =
    lines
      .groupByKey((l: AllocLine) => l.key)
      .flatMapGroupsWithState[StockState, AllocResult](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[StockState]) =>
          val sorted = rows.toSeq.sortBy(_.seq)
          var remaining = state.getOption
            .map(_.remaining)
            .getOrElse(sorted.headOption.map(_.cap).getOrElse(0.0))
          val out = sorted.map { l =>
            val alloc =
              if (l.qty > 0 && l.qty <= remaining) { remaining -= l.qty; l.qty }
              else 0.0
            AllocResult(key, l.seq, l.qty, alloc)
          }
          state.update(StockState(remaining))
          out.iterator
      }
}
