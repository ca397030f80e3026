package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** The shared skeleton of sequential per-group operators
  * ([[Allocation.greedy]], [[Packing.greedyPack]]): one hash shuffle on
  * the group key, a partition-local sort making each group contiguous
  * and ordered, then a streaming `mapPartitions` pass threading O(1)
  * mutable state through each group run — no group is ever buffered.
  *
  * Implementors supply a [[SortedGroupFold.Fold]]: `start(row)` is
  * called on the first row of every group (key-change detection uses
  * universal equality on the group column), then `next(row)` returns the
  * appended column's value for each row, first row included.
  */
object SortedGroupFold {

  trait Fold extends Serializable {
    /** Reset state at the first row of a group (the row is ALSO passed
      * to `next` immediately after).
      */
    def start(row: Row): Unit

    /** Value of the appended column for this row; mutate state as needed. */
    def next(row: Row): Any
  }

  /** Appends `outCol` (of `outType`, non-nullable) computed by a
    * streaming per-group fold over `df`, grouped by `groupCol` and
    * ordered by `orderCols` (must be a deterministic total order within
    * a group — include a tiebreaker).
    */
  def appendColumn(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      outCol: String,
      outType: DataType)(mkFold: () => Fold): DataFrame = {
    val sortCols = (groupCol +: orderCols).map(col)
    val parted = df
      .repartition(col(groupCol))
      .sortWithinPartitions(sortCols: _*)

    val inSchema = parted.schema
    val outSchema = inSchema.add(outCol, outType, nullable = false)
    val gi = inSchema.fieldIndex(groupCol)

    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    parted.mapPartitions { rows =>
      val fold = mkFold()
      var curKey: Any = null
      var started = false
      rows.map { r =>
        val k = r.get(gi)
        if (!started || k != curKey) {
          curKey = k
          started = true
          fold.start(r)
        }
        Row.fromSeq(r.toSeq :+ fold.next(r))
      }
    }
  }
}
