package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks up values from the most
  * recent right row with the same key and `right.time <= left.time`
  * (inclusive) — the temporal join every feature/training pipeline needs
  * ("state of X as of this event").
  *
  * Spark has no native ASOF operator; the classic distributed
  * formulation used here is union + carry-forward window:
  * tag sides, union on (key, time), and `last(value, ignoreNulls)` over
  * `(partitionBy key orderBy time, side) rowsBetween(-∞, current)` drags
  * each right value forward to the left rows that follow it. ONE shuffle
  * on the key (same as any sort-merge as-of), no range explosion, state
  * is O(1) per partition during the window scan — this survives 100 TB
  * wherever a plain windowed aggregation does.
  *
  * Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1),
  * giving the inclusive `<=` semantics. Among right rows tied on
  * (key, time), the greatest `rightTiebreak` wins — pass one to make
  * results deterministic when such ties are possible.
  */
object AsOfJoin {

  /** @param carry right-side columns to attach (prefixed `asof_`) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      carry: Seq[String],
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    require(carry.nonEmpty)
    val l = left.withColumn("__side", lit(1))
    // ALL carry columns ride in ONE struct: a single last(ignoreNulls)
    // picks the whole struct from the winning right row, so the output
    // never mixes fields from different right rows (a per-column
    // last() would skip a NULL field of the newest row and fill it from
    // an older one). The struct itself is non-null for every right row
    // even when all its fields are null.
    val r = right
      .select((Seq(col(keyCol), col(timeCol),
        struct(carry.map(c => col(c).as(c)): _*).as("__asof_carry")) ++
        rightTiebreak.map(c => col(c).as(s"__tb_$c"))): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val order = (Seq(col(timeCol).asc, col("__side").asc) ++
      rightTiebreak.map(c => col(s"__tb_$c").asc_nulls_first)) // left rows (null tb) unaffected: side already separates them
    val w = Window.partitionBy(col(keyCol))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(
      "__asof_carry", last(col("__asof_carry"), ignoreNulls = true).over(w))
    val expanded = carry.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("__asof_carry").getField(c))
    }
    expanded
      .filter(col("__side") === 1)
      .drop("__side", "__asof_carry")
      .drop(rightTiebreak.map(c => s"__tb_$c"): _*)
  }
}
