package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: fill calendar gaps in a per-key daily
  * series and carry the last observed value forward — the resample step
  * before any rolling-window feature or forecast over sparse event data.
  *
  * Scale shape: one aggregation to per-key (min, max) bounds, a
  * `sequence` + `explode` generator to the dense calendar (no driver
  * loop, no cross join against a global calendar — each key only
  * generates ITS OWN range), a left join back to the observations, and
  * one carry-forward window pass (`last(ignoreNulls)`, O(1) state per
  * partition). Both the join and the window shuffle on the key — AQE
  * coalesces the tiny calendar side.
  */
object GapFill {

  /** @return (keyCol, dayCol, <valCol>_filled, is_gap) — one row per key
    *         per calendar day between that key's first and last
    *         observation; `is_gap` marks days with no observed row.
    */
  def forwardFillDaily(
      df: DataFrame,
      keyCol: String,
      dayCol: String,
      valCol: String): DataFrame = {
    val cal = df.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
      .select(
        col(keyCol),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(df, Seq(keyCol, dayCol), "left")
      .select(
        col(keyCol),
        col(dayCol),
        last(col(valCol), ignoreNulls = true).over(w).as(s"${valCol}_filled"),
        col(valCol).isNull.as("is_gap"))
  }
}
