package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (SQL `PERCENTILE_CONT` / DuckDB
  * `quantile_cont` semantics), formulated relationally instead of through
  * Spark's builtin `percentile` aggregate.
  *
  * The builtin buffers EVERY value of a group into an in-memory map on
  * the aggregation path — at sf0.1 (600k rows, 3 groups) that costs ~3 s
  * and at 100 TB it simply OOMs: per-group state grows with data volume.
  * This formulation's heavy operation is a partitioned SORT (row_number
  * window), which Spark runs out-of-core with radix/Tungsten sorting;
  * everything after the sort touches only O(groups × quantiles) rows
  * (the rest are filtered before the final aggregate). One shuffle for
  * the sort, one broadcast of per-group counts.
  *
  * Interpolation: with h = (n−1)·q, result = v⌊h⌋·(1−frac) + v⌈h⌉·frac —
  * algebraically DuckDB's v⌊h⌋ + (v⌈h⌉−v⌊h⌋)·frac; the two differ by at
  * most an ulp, absorbed by the oracle-side rounding helpers.
  */
object Quantiles {

  /** @param qs (outputColumn, quantile in [0,1]) pairs */
  def exactInterpolated(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 })
    val vals = df.select(col(keyCol), col(valCol).cast("double").as(valCol))
      .filter(col(valCol).isNotNull)
    // counts come from the UNfiltered frame (count(col) skips nulls), so
    // a group whose values are all NULL still has a row here (__n = 0)
    // and can be re-attached after the aggregate — PERCENTILE_CONT /
    // DuckDB quantile_cont return such groups with NULL quantiles,
    // not no row at all.
    val counts = df.groupBy(col(keyCol)).agg(count(col(valCol)).as("__n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
    val ranked = vals
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(counts), Seq(keyCol))

    def h(q: Double) = (col("__n") - 1).cast("double") * lit(q)
    def lo(q: Double) = floor(h(q)) + 1 // 1-based rank of the lower bracket
    def hi(q: Double) = ceil(h(q)) + 1
    def frac(q: Double) = h(q) - floor(h(q)).cast("double")

    val atQuantilePos = qs
      .map { case (_, q) => col("__rn") === lo(q) || col("__rn") === hi(q) }
      .reduce(_ || _)
    val aggs = qs.map { case (name, q) =>
      sum(
        when(col("__rn") === lo(q), col(valCol) * (lit(1.0) - frac(q)))
          .when(col("__rn") === hi(q), col(valCol) * frac(q))
          .otherwise(lit(0.0))).as(name)
    }
    val computed = ranked
      .filter(atQuantilePos)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
    // left join from the full group list: all-NULL groups (no ranked
    // rows) surface with NULL quantile columns. O(groups) rows.
    counts.select(col(keyCol)).join(computed, Seq(keyCol), "left")
  }

  /** The 100 TB path: Greenwald–Khanna sketch quantiles via Spark's
    * `percentile_approx` — single map-side-combinable pass, no global
    * sort, bounded sketch memory per group. `accuracy` is the GK
    * parameter (rank error ≤ 1/accuracy · n): 10000 ⇒ ±0.01% rank
    * error. Use [[exactInterpolated]] when bit-exact values are
    * required; this when the column is corpus-sized.
    */
  def approxSketch(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      qs: Seq[(String, Double)],
      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 })
    val aggs = qs.map { case (name, q) =>
      percentile_approx(
        col(valCol).cast("double"), lit(q), lit(accuracy)).as(name)
    }
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** [[approxSketch]] + the GK guarantee made checkable (the q70/q89
    * error-envelope pattern): each sketch quantile's TRUE rank is
    * re-counted against the data and asserted within ±ε·n of the target
    * rank (ε = 1/accuracy, plus one rank of definitional slack for the
    * inclusive/exclusive boundary). Output per group:
    * `(key, n_vals, <name>_ok...)` — all SQL-reproducible (the oracle
    * emits exact counts and literal TRUE), so the sketch path gets a
    * hard hash-checked oracle instead of a rows-only record.
    *
    * One extra pass over the data (the rank recount) — this is the
    * VERIFICATION shape; production uses [[approxSketch]] alone.
    */
  def approxSketchChecked(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      qs: Seq[(String, Double)],
      accuracy: Int = 10000): DataFrame = {
    val approx = approxSketch(df, keyCol, valCol, qs, accuracy)
    val vals = df
      .filter(col(valCol).isNotNull)
      .select(col(keyCol), col(valCol).cast("double").as("__v"))
    val eps = 1.0 / accuracy
    val counted = vals
      .join(broadcast(approx), Seq(keyCol)) // O(groups) rows broadcast
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_vals"),
        qs.flatMap { case (name, _) =>
          Seq(
            sum(when(col("__v") < col(name), 1L).otherwise(0L)).as(s"__lt_$name"),
            sum(when(col("__v") <= col(name), 1L).otherwise(0L)).as(s"__le_$name"))
        }: _*)
    val okCols = qs.map { case (name, q) =>
      val target = col("n_vals").cast("double") * q
      val slack = col("n_vals").cast("double") * eps + 1.0
      ((col(s"__lt_$name").cast("double") <= target + slack) &&
        (col(s"__le_$name").cast("double") >= target - slack)).as(s"${name}_ok")
    }
    counted.select(col(keyCol) +: col("n_vals") +: okCols: _*)
  }
}
