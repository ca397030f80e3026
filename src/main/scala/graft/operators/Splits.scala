package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting / sampling for training pipelines.
  *
  * Every assignment derives from `md5(id)` — a pure function of the row's
  * key, so splits are reproducible across runs, clusters, engines and
  * data re-partitioning (unlike `rand()`-based splits, which change under
  * reshuffling and can't be reproduced by an external system). Any engine
  * with md5 can recompute the exact membership — the DuckDB oracles do.
  *
  * Scale: embarrassingly parallel (a per-row hash + comparison, no
  * shuffle, stays in whole-stage codegen); the split column is also a
  * natural partition column for the output layout.
  */
object Splits {

  /** Stable bucket in [0, buckets): first 8 hex digits of md5(id). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Adds a `split` column: train / val / test by hash bucket.
    * Percentages are integer slices of 100 buckets.
    */
  def trainValTest(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val b = hashBucket(col(idCol))
    df.withColumn(
      "split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic `keepPct`% sample (hash-gated filter, no shuffle). */
  def deterministicSample(df: DataFrame, idCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100)
    df.filter(hashBucket(col(idCol)) < keepPct)
  }

  /** Stratified deterministic sample: per-stratum keep percentage
    * (e.g. downsample boilerplate languages, keep all rare ones).
    * Strata absent from `pctByStratum` keep `defaultPct`.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < pct)
  }
}
