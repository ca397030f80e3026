package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-heavy scans. A small parquet input (one
  * file block) plans as 1–2 scan partitions, which serializes any
  * expensive per-row work (shingling, hashing) onto one core — the
  * classic small-SF bench cliff. At real scale the scan has thousands of
  * blocks and this is a no-op: the round-robin shuffle is only added
  * when the plan has FEWER partitions than cores, so a 100 TB input is
  * never re-shuffled.
  */
object Spread {

  /** `df`, round-robin repartitioned to `defaultParallelism` iff its
    * current plan has fewer partitions than that.
    */
  def ensure(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
