package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located, shuffle-free joins — the third
  * join strategy in the 100 TB toolbox after broadcast (small dims) and
  * AQE skew handling: when two big fact tables are repeatedly joined on
  * the same key, write both bucketed by that key and Spark joins them
  * with ZERO exchanges (each bucket pair joins locally).
  *
  * Bucketing requires the table catalog (`saveAsTable`) — the bucket
  * spec lives in catalog metadata, not the parquet files.
  */
object BucketedTables {

  /** @param path when set, the table is EXTERNAL with its data at `path`
    *              (keeps bench/test layouts out of the session's
    *              warehouse directory); when None, it is managed.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None,
      path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    // one file per bucket: Spark only plans bucket-sorted reads (no Sort
    // before a sort-merge join) when each bucket holds a single file —
    // without this repartition every input partition writes its own
    // per-bucket file and the sortBy metadata is silently unusable
    val byBucket = df.repartition(numBuckets, df.col(bucketCol))
    val w = byBucket.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    val wp = path match {
      case Some(p) => w.option("path", p)
      case None => w
    }
    (sortCol match {
      case Some(s) => wp.sortBy(s)
      case None => wp
    }).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
