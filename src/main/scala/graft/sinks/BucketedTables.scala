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

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (sortCol match {
      case Some(s) => w.sortBy(s)
      case None => w
    }).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
