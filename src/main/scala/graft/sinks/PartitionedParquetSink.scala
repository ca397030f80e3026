package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Day-partitioned parquet layout — the 100 TB-scale counterpart of the
  * reference's "one MongoDB collection per day" (SURVEY.md §2.1 S1): a
  * `date=yyyyMMdd/` directory per day, so date filters become partition
  * pruning (no file even opened outside the range) and each day is
  * independently appendable/replaceable (`dynamic` partition overwrite).
  */
object PartitionedParquetSink {

  /** Write `df` partitioned by the date derived from `tsCol`.
    * `maxRecordsPerFile` bounds file sizes so a skewed day still splits
    * into parallel-scannable chunks.
    */
  def writeDayPartitioned(
      df: DataFrame,
      tsCol: String,
      path: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("date", date_format(col(tsCol), "yyyyMMdd"))
      .write
      .partitionBy("date")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Read back with a date-range filter that prunes at the partition
    * level (verify via `PartitionFilters` in `.explain`).
    */
  def readDayRange(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      startDay: String,
      endDay: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("date") >= startDay && col("date") <= endDay)
}
