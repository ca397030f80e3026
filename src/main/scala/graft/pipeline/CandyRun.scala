package graft.pipeline

import org.apache.spark.sql.SparkSession

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** CLI runner for the candy-store pipeline — the analogue of the
  * reference's `main.py` entry point (reference main.py:141-205).
  *
  * Usage: CandyRun <dataDir> <outputDir> <startDate yyyyMMdd> <endDate yyyyMMdd>
  */
object CandyRun {
  def main(args: Array[String]): Unit = {
    require(
      args.length == 4,
      "usage: CandyRun <dataDir> <outputDir> <startDate yyyyMMdd> <endDate yyyyMMdd>")
    val Array(dataDir, outputDir, startS, endS) = args
    val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
    val start = LocalDate.parse(startS, fmt)
    val end = LocalDate.parse(endS, fmt)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .appName("candy-store-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val result = new CandyPipeline(spark, dataDir, outputDir, start, end).run()
    println(s"order_line_items: ${result.orderLineItems.count()} rows")
    println(s"products_updated: ${result.productsUpdated.count()} rows")
    println(s"orders:           ${result.orders.count()} rows")
    println(s"daily_summary:    ${result.dailySummary.count()} rows")
    println(s"forecast:         ${result.forecast.count()} rows")
    println(s"cancelled lines:  ${result.cancelledLines}")
    spark.stop()
  }
}
