package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** CLI runner for the candy-store pipeline — the analogue of the
  * reference's `main.py` entry point (reference main.py:141-205).
  *
  * Usage: CandyRun <dataDir> <outputDir> <startDate yyyyMMdd> <endDate yyyyMMdd>
  *
  * Configuration always starts from the reference-shaped environment
  * variables (see [[CandyConfig]] / reference .env.example); positional
  * arguments, when given, override ONLY the paths and date range —
  * behavioural env flags like `RELOAD_INVENTORY_DAILY` stay effective
  * either way.
  */
object CandyRun {
  def main(args: Array[String]): Unit = {
    require(
      args.isEmpty || args.length == 4,
      "usage: CandyRun [<dataDir> <outputDir> <startDate yyyyMMdd> <endDate yyyyMMdd>] " +
        "(no args: configure fully from environment)")
    val base = CandyConfig.fromEnv()
    val cfg =
      if (args.isEmpty) base
      else {
        val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
        base.copy(
          dataDir = args(0),
          outputPath = args(1),
          startDate = LocalDate.parse(args(2), fmt),
          endDate = LocalDate.parse(args(3), fmt))
      }

    val spark = graft.GraftSession.builder(
      master = sys.env.getOrElse(
        "SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .appName("candy-store-etl")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val result = CandyPipeline.fromConfig(spark, cfg).run()
    println(s"order_line_items: ${result.orderLineItems.count()} rows")
    println(s"products_updated: ${result.productsUpdated.count()} rows")
    println(s"orders:           ${result.orders.count()} rows")
    println(s"daily_summary:    ${result.dailySummary.count()} rows")
    println(s"forecast:         ${result.forecast.count()} rows")
    println(s"cancelled lines:  ${result.cancelledLines}")
    spark.stop()
  }
}
