package graft.pipeline

import org.apache.spark.sql.SparkSession

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** CLI runner for the candy-store pipeline — the analogue of the
  * reference's `main.py` entry point (reference main.py:141-205).
  *
  * Usage: CandyRun <dataDir> <outputDir> <startDate yyyyMMdd> <endDate yyyyMMdd>
  *
  * With NO arguments, configuration comes from the reference-shaped
  * environment variables instead (see [[CandyConfig]] / reference
  * .env.example) — a reference deployment's env carries over unchanged.
  */
object CandyRun {
  def main(args: Array[String]): Unit = {
    require(
      args.isEmpty || args.length == 4,
      "usage: CandyRun [<dataDir> <outputDir> <startDate yyyyMMdd> <endDate yyyyMMdd>] " +
        "(no args: configure from environment)")
    val cfg =
      if (args.isEmpty) CandyConfig.fromEnv()
      else {
        val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
        CandyConfig.fromEnv(Map.empty).copy(
          dataDir = args(0),
          outputPath = args(1),
          startDate = LocalDate.parse(args(2), fmt),
          endDate = LocalDate.parse(args(3), fmt))
      }
    val (dataDir, outputDir, start, end) =
      (cfg.dataDir, cfg.outputPath, cfg.startDate, cfg.endDate)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .appName("candy-store-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val result = new CandyPipeline(
      spark, dataDir, outputDir, start, end,
      reloadInventoryDaily = cfg.reloadInventoryDaily).run()
    println(s"order_line_items: ${result.orderLineItems.count()} rows")
    println(s"products_updated: ${result.productsUpdated.count()} rows")
    println(s"orders:           ${result.orders.count()} rows")
    println(s"daily_summary:    ${result.dailySummary.count()} rows")
    println(s"forecast:         ${result.forecast.count()} rows")
    println(s"cancelled lines:  ${result.cancelledLines}")
    spark.stop()
  }
}
