package graft.pipeline

import graft.etl.CandyEtl
import graft.forecast.Forecaster
import graft.model.CandyModel.Money
import graft.sinks.SingleFileCsvSink
import graft.sources.CandySources
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import java.time.LocalDate

/** End-to-end candy-store pipeline (reference main.py:141-205, EP1→EP2→EP3),
  * producing the five reports of SURVEY.md §1.2 as single-file CSVs.
  *
  * Structural fixes over the reference, besides the distributed allocator:
  * every transaction day is read ONCE and persisted (the reference re-scans
  * MongoDB per day in both EP1 and EP2, data_processor.py:176,310-313), and
  * there is no per-day driver round-trip — the whole date range is one
  * lineage.
  */
class CandyPipeline(
    spark: SparkSession,
    dataDir: String,
    outputDir: String,
    start: LocalDate,
    endInclusive: LocalDate,
    forecastDays: Int = 1,
    reloadInventoryDaily: Boolean = false,
    dimConfig: Option[CandyConfig] = None) {

  final case class Result(
      orderLineItems: DataFrame,
      productsUpdated: DataFrame,
      orders: DataFrame,
      dailySummary: DataFrame,
      forecast: DataFrame,
      cancelledLines: Long)

  /** Run all stages and write the five CSV reports. */
  def run(): Result = {
    val transactions = (dimConfig match {
      // live MongoDB when the config opts in (MONGO_ENABLED); the
      // file-backed path otherwise — same selection shape as dimensions
      case Some(cfg) if cfg.mongoTransactions =>
        CandySources.transactions(spark, cfg, start, endInclusive)
      case _ =>
        CandySources.transactions(spark, dataDir, start, endInclusive)
    }).persist(StorageLevel.MEMORY_AND_DISK)
    // dimensions go through live JDBC when the config carries a URL
    // (reference data_processor.py:87-101), CSV fixtures otherwise
    val products = dimConfig match {
      case Some(cfg) if cfg.jdbcDims => CandySources.products(spark, cfg)
      case _ => CandySources.products(spark, dataDir)
    }

    val allocated = CandyEtl
      .allocate(CandyEtl.pricedLines(transactions, products), reloadInventoryDaily)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val lineItems = CandyEtl.orderLineItems(allocated)
    // Under daily inventory reload, "current stock" means stock after the
    // LAST business day (each day started from full stock).
    val stockSource =
      if (reloadInventoryDaily)
        allocated.filter(col("day_idx") === lit(endInclusive.toEpochDay))
      else allocated
    val stock = CandyEtl.productsUpdated(products, stockSource)
    val orders = CandyEtl.orders(transactions, allocated)
    val daily = CandyEtl.dailySummary(orders, allocated)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val forecast = forecastFrame(daily)

    SingleFileCsvSink.write(lineItems, outputDir, "order_line_items.csv")
    SingleFileCsvSink.write(stock, outputDir, "products_updated.csv")
    SingleFileCsvSink.write(orders, outputDir, "orders.csv")
    SingleFileCsvSink.write(CandyEtl.formatDailySummary(daily), outputDir, "daily_summary.csv")
    SingleFileCsvSink.write(forecast, outputDir, "sales_profit_forecast.csv")

    val cancelled = allocated.filter(col("quantity") === 0).count()
    Result(lineItems, stock, orders, daily, forecast, cancelled)
  }

  /** Fit sales + profit series and emit the forecast frame
    * (date, forecasted_sales, forecasted_profit), 2dp-rounded.
    * Non-fatal on degenerate input, like the reference (main.py:193-194):
    * an empty daily summary yields an empty (schema-correct) frame.
    */
  def forecastFrame(dailySummary: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("date", DateType),
      StructField("forecasted_sales", Money),
      StructField("forecasted_profit", Money)))
    val rows = dailySummary
      .select("date", "total_sales", "total_profit")
      .orderBy("date")
      .collect() // ≤ one row per business day — driver-side by design (§2.9)
    if (rows.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val series = rows.map { r =>
        (r.getDate(0).toLocalDate,
          r.getDecimal(1).doubleValue(),
          r.getDecimal(2).doubleValue())
      }
      // full Prophet model family (piecewise trend + Fourier seasonality),
      // deterministic closed-form fit — see Forecaster.fitSeasonal
      val sales = Forecaster.fitSeasonal(series.map(x => (x._1, x._2)).toSeq)
      val profit = Forecaster.fitSeasonal(series.map(x => (x._1, x._3)).toSeq)
      // in-sample fit metrics, printed like the reference does
      // (reference time_series.py:45-67 — reported, never saved)
      val (sm, pm) = (sales.metrics, profit.metrics)
      println(f"Forecast fit — sales MAE=${sm.mae}%.2f MSE=${sm.mse}%.2f; " +
        f"profit MAE=${pm.mae}%.2f MSE=${pm.mse}%.2f")
      val out = sales.predict(forecastDays).zip(profit.predict(forecastDays)).map {
        case ((d, s), (_, p)) =>
          Row(
            java.sql.Date.valueOf(d),
            new java.math.BigDecimal(s).setScale(2, java.math.RoundingMode.HALF_UP),
            new java.math.BigDecimal(p).setScale(2, java.math.RoundingMode.HALF_UP))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1), schema)
    }
  }
}

object CandyPipeline {
  /** Build from the reference-shaped environment config. */
  def fromConfig(
      spark: org.apache.spark.sql.SparkSession,
      cfg: CandyConfig): CandyPipeline =
    new CandyPipeline(
      spark, cfg.dataDir, cfg.outputPath, cfg.startDate, cfg.endDate,
      reloadInventoryDaily = cfg.reloadInventoryDaily,
      dimConfig = Some(cfg))
}
