package graft.pipeline

import graft.SparkTestBase
import graft.etl.CandyEtl
import graft.model.CandyModel
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RELOAD_INVENTORY_DAILY semantics: carry-over (default, reference
  * behaviour) vs daily-reload (the reference parses the flag but never
  * acts on it; this engine implements it).
  */
class CandyReloadSpec extends AnyFunSuite with SparkTestBase {
  import scala.jdk.CollectionConverters._

  // one product, stock 5; each day one transaction requesting 4
  private lazy val transactions = {
    val rows = Seq(
      Row(1, 1, "2024-02-01T10:00:00.000000", Seq(Row(10, "P10", Integer.valueOf(4)))),
      Row(2, 1, "2024-02-02T10:00:00.000000", Seq(Row(10, "P10", Integer.valueOf(4))))
    ).asJava
    spark.createDataFrame(rows, CandyModel.transactionSchema)
      .withColumn("tx_seq", monotonically_increasing_id())
      .withColumn("day_idx",
        datediff(to_date(col("timestamp")), lit("2024-01-01")).cast("long"))
  }

  private lazy val products = spark.createDataFrame(
    Seq(Row(10, "P10", "c", "s", "sh",
      new java.math.BigDecimal("2.00"), new java.math.BigDecimal("1.00"), 5)).asJava,
    CandyModel.productSchema)

  private def quantities(reload: Boolean): Map[Int, Int] =
    CandyEtl.allocate(CandyEtl.pricedLines(transactions, products), reload)
      .select("order_id", "quantity").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap

  test("carry-over (default): day 2 cancels — stock exhausted by day 1") {
    assert(quantities(reload = false) == Map(1 -> 4, 2 -> 0))
  }

  test("daily reload: both days fill from full stock") {
    assert(quantities(reload = true) == Map(1 -> 4, 2 -> 4))
  }

  test("config: RELOAD_INVENTORY_DAILY parsed from env map") {
    val cfg = CandyConfig.fromEnv(Map(
      "RELOAD_INVENTORY_DAILY" -> "TRUE",
      "MONGO_START_DATE" -> "20240201",
      "MONGO_END_DATE" -> "20240202"))
    assert(cfg.reloadInventoryDaily)
    assert(cfg.startDate.toString == "2024-02-01")
    assert(!CandyConfig.fromEnv(Map.empty).reloadInventoryDaily)
  }
}
