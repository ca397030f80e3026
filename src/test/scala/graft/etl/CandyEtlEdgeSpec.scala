package graft.etl

import graft.SparkTestBase
import graft.model.CandyModel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §A1 edge cases, exercised directly on the etl stages:
  * all-null-qty transactions vanish from orders; duplicate product_id
  * within one transaction allocates sequentially; unknown product_id is
  * dropped by the inner dimension join; cancelled lines count in
  * num_items but contribute 0.00.
  */
class CandyEtlEdgeSpec extends AnyFunSuite with SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def tx(id: Int, items: Seq[(Int, Integer)]): Row =
    Row(id, 1, s"2024-02-01T00:00:0$id.000000",
      items.map { case (p, q) => Row(p, s"P$p", q) })

  private lazy val transactions = {
    val rows = Seq(
      tx(1, Seq((10, 2), (10, 3))),            // duplicate product in one tx
      tx(2, Seq((10, null.asInstanceOf[Integer]))), // all lines null-qty → vanishes
      tx(3, Seq((99, 1), (10, 1))),            // 99 = unknown product
      tx(4, Seq((20, 5)))                       // demand > stock → cancelled
    ).asJava
    spark.createDataFrame(rows, CandyModel.transactionSchema)
      .withColumn("tx_seq", monotonically_increasing_id())
      .withColumn("day_idx", lit(0L))
  }

  private lazy val products = {
    val rows = Seq(
      Row(10, "P10", "c", "s", "sh",
        new java.math.BigDecimal("2.00"), new java.math.BigDecimal("1.00"), 4),
      Row(20, "P20", "c", "s", "sh",
        new java.math.BigDecimal("3.00"), new java.math.BigDecimal("1.50"), 4)
    ).asJava
    spark.createDataFrame(rows, CandyModel.productSchema)
  }

  private lazy val allocated = CandyEtl.allocate(CandyEtl.pricedLines(transactions, products))

  test("null-qty lines and unknown products never reach allocation") {
    val lines = allocated.select("order_id", "product_id").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(!lines.contains((2, 10)))   // null qty filtered
    assert(!lines.exists(_._2 == 99))  // unknown product dropped by inner join
  }

  test("duplicate product within a transaction allocates sequentially") {
    // stock 4: tx1 wants 2 then 3 → 2 fills, 3 cancels; then tx3 wants 1 → fills
    val q = allocated.filter(col("product_id") === 10)
      .select("order_id", "qty", "quantity").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(x => (x._1, x._2))
    assert(q.toSeq == Seq((1, 2, 2), (1, 3, 0), (3, 1, 1)))
  }

  test("orders: all-null transaction vanishes; num_items counts cancelled lines") {
    val orders = CandyEtl.orders(transactions, allocated)
      .select("order_id", "num_items", "total_amount").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDecimal(2).toString))).toMap
    assert(!orders.contains(2))                 // vanished
    assert(orders(1) == ((2L, "4.00")))         // 2 lines (one cancelled), 2×2.00
    assert(orders(3) == ((1L, "2.00")))         // unknown-product line gone
    assert(orders(4) == ((1L, "0.00")))         // fully cancelled, still present
  }

  test("products_updated: unordered products keep stock; partial fills never happen") {
    val stock = CandyEtl.productsUpdated(products, allocated)
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(stock(10) == 4 - 2 - 1) // filled 2 (tx1) + 1 (tx3)
    assert(stock(20) == 4)         // demand 5 > 4 cancelled entirely — no partial
  }
}
