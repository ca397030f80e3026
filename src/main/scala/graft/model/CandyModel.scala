package graft.model

import org.apache.spark.sql.types._

/** Schemas + case classes for the candy-store data model (SURVEY.md §1.2).
  *
  * Money is `DecimalType(10,2)` end-to-end — matching the reference's MySQL
  * DDL (reference README.md:50-59) and the documented intent of its daily
  * summary (reference main.py:180-185) rather than the `double` its Python
  * code actually used; decimals remove float drift and render `5.70` (the
  * golden form) instead of `5.7`.
  */
object CandyModel {

  val Money: DecimalType = DecimalType(10, 2)

  /** `items` element of a transaction document
    * (reference data/dataset_5/transactions_*.json; qty nullable).
    */
  val itemSchema: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("product_name", StringType),
    StructField("qty", IntegerType)
  ))

  /** One transaction document (reference data_processor.py:116-134).
    * `timestamp` stays an ISO-8601 *string* end-to-end — the golden
    * orders.csv preserves microseconds verbatim; only `to_date` derives
    * a date for grouping.
    */
  val transactionSchema: StructType = StructType(Seq(
    StructField("transaction_id", IntegerType),
    StructField("customer_id", IntegerType),
    StructField("timestamp", StringType),
    StructField("items", ArrayType(itemSchema))
  ))

  /** products dimension (reference README.md:50-59 DDL). */
  val productSchema: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("product_name", StringType),
    StructField("product_category", StringType),
    StructField("product_subcategory", StringType),
    StructField("product_shape", StringType),
    StructField("sales_price", Money),
    StructField("cost_to_make", Money),
    StructField("stock", IntegerType)
  ))

  /** customers dimension (reference README.md:32-39 DDL; loaded but unused
    * in any output — kept for API completeness).
    */
  val customerSchema: StructType = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("address", StringType),
    StructField("phone", StringType)
  ))

  case class Item(product_id: Int, product_name: String, qty: Option[Int])
  case class Transaction(
      transaction_id: Int,
      customer_id: Int,
      timestamp: String,
      items: Seq[Item])
  case class Product(
      product_id: Int,
      product_name: String,
      product_category: String,
      product_subcategory: String,
      product_shape: String,
      sales_price: BigDecimal,
      cost_to_make: BigDecimal,
      stock: Int)
  case class OrderLineItem(
      order_id: Int,
      product_id: Int,
      quantity: Int,
      unit_price: BigDecimal,
      line_total: BigDecimal)
  case class StockLevel(product_id: Int, product_name: String, current_stock: Int)
  case class Order(
      order_id: Int,
      order_datetime: String,
      customer_id: Int,
      total_amount: BigDecimal,
      num_items: Long)
  case class DailySummary(
      date: java.sql.Date,
      num_orders: Long,
      total_sales: BigDecimal,
      total_profit: BigDecimal)
}
