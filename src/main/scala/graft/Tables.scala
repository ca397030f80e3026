package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `\$sfDir/`. Reads are plain
  * `spark.read.parquet` so Catalyst's vectorized reader, column pruning and
  * filter pushdown all apply; callers should `.select` / `.filter` as early
  * as possible so the pushdown reaches the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    * default; read nanos as long and convert to a microsecond timestamp
    * with INTEGER division (`div`) — `/1000` would go through double,
    * whose 53-bit mantissa loses 1µs on ~1.5% of ~1.7e18ns values.
    *
    * NOTE: setting `nanosAsLong` is session-wide and sticky — any later
    * read of a TIMESTAMP(NANOS) column in the same session sees a Long
    * column instead of an error. All events consumers must come through
    * this loader.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
