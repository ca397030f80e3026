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
  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (earlier
    * testdata generations) and plain TIMESTAMP(MICROS) (current) — this
    * loader normalizes either to a microsecond timestamp so every
    * consumer sees one schema.
    *
    * TIMESTAMP(NANOS) is rejected by Spark 4 by default; with
    * `nanosAsLong` it surfaces as a Long, converted here with INTEGER
    * division (`div`) — `/1000` would go through double, whose 53-bit
    * mantissa loses 1µs on ~1.5% of ~1.7e18ns values.
    *
    * NOTE: setting `nanosAsLong` is session-wide and sticky — any later
    * read of a TIMESTAMP(NANOS) column in the same session sees a Long
    * column instead of an error. All events consumers must come through
    * this loader.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }

  /** Normalize a RAW events frame — a direct (possibly file-streamed)
    * read of `events.parquet` under whichever physical `ts` encoding the
    * fixture generation used — to the loader's instant-timestamp schema.
    * Shared by [[events]] and the streaming specs/benches that stage the
    * same parquet through `readStream`, so batch and stream sides always
    * apply the IDENTICAL conversion.
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ;
        // normalize to TIMESTAMP so downstream instant functions
        // (unix_micros, to_utc_timestamp, …) resolve. Sessions run in
        // UTC, so the cast re-labels the same wall-clock values.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw // already an instant timestamp — use as-is
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
