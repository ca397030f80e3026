package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Ingestion-robustness sources the candy fixtures don't exercise but any
  * production deployment needs (reference reads Mongo/JDBC and trusts the
  * driver to validate — `/root/reference/src/data_processor.py:103-120`
  * has no malformed-record path at all):
  *
  *   - PERMISSIVE JSON-lines scan that ROUTES corrupt records to a side
  *     channel instead of silently nulling them (the classic quarantine
  *     pattern: good rows flow on, bad raw lines land in a table you can
  *     alert on and replay),
  *   - `binaryFile` scan for opaque media blobs feeding the multimodal
  *     pipeline (image/audio/video as binary + typed metadata).
  */
object RobustSources {

  /** Name of the quarantine column during the permissive parse. */
  private val corruptCol = "__corrupt_record"

  /** Parse newline-delimited JSON with `schema`; rows that fail to parse
    * are captured raw. Returns the full frame with a `__corrupt_record`
    * column (NULL for clean rows): split with [[good]] / [[quarantine]].
    *
    * The parsed frame must be cached/materialized BEFORE filtering on the
    * corrupt column — Spark refuses a filter that references ONLY the
    * corrupt column on a lazy parse (internal-column pushdown would have
    * to re-parse), which is why the two splitters go through a projection
    * that carries data columns too.
    */
  def jsonLinesWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = schema.add(corruptCol, StringType)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      // Spark's documented requirement: a query referencing only the
      // corrupt column over raw files is rejected (it would re-parse),
      // so the parsed frame is cached before good/quarantine split it —
      // which is also what you want operationally: ONE parse feeds both.
      // The cache is the CALLER's to release: unpersist() once both
      // splits are materialized, or use [[withQuarantine]] which scopes
      // the cache to a block.
      .cache()
  }

  /** Loan-pattern ingestion: parse once, hand the (good, quarantine)
    * pair to `f`, and unpersist when `f` returns — repeated ingestion
    * calls can't pin parsed corpora in executor memory for the
    * application lifetime. `f` must MATERIALIZE what it keeps (write, or
    * collect); frames that escape `f` lazily will silently re-parse.
    */
  def withQuarantine[T](
      spark: SparkSession,
      path: String,
      schema: StructType)(f: (DataFrame, DataFrame) => T): T = {
    val parsed = jsonLinesWithQuarantine(spark, path, schema)
    try f(good(parsed), quarantine(parsed))
    finally parsed.unpersist()
  }

  /** Clean rows only, corrupt column dropped. */
  def good(parsed: DataFrame): DataFrame =
    parsed.filter(col(corruptCol).isNull).drop(corruptCol)

  /** The quarantine side: raw text of every record that failed the
    * schema, for alerting/replay.
    */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_record"))

  /** Opaque media blobs as (path, length, content) via the built-in
    * `binaryFile` source — the ingestion edge of the multimodal pipeline
    * ([[graft.operators.Multimodal]]): decode/feature-extract stages
    * consume the `content` byte column downstream. `pathGlobFilter`
    * prunes at listing time, so non-matching files are never opened.
    */
  def binaryBlobs(
      spark: SparkSession,
      dir: String,
      glob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path"),
        col("length"),
        col("content"))

  /** Read a parquet dataset whose files were written under EVOLVING
    * schemas (a long-lived ingestion directory: new pipeline versions
    * add columns, old files stay). `mergeSchema` unions all file footers
    * into one schema; rows from files predating a column read it as
    * NULL. Schema merge is a listing-time footer pass — off by default
    * in Spark because it touches every footer, which is exactly the
    * price a mixed-vintage directory has to pay ONCE per query rather
    * than failing or silently dropping the new columns (the default
    * picks an arbitrary file's schema).
    *
    * Only additive evolution is supported (parquet refuses diverging
    * types for a shared column name) — enforce widening rewrites
    * upstream; this reader will surface such files as a read error, not
    * a silent cast.
    */
  def evolvedParquet(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
