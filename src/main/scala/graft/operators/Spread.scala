package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-heavy scans. A small parquet input (one
  * file block / one row group) plans as 1–2 scan partitions, which
  * serializes any expensive per-row work (regex redaction, tokenize,
  * shingling) onto one core — the classic small-SF bench cliff, measured
  * 13–19× at sf1 on q51/q53/q55. At real scale the scan has thousands of
  * blocks and this is a no-op: the round-robin shuffle is only added
  * when the scan cannot deliver `defaultParallelism` partitions, so a
  * 100 TB input is never re-shuffled.
  *
  * Apply ONLY where per-row compute genuinely dominates the scan — the
  * exchange materializes the full text column, which costs more than it
  * saves on cheap fused-expression scans (round-8 A/B: a blanket rollout
  * doubled q18/q22 at sf0.1). Current sites: Gopher/C4 signal
  * extraction, PII regex redaction, sequence packing's tokenizer,
  * contamination shingling, PPJoin prefix generation.
  *
  * Implementation notes (round-9 rework):
  *   - Streaming-safe: file-splitting reasoning is meaningless for a
  *     stream and the old `df.rdd` probe would throw — pass through.
  *   - No physical planning: the old `df.rdd.getNumPartitions` compiled
  *     a physical plan per call site (measurable per-query build cost).
  *     The estimate now comes from `df.inputFiles` (analysis-time only)
  *     plus file sizes, replaying Spark's own `FilePartition` split
  *     formula: maxSplit = min(maxPartitionBytes, max(openCost,
  *     totalBytes/parallelism)).
  *   - ≥cores files short-circuits BEFORE any file-status call, so a
  *     production many-file input pays zero per-file stat round-trips.
  */
object Spread {

  /** Below this many input bytes per core the round-robin exchange
    * cannot pay for itself: it costs a fixed ~50–150 ms of job overhead
    * plus one full write+read of the data, while the parallelization
    * gain is bounded by the single-core compute over those few bytes.
    * Measured at both poles (r8/r9 A/B): the sf0.1 documents table
    * (0.6 MB → 19 KB/core at 32 cores) is where a blanket spread COST
    * 1.2–2× on a dozen text queries, and the sf1 table (5.9 MB →
    * 184 KB/core) is where the SAME spread won 3–16× (q33's broadcast
    * self-join runs 16× more streamed partitions, q37/q51/q55's per-row
    * kernels spread off their single row group). 64 KB/core separates
    * the two regimes with ~3× margin on each side.
    */
  val minBytesPerCore: Long = 64L * 1024

  /** `df`, round-robin repartitioned to `defaultParallelism` iff its
    * file scan would plan fewer partitions than that AND there are at
    * least [[minBytesPerCore]] input bytes per core to justify the
    * exchange. Non-file sources and streams pass through untouched.
    */
  def ensure(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val files =
      try df.inputFiles
      catch { case _: Throwable => Array.empty[String] }
    // no file source (in-memory relation, jdbc, …): nothing to reason
    // about — leave the plan alone rather than guessing
    if (files.isEmpty) return df
    // enough files to fill every core even at one-split-per-file —
    // return before stat-ing anything (the 100 TB fast path)
    if (files.length >= cores) return df
    val est = estimate(df, files, cores)
    if (est.partitions < cores && est.totalBytes >= minBytesPerCore * cores)
      df.repartition(cores)
    else df
  }

  private case class Estimate(partitions: Long, totalBytes: Long)

  /** Replay of `FilePartition.maxSplitBytes` + per-file split counting.
    * Slight over-estimate versus Spark's bin-packing (which merges small
    * splits), which errs toward NOT spreading — the cheap direction.
    * Row-group atomicity can make the true non-empty partition count
    * lower than this estimate; callers that hit that case at scale
    * should re-write their layout (see IvfLayout/StorageQueries) rather
    * than lean harder on a shuffle.
    */
  private def estimate(
      df: DataFrame, files: Array[String], cores: Int): Estimate = {
    val spark = df.sparkSession
    def bytesConf(key: String, dflt: Long): Long =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(key))
      catch { case _: Throwable => dflt }
    val maxPartitionBytes =
      bytesConf("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
    val openCost =
      bytesConf("spark.sql.files.openCostInBytes", 4L * 1024 * 1024)
    val hconf = spark.sparkContext.hadoopConfiguration
    val sizes = files.toSeq.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      } catch { case _: Throwable => 0L }
    }
    val padded = sizes.map(_ + openCost).sum
    val maxSplit =
      math.min(maxPartitionBytes, math.max(openCost, padded / cores))
    Estimate(
      sizes.map(s => math.max(1L, (s + maxSplit - 1) / maxSplit)).sum,
      sizes.sum)
  }
}
