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
  * Implementation notes (round-9 rework, hardened round 10):
  *   - Streaming-safe: file-splitting reasoning is meaningless for a
  *     stream and the old `df.rdd` probe would throw — pass through.
  *   - No physical planning: the old `df.rdd.getNumPartitions` compiled
  *     a physical plan per call site (measurable per-query build cost).
  *     The estimate now comes from `df.inputFiles` (analysis-time only)
  *     plus file sizes, replaying Spark's own `FilePartition` split
  *     formula: maxSplit = min(maxPartitionBytes, max(openCost,
  *     totalBytes/parallelism)).
  *   - The zero-stat short-circuit requires `files·openCost ≥
  *     cores·maxPartitionBytes` — the openCost padding is then enough
  *     to GUARANTEE ≥cores bin-packed partitions whatever the file
  *     sizes (each packed partition holds ≤ maxSplit ≤ maxPartitionBytes
  *     of padded bytes, so ≤ maxPartitionBytes/openCost files). A bare
  *     `files ≥ cores` check is NOT sufficient: with
  *     spark.sql.files.openCostInBytes lowered toward zero, Spark packs
  *     many small files into 1–2 partitions — the exact cliff this
  *     object exists to fix (r9 advice). At production defaults the
  *     guarantee needs 32× cores files; beyond the tested regimes a
  *     many-small-file scan pays bounded per-file stats instead.
  *   - Unsplittable inputs (gzip & friends) plan exactly one partition
  *     per file; their split count is clamped to 1 so the estimate
  *     doesn't over-count and silently skip a needed spread (r9
  *     advice). Everything else — parquet/orc included, whatever their
  *     internal compression — splits by byte ranges.
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
    * the two regimes with ~3× margin on each side — for scans of
    * ORDINARY compute density; see `computeWeight`.
    */
  val minBytesPerCore: Long = 64L * 1024

  /** `df`, round-robin repartitioned to `defaultParallelism` iff its
    * file scan would plan fewer partitions than that AND there are at
    * least [[minBytesPerCore]]`/computeWeight` input bytes per core to
    * justify the exchange. Non-file sources and streams pass through
    * untouched.
    *
    * `computeWeight` scales the byte floor for scans whose per-BYTE
    * cost is far above the corpus-scan norm the 64 KB floor was
    * calibrated on (the floor models compute ∝ bytes; a 64-hash
    * MinHash + full-shingle kernel does ~10× the work per byte, so its
    * break-even sits ~10× lower — measured on q37, r10 interleaved
    * in-JVM A/B at sf0.1: pass-through at 19 KB/core 2.74 s median vs
    * 1.52 s force-spread, while the same 19 KB/core is exactly where
    * blanket spreading cost 1.2–2× on ordinary-density queries in the
    * r8 A/B). 1.0 = the calibrated default; >1 lowers the floor
    * proportionally. Weights should come from an A/B, not guesses.
    */
  def ensure(df: DataFrame, computeWeight: Double = 1.0): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val files =
      // inputFiles only traverses the analyzed plan; no known throw
      // path remains for a batch DataFrame, but a exotic relation that
      // does throw should disable spreading, not fail the query
      try df.inputFiles
      catch { case scala.util.control.NonFatal(_) => Array.empty[String] }
    // no file source (in-memory relation, jdbc, …): nothing to reason
    // about — leave the plan alone rather than guessing
    if (files.isEmpty) return df
    val maxPartitionBytes =
      bytesConf(spark, "spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
    val openCost =
      bytesConf(spark, "spark.sql.files.openCostInBytes", 4L * 1024 * 1024)
    // enough openCost padding to guarantee ≥cores packed partitions —
    // return before stat-ing anything (the 100 TB fast path). A packed
    // partition holds ≤ max(1, maxSplit/openCost) ≤ max(1,
    // maxPartitionBytes/openCost) files, so files·openCost ≥
    // cores·maxPartitionBytes bounds partitions below by cores; the
    // files ≥ cores conjunct keeps the bound sound when openCost
    // exceeds maxPartitionBytes (then each partition holds ≤1 file).
    if (openCost > 0 && files.length >= cores &&
        files.length.toLong * openCost >= cores.toLong * maxPartitionBytes)
      return df
    // stat-cost ceiling: a file list big enough to land here (openCost
    // tuned toward zero) is a production-scale input whose packing we
    // won't pay thousands of sequential driver stats to model exactly.
    // r10 advice: don't go BLIND either — the low-openCost many-small-
    // file merge cliff is precisely this regime — so stat a bounded
    // stride sample and extrapolate (each unsampled file takes a
    // sampled size round-robin; splittability still comes from every
    // file's real name). The estimate degrades from exact to
    // mean-based, which is the right trade at 100 TB: one bounded
    // batch of driver stats instead of either a full listing walk or
    // an unmodeled pass-through.
    val statCeiling = math.max(1024, 32 * cores)
    val sampled = files.length > statCeiling
    val statTargets =
      if (!sampled) files
      else {
        val stride = files.length.toDouble / statCeiling
        Array.tabulate(statCeiling)(i => files((i * stride).toInt))
      }
    val est = estimate(spark, files, statTargets, cores, maxPartitionBytes, openCost)
    val floor = math.max(1L,
      (minBytesPerCore / math.max(computeWeight, 1e-9)).toLong)
    if (est.partitions < cores && est.totalBytes >= floor * cores)
      df.repartition(cores)
    else df
  }

  /** Total input bytes of `df`'s file sources — 0 for streams and
    * non-file relations. Same bounded stat discipline as [[ensure]]:
    * past the stride-sample ceiling the total extrapolates from the
    * sample mean instead of paying thousands of sequential driver
    * stats. Public for sizing decisions that provision against input
    * volume (ExactSubstr's auto-pass scratch rule).
    */
  def inputBytes(df: DataFrame): Long = {
    if (df.isStreaming) return 0L
    val spark = df.sparkSession
    val files =
      try df.inputFiles
      catch { case scala.util.control.NonFatal(_) => Array.empty[String] }
    if (files.isEmpty) return 0L
    val statCeiling = math.max(1024, 32 * spark.sparkContext.defaultParallelism)
    val statTargets =
      if (files.length <= statCeiling) files
      else {
        val stride = files.length.toDouble / statCeiling
        Array.tabulate(statCeiling)(i => files((i * stride).toInt))
      }
    val hconf = spark.sparkContext.hadoopConfiguration
    val statted = statTargets.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      } catch {
        case _: java.io.IOException => 0L
        case _: IllegalArgumentException => 0L
      }
    }
    if (statTargets.length == files.length) statted.sum
    else (statted.sum.toDouble / statted.length * files.length).toLong
  }

  private def bytesConf(
      spark: org.apache.spark.sql.SparkSession, key: String, dflt: Long): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get(key))
    catch {
      // unset key / unparseable value — the two ways a conf READ can
      // fail; anything else (a broken conf subsystem) should surface,
      // not silently disable spreading (r9 verdict #5). NFE ⊂ IAE, so
      // one IllegalArgumentException case covers both.
      case _: java.util.NoSuchElementException => dflt
      case _: IllegalArgumentException => dflt
    }

  private case class Estimate(partitions: Long, totalBytes: Long)

  /** Hadoop codecs that cannot be split by byte range: such a file is
    * always exactly one partition regardless of size.
    */
  private val unsplittableSuffixes =
    Seq(".gz", ".gzip", ".zst", ".zstd", ".deflate", ".lz4", ".snappy")

  /** Replay of `FilePartition.maxSplitBytes` + greedy BIN-PACKED
    * partition counting (r10 review): splits larger than `maxSplit`
    * (unsplittable big files) sit alone; everything else packs to
    * ~`maxSplit` of openCost-padded bytes per partition, so many small
    * files merge exactly as Spark merges them — the per-file `≥1
    * partition each` counting this replaces could NEVER report fewer
    * partitions than files, making it blind to the
    * low-openCost/low-minPartitionNum cliff the r9 advice flagged (and
    * redundant for files ≥ cores). `maxSplit` uses
    * `spark.sql.files.minPartitionNum` (falling back to `cores`) as
    * Spark does, and is clamped ≥ 1 so a zero openCost over a tiny
    * input cannot divide by zero. The packed count can undercount
    * Spark's greedy leftovers by a partition or two near the boundary —
    * erring toward a spread that the real plan would make a no-op-sized
    * exchange. Row-group atomicity can still make the true non-empty
    * partition count lower; callers that hit that at scale should
    * re-write their layout (see IvfLayout/StorageQueries) rather than
    * lean harder on a shuffle.
    */
  private def estimate(
      spark: org.apache.spark.sql.SparkSession,
      files: Array[String],
      statTargets: Array[String],
      cores: Int,
      maxPartitionBytes: Long,
      openCost: Long): Estimate = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val statted = statTargets.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      } catch {
        // a vanished/unreachable file contributes zero bytes; malformed
        // paths shouldn't occur (inputFiles emits URIs) but are equally
        // non-fatal. Anything else propagates (r9 verdict #5).
        case _: java.io.IOException => 0L
        case _: IllegalArgumentException => 0L
      }
    }
    // sampled mode (statTargets ⊂ files): every unsampled file takes a
    // sampled size round-robin — total bytes and the packed count then
    // extrapolate from the sample mean instead of going unmodeled
    val sizes: Seq[Long] =
      if (statTargets.length == files.length) statted.toSeq
      else files.indices.map(i => statted(i % statted.length))
    val minPartitionNum = math.max(1L,
      try spark.conf.get("spark.sql.files.minPartitionNum").toLong
      catch {
        case _: java.util.NoSuchElementException => cores.toLong
        case _: NumberFormatException => cores.toLong
      })
    val padded = sizes.map(_ + openCost).sum
    val maxSplit = math.max(1L,
      math.min(maxPartitionBytes, math.max(openCost, padded / minPartitionNum)))
    val splittable = files.map { f =>
      val lower = f.toLowerCase(java.util.Locale.ROOT)
      !unsplittableSuffixes.exists(lower.endsWith)
    }
    var oversized = 0L // one split > maxSplit ⇒ its own partition
    var packPad = 0L   // openCost-padded bytes of packable splits
    sizes.zip(splittable).foreach { case (s, canSplit) =>
      if (!canSplit && s > maxSplit) oversized += 1
      else {
        val nSplits =
          if (canSplit) math.max(1L, (s + maxSplit - 1) / maxSplit) else 1L
        packPad += s + nSplits * openCost
      }
    }
    val parts = oversized + (packPad + maxSplit - 1) / maxSplit
    Estimate(parts, sizes.sum)
  }
}
