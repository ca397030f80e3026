package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Exact-filename single-CSV sink (SURVEY.md §2.1 S4).
  *
  * The reference writes every report as ONE headered CSV with a fixed name:
  * `coalesce(1)` → write to a temp dir → move the part file into place
  * (reference data_processor.py:62-85). Same contract here, but the part
  * file is located through the Hadoop FileSystem API instead of a hardcoded
  * glob — Spark 4's commit protocol owns the temp layout, so listing is the
  * only stable way to find it.
  *
  * `coalesce(1)` funnels the final (tiny, already-aggregated) result
  * through one task; it must only ever wrap the last, small stage — row
  * order inside the file comes from the caller's preceding `orderBy`, which
  * the single-partition coalesce preserves.
  */
object SingleFileCsvSink {

  def write(df: DataFrame, outputDir: String, filename: String): String = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val outDir = new Path(outputDir)
    val fs = outDir.getFileSystem(conf)
    val tmp = new Path(outputDir, s".__tmp_$filename")

    df.coalesce(1)
      .write
      .mode("overwrite")
      .option("header", "true")
      .csv(tmp.toString)

    val part = fs
      .listStatus(tmp)
      .map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))

    val target = new Path(outDir, filename)
    if (fs.exists(target)) fs.delete(target, false)
    // rename returns false (no exception) on failure, e.g. a cross-
    // filesystem outputDir; deleting tmp after that would destroy the
    // only copy of the report.
    if (!fs.rename(part, target))
      throw new java.io.IOException(s"rename $part -> $target failed")
    fs.delete(tmp, true)
    target.toString
  }
}
