package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle of the IVF cell-partitioned physical layout (q126's on-disk
  * ANN shape) as reusable operators: base build, INCREMENTAL APPEND, and
  * small-file compaction. A 100 TB corpus is not written once — it
  * appends continuously — so the layout is only real if ingesting a
  * batch touches the batch's cells and nothing else:
  *
  *  - [[writeBase]]: assign every vector to its nearest frozen-codebook
  *    cell and write `partitionBy(cell)` — the one-off build.
  *  - [[appendBatch]]: assign ONLY the new batch (the history is never
  *    read, never shuffled — q99's incremental-dedup contract applied to
  *    the ANN index) and `mode(append)` into the same root. Parquet's
  *    dynamic partition append creates files only under the batch's own
  *    `cell=<id>/` directories; every other cell directory is untouched
  *    (asserted file-by-file in `IvfLayoutSpec`). Ingesting 1 TB into a
  *    100 TB index costs 1 TB of assignment + write, not a rebuild.
  *  - [[compactCells]]: appends accumulate small files (one per batch ×
  *    cell); read ONLY the named cells and rewrite them as one file each
  *    via dynamic-partition-overwrite, which replaces exactly the
  *    rewritten `cell=` directories. Run it on cells whose file count
  *    crosses a threshold — compaction cost is proportional to the
  *    compacted cells, never the corpus.
  *
  * Assignment must be bit-identical across base build, every append, and
  * the query-time probe, or a vector lands in a cell the probe never
  * visits: all three go through the same frozen
  * [[graft.model.IvfCentroids]] codebook and the same native
  * [[graft.functions.NearestCells]] scoring (sequential dot − ‖c‖²/2,
  * ties toward the lower cell) that q126's DuckDB oracle replays in SQL.
  */
object IvfLayout {

  /** `(vec_id, embedding, cell)` — nearest frozen-codebook cell per
    * vector, via the same native expression the probe side uses. Pure
    * map-side codegen'd work: no shuffle, scales with the input batch.
    */
  def assignCells(df: DataFrame, cents: Array[Array[Double]]): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      element_at(graft.functions.NearestCells.toCol(
        transform(col("embedding"), x => x.cast("double")), cents, 1), 1)
        .as("cell"))

  /** One-off base build: full corpus → `path/cell=<id>/...`. */
  def writeBase(df: DataFrame, cents: Array[Array[Double]], path: String): Unit =
    assignCells(df, cents)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Incremental ingest: assign the batch under the SAME codebook and
    * append. Only the batch is read and written; the existing layout is
    * not listed, read, or rewritten.
    */
  def appendBatch(df: DataFrame, cents: Array[Array[Double]], path: String): Unit =
    assignCells(df, cents)
      .write.partitionBy("cell").mode("append").parquet(path)

  /** Rewrite the named cell directories as one file each. Dynamic
    * partition overwrite replaces ONLY the partitions present in the
    * written frame — the named cells — leaving every other cell's files
    * byte-identical. The rewrite is data-local to the compacted cells.
    */
  def compactCells(s: SparkSession, path: String, cells: Seq[Int]): Unit = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // partition values read back as strings (inference off is the q97/
    // q126 read rule; the write path only needs the values to round-trip)
    s2.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    s2.read.parquet(path)
      .filter(col("cell").isin(cells.map(_.toString): _*))
      .repartition(1, col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)
  }

  /** Per-cell parquet file count — the compaction trigger (and the
    * spec's witness that appends/compactions touched exactly the cells
    * they claimed). Driver-side directory listing of one layout root:
    * O(cells + files) metadata, no data read.
    */
  def cellFileCounts(path: String): Map[String, Int] = {
    val root = new java.io.File(path)
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    dirs.map { d =>
      d.getName -> d.listFiles().count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    }.toMap
  }
}
