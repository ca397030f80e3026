package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF layout's incremental contract, witnessed at the FILE level:
  * an append creates files only under the batch's own cell directories,
  * and compaction rewrites only the cells it names. The RESULT
  * invariance (base + append == from-scratch build) is the driver's
  * q127 oracle; this spec proves the I/O claim the oracle can't see.
  */
class IvfLayoutSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val cents = graft.model.IvfCentroids.cells

  /** (cell dir -> sorted parquet file names), the byte-level witness. */
  private def files(path: String): Map[String, Seq[String]] = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName -> d.listFiles()
        .map(_.getName).filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted)
      .toMap
  }

  private def tmpLayout(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"ivf_$name").toFile
    dir.deleteOnExit()
    s"${dir.getAbsolutePath}/layout"
  }

  test("append creates files ONLY under the batch's cells; base files untouched") {
    val path = tmpLayout("append")
    val all = Tables.embeddings(spark, sf)
    val base = all.filter(col("vec_id") % 10 =!= 0)
    val batch = all.filter(col("vec_id") % 10 === 0)
    IvfLayout.writeBase(base, cents, path)
    val before = files(path)
    assert(before.nonEmpty, "base layout wrote no cell directories")

    val batchCells = IvfLayout.assignCells(batch, cents)
      .select("cell").distinct().collect().map(r => s"cell=${r.get(0)}").toSet
    IvfLayout.appendBatch(batch, cents, path)
    val after = files(path)

    // every pre-existing file survives byte-name-identical
    for ((cell, fs) <- before)
      assert(fs.forall(after(cell).contains),
        s"$cell lost base files: before=$fs after=${after(cell)}")
    // new files appear in batch cells and ONLY in batch cells
    val grown = after.filter { case (cell, fs) =>
      fs.size > before.getOrElse(cell, Seq.empty).size }.keySet
    assert(grown.nonEmpty, "append created no files")
    assert(grown.subsetOf(batchCells),
      s"append touched non-batch cells: ${grown -- batchCells}")
  }

  test("appended layout reads back as exactly base ∪ batch per cell") {
    val path = tmpLayout("roundtrip")
    val all = Tables.embeddings(spark, sf)
    IvfLayout.writeBase(all.filter(col("vec_id") % 10 =!= 0), cents, path)
    IvfLayout.appendBatch(all.filter(col("vec_id") % 10 === 0), cents, path)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val readBack = s2.read.parquet(path)
      .select(col("vec_id"), col("cell"))
    val expected = IvfLayout.assignCells(all, cents)
      .select(col("vec_id"), col("cell").cast("string").as("cell"))
    assert(readBack.exceptAll(expected).isEmpty &&
      expected.exceptAll(readBack).isEmpty,
      "incremental layout's (vec_id, cell) set differs from a fresh build")
  }

  test("compaction rewrites ONLY the named cells, to one file each, same rows") {
    val path = tmpLayout("compact")
    val all = Tables.embeddings(spark, sf)
    // three appends -> several files per touched cell
    IvfLayout.writeBase(all.filter(col("vec_id") % 3 === 0), cents, path)
    IvfLayout.appendBatch(all.filter(col("vec_id") % 3 === 1), cents, path)
    IvfLayout.appendBatch(all.filter(col("vec_id") % 3 === 2), cents, path)
    val before = files(path)
    val rowsBefore = spark.read.parquet(path).count()

    val fat = before.filter(_._2.size > 1).keys.toSeq.sorted
    assert(fat.nonEmpty, s"no multi-file cells to compact: $before")
    val target = fat.take(2).map(_.stripPrefix("cell=").toInt)
    IvfLayout.compactCells(spark, path, target)
    val after = files(path)

    for (c <- target)
      assert(after(s"cell=$c").size == 1,
        s"cell=$c not compacted to one file: ${after(s"cell=$c")}")
    for ((cell, fs) <- before if !target.contains(cell.stripPrefix("cell=").toInt))
      assert(after(cell) == fs,
        s"compaction touched unnamed $cell: before=$fs after=${after(cell)}")
    assert(spark.read.parquet(path).count() == rowsBefore,
      "compaction changed the row count")
  }
}
