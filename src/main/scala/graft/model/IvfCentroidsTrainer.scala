package graft.model

import graft.Tables

/** One-shot trainer that generates the [[IvfCentroids]] fixture — the
  * q77/QualityWeights discipline applied to the IVF coarse quantizer:
  * Lloyd's k-means (iterative, not SQL-replayable) runs ONCE here; the
  * converged centroids freeze as constants; q32's search pass then
  * applies them as plan literals and is hash-checked against a DuckDB
  * replay. Run manually when the quantizer shape changes:
  *
  * {{{ sbt "runMain graft.model.IvfCentroidsTrainer /root/testdata/sf0.01" }}}
  *
  * Parameters mirror q32's historical in-query fit exactly
  * (numCells 16, seed 7, trainSample 16384, 20 Lloyd iterations).
  */
object IvfCentroidsTrainer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession
      .builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dump(name: String, numCells: Int): Unit = {
      val cells = graft.operators.Similarity.trainQuantizer(
        Tables.embeddings(spark, sfDir), "embedding",
        numCells = numCells, seed = 7L, trainSample = 16384)
      println(s"// $name trained at $sfDir: ${cells.length} cells x ${cells.head.length} dims")
      println(s"  val $name: Array[Array[Double]] = Array(")
      cells.zipWithIndex.foreach { case (c, i) =>
        val sep = if (i == cells.length - 1) ")" else ","
        println(s"    Array(${c.mkString(", ")})$sep")
      }
    }
    // q32's search codebook (16 cells, query fan-out sizing) and q94's
    // blocking codebook (128 cells ≈ the auto-K rule nprobe·√(N/2) at
    // the bench corpus — K must stay large enough that cell blocking
    // actually prunes at every test SF)
    dump("cells", 16)
    dump("cells128", 128)
    spark.stop()
  }
}
