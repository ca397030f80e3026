package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val statCols = Seq("f_nw", "f_nw2", "f_mwl", "f_mwl2", "f_stop")

  private def labeled = QualityRules
    .gopherSignals(Tables.documents(spark, sf), "text")
    .select(
      col("doc_id"), col("text"),
      col("gopher_pass").cast("double").as("weak_label"),
      col("n_words").cast("double").as("f_nw"),
      pow(col("n_words"), 2).as("f_nw2"),
      col("mean_word_len").as("f_mwl"),
      pow(col("mean_word_len"), 2).as("f_mwl2"),
      col("stop_hits").cast("double").as("f_stop"))

  test("weakly supervised LR separates the rule classes it was trained on") {
    val scored = QualityModel
      .weaklySupervisedScore(labeled, "doc_id", "text", "weak_label", statCols)
      .select(
        col("doc_id"), col("weak_label").cast("int"), col("predicted"),
        col("p_good"))
      .as[(Long, Int, Int, Double)].collect()
    assert(scored.length == 500)
    val acc = scored.count(r => r._2 == r._3).toDouble / scored.length
    assert(acc >= 0.85, s"training accuracy $acc")
    // probabilities are calibrated-ish: mean p_good higher on positives
    val posMean = scored.filter(_._2 == 1).map(_._4).sum /
      scored.count(_._2 == 1)
    val negMean = scored.filter(_._2 == 0).map(_._4).sum /
      scored.count(_._2 == 0)
    assert(posMean > negMean + 0.2, s"pos=$posMean neg=$negMean")
  }

  test("frozen-weight scoring holds an accuracy floor on held-out data") {
    // QualityWeights trained at sf0.01; sf0.001 is a disjoint corpus —
    // this pins GENERALIZATION of the frozen hyperplane (measured 0.884
    // on the training SF, 0.852 at sf0.1). The scoring semantics
    // themselves are hash-checked by q77's DuckDB oracle.
    val scored = QualityModel
      .frozenScore(labeled, "doc_id", "text", "weak_label", statCols)
      .select(col("weak_label").cast("int"), col("predicted"), col("p_good"))
      .as[(Int, Int, Double)].collect()
    assert(scored.length == 500)
    val acc = scored.count(r => r._1 == r._2).toDouble / scored.length
    assert(acc >= 0.80, s"frozen-score held-out accuracy $acc")
    // margin-threshold and probability agree: predicted == (p_good >= 0.5)
    assert(scored.forall(r => (r._2 == 1) == (r._3 >= 0.5)))
  }

  test("scoring is deterministic within a session (same data, same fit)") {
    def run() = QualityModel
      .weaklySupervisedScore(labeled, "doc_id", "text", "weak_label", statCols)
      .select("doc_id", "predicted").as[(Long, Int)].collect().toMap
    assert(run() == run())
  }
}
