package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, Tokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the learned counterpart to the
  * rule-based filters in [[QualityRules]]. Real corpus pipelines train a
  * lightweight text classifier on weak labels (rule outcomes, known-good
  * vs known-bad sources) and keep documents the model scores highly;
  * the rules bootstrap the model, the model generalizes past the rules.
  *
  * Spark-first shape: `Tokenizer → HashingTF → LogisticRegression`, all
  * `spark.ml` — features are a fixed-width hashed bag-of-words (no
  * vocabulary build, no driver-side state), training is distributed
  * L-BFGS (treeAggregate gradient passes), and scoring is one
  * map-side-only transform. At 100 TB one trains on a sample and
  * broadcasts the (numFeatures-sized) coefficient vector — exactly what
  * `LogisticRegressionModel.transform` does.
  */
object QualityModel {

  /** Train on `labelCol` (0/1 weak labels) over `textCol`, score every
    * row. `statCols` are optional numeric side features (length, word
    * stats, …) assembled next to the hashed text — quality labels often
    * depend on document statistics a bag-of-words can't express
    * linearly.
    *
    * @return (idCol, labelCol, predicted, p_good) — `p_good` is the
    *         model's class-1 probability
    */
  def weaklySupervisedScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      statCols: Seq[String] = Nil,
      numFeatures: Int = 256): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("__words"),
      new HashingTF().setInputCol("__words").setOutputCol("__tf")
        .setNumFeatures(numFeatures),
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(("__tf" +: statCols).toArray)
        .setOutputCol("__features"),
      // each L-BFGS iteration is one treeAggregate JOB — iteration count,
      // not data volume, dominates wall-clock at small scale. 12 iters /
      // tol 1e-3 sits past the accuracy plateau for this feature width
      // (spec floor 0.85 holds with margin at both driver SFs) and
      // halves the fit's serial job chain vs 25.
      new LogisticRegression().setFeaturesCol("__features")
        .setLabelCol(labelCol).setMaxIter(12).setRegParam(1e-4).setTol(1e-3)))
    // pin the input ONCE: fit consumes df through every L-BFGS pass and
    // transform reads it again — unpinned, the caller's upstream
    // (tokenize + signal extraction) would re-run per consumer. The
    // pinned frame is one row per document with a handful of columns.
    val pinned = df.localCheckpoint(true)
    val model = pipeline.fit(pinned)
    model.transform(pinned).select(
      col(idCol),
      col(labelCol),
      col("prediction").cast("int").as("predicted"),
      element_at(vector_to_array(col("probability")), 2).as("p_good"))
  }

  /** Score with the FROZEN hyperplane in [[graft.model.QualityWeights]] —
    * a pure deterministic expression pass, no fitting, which is what
    * makes q77 hash-checkable against a DuckDB replay (the md5-anchor
    * discipline: train once offline, freeze, score declaratively).
    *
    * The text contribution folds token→bucket-weight left-to-right in
    * document order (`aggregate` over the token array), identically to
    * the oracle's `list_sum(list_transform(...))`, so the two engines sum
    * the same doubles in the same order; the margin is 1e-6-rounded
    * BEFORE the sigmoid so both engines exponentiate an identical value,
    * and the class threshold tests the rounded margin against 0
    * (≡ p ≥ 0.5) rather than re-thresholding the rounded probability.
    *
    * Scale shape: one codegen'd map pass — the 256-weight array ships as
    * a plan literal (a broadcast in spirit), no shuffle, no state.
    *
    * `statCols` must align with `QualityWeights.statW` order.
    */
  def frozenScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      statCols: Seq[String]): DataFrame = {
    import graft.model.QualityWeights.{intercept, numBuckets, statW, textW}
    require(statCols.length == statW.length,
      s"expected ${statW.length} stat columns, got ${statCols.length}")
    val wArr = array(textW.map(lit): _*)
    val bucket = (t: Column) =>
      (conv(substring(md5(t), 1, 4), 16, 10).cast("long") % numBuckets)
        .cast("int")
    val textScore = aggregate(
      QualityRules.spaceTokens(coalesce(col(textCol), lit(""))),
      lit(0.0),
      (acc, t) => acc + element_at(wArr, bucket(t) + 1))
    val statScore = statCols.zip(statW)
      .map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _)
    val r6 = (c: Column) => floor(c * 1000000 + lit(0.50001)) / 1000000
    df.withColumn("__m", r6(textScore + statScore + lit(intercept)))
      .withColumn("predicted", (col("__m") >= 0).cast("int"))
      .withColumn("p_good", r6(lit(1.0) / (lit(1.0) + exp(-col("__m")))))
      .drop("__m")
  }
}
