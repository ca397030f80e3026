package graft.model

import graft.Tables
import graft.operators.QualityRules
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** One-shot trainer that generates the [[QualityWeights]] fixture — run
  * manually when the feature space changes, never by the query path:
  *
  * {{{ sbt "runMain graft.model.QualityWeightsTrainer /root/testdata/sf0.01" }}}
  *
  * Trains the same weakly-supervised logistic regression as
  * [[graft.operators.QualityModel.weaklySupervisedScore]] but over the
  * SQL-replayable md5-bucket bag-of-words (not HashingTF's murmur3), so
  * the learned hyperplane can be applied — and hash-checked — by a pure
  * deterministic scoring pass on any engine. Prints the Scala fixture
  * body to stdout for pasting into `QualityWeights.scala`.
  *
  * The 256-bucket count array is built natively (no UDF): bucket ids per
  * token via the md5 gate, then one `transform(sequence(0,255), b ->
  * size(filter(bs, x -> x = b)))` pass — O(256·tokens) per doc, which is
  * irrelevant at training scale and keeps the feature build inside
  * codegen; `array_to_vector` bridges to spark.ml without a UDF.
  */
object QualityWeightsTrainer {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession
      .builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val labeled = QualityRules
      .gopherSignals(Tables.documents(spark, sfDir), "text")
      .select(
        col("doc_id"), col("text"),
        col("gopher_pass").cast("double").as("weak_label"),
        col("n_words").cast("double").as("f_nw"),
        (col("n_words") * col("n_words")).cast("double").as("f_nw2"),
        col("mean_word_len").as("f_mwl"),
        (col("mean_word_len") * col("mean_word_len")).as("f_mwl2"),
        col("stop_hits").cast("double").as("f_stop"))

    val nb = QualityWeights.numBuckets
    val buckets = transform(
      QualityRules.spaceTokens(col("text")),
      t => (conv(substring(md5(t), 1, 4), 16, 10).cast("long") % nb).cast("int"))
    val counts = transform(
      sequence(lit(0), lit(nb - 1)),
      b => size(filter(col("__b"), x => x === b)).cast("double"))
    val feat = labeled
      .withColumn("__b", buckets)
      .withColumn("__tf", array_to_vector(counts))
      .drop("__b")
      .localCheckpoint(true)

    val assembled = new VectorAssembler()
      .setInputCols(Array("__tf", "f_nw", "f_nw2", "f_mwl", "f_mwl2", "f_stop"))
      .setOutputCol("__features")
      .transform(feat)
    val model = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("weak_label")
      .setMaxIter(50).setRegParam(1e-4)
      .fit(assembled)

    val w = model.coefficients.toArray
    require(w.length == nb + 5, s"unexpected coefficient width ${w.length}")

    val scored = model.transform(assembled)
      .select(col("weak_label").cast("int"), col("prediction").cast("int"))
      .collect()
    val acc = scored.count(r => r.getInt(0) == r.getInt(1)).toDouble / scored.length
    println(s"// training accuracy at $sfDir: $acc over ${scored.length} docs")

    def fmt(a: Array[Double], per: Int): String =
      a.grouped(per).map(_.mkString(", ")).mkString(",\n    ")
    println(s"  val textW: Array[Double] = Array(\n    ${fmt(w.take(nb), 4)})")
    println(s"  val statW: Array[Double] = Array(\n    ${fmt(w.drop(nb), 2)})")
    println(s"  val intercept: Double = ${model.intercept}")
    spark.stop()
  }
}
