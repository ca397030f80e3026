package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query resolution shared by [[TextScaleBench]] (in-sweep) and
  * [[TextScaleOne]] (fresh-JVM isolate): the registered SparkEntry
  * queries plus the sweep-only arms that have no DuckDB-oracle
  * registration — the text-only fused pipeline (the sweep corpora carry
  * no embedding table or frozen codebook, so q150's decontamination
  * stage is skipped — the documented text-only arm) and the 10-epoch
  * q146 (proves the epoch dimension scales linearly).
  */
object TextArms {

  val extra: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fused_pipeline" -> ((s: SparkSession, dir: String) =>
      graft.operators.CurationPipeline.curateToShards(
        Tables.documents(s, dir), "doc_id", "text", decontam = None,
        merges = graft.model.BpeMerges.merges,
        idOf = graft.model.BpeMerges.idOf)),
    "epoch_order_10" -> ((s: SparkSession, dir: String) =>
      graft.queries.TrainQueries.epochOrder(s, dir, nEpochs = 10L)))

  def fn(name: String): (SparkSession, String) => DataFrame =
    extra.getOrElse(name, SparkEntry.queries(name))
}
