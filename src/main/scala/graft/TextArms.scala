package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query resolution shared by [[TextScaleBench]] (in-sweep) and
  * [[TextScaleOne]] (fresh-JVM isolate): the registered SparkEntry
  * queries plus the sweep-only arms that have no DuckDB-oracle
  * registration — the text-only fused pipeline (skips q150's
  * decontamination stage: `decontam = None`), the FULL fused pipeline
  * over the sweep's synthetic embedding table (`fused_decontam`, r14
  * verdict #3 — the one stage with a second-table join finally has
  * fused scale evidence; requires the `embeddings.parquet`
  * [[TextScaleBench]] now generates at points within the committed
  * codebook ceiling), and the 10-epoch q146 (proves the epoch
  * dimension scales linearly).
  */
object TextArms {

  val extra: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fused_pipeline" -> ((s: SparkSession, dir: String) =>
      graft.operators.CurationPipeline.curateToShards(
        Tables.documents(s, dir), "doc_id", "text", decontam = None,
        merges = graft.model.BpeMerges.merges,
        idOf = graft.model.BpeMerges.idOf)),
    "fused_decontam" -> ((s: SparkSession, dir: String) =>
      graft.operators.CurationPipeline.curateToShards(
        Tables.documents(s, dir), "doc_id", "text",
        decontam = Some((
          Tables.embeddings(s, dir)
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding")),
          graft.model.IvfCentroids.blockingFor(s, dir))),
        merges = graft.model.BpeMerges.merges,
        idOf = graft.model.BpeMerges.idOf)),
    "epoch_order_10" -> ((s: SparkSession, dir: String) =>
      graft.queries.TrainQueries.epochOrder(s, dir, nEpochs = 10L)))

  def fn(name: String): (SparkSession, String) => DataFrame =
    extra.getOrElse(name, SparkEntry.queries(name))
}
