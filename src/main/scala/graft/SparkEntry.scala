package graft

import graft.queries.{AnalyticsQueries, CoreQueries, CurationQueries, EngineQueries, EntityQueries, ExtQueries, GraphQueries, PipelineQueries, PqQueries, RetrievalQueries, ScaleQueries, StorageQueries, TrainQueries, WarehouseQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs("q01_agg_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ ExtQueries.defs ++ PipelineQueries.defs ++
      TrainQueries.defs ++ EngineQueries.defs ++ ScaleQueries.defs ++
      StorageQueries.defs ++ RetrievalQueries.defs ++ CurationQueries.defs ++
      GraphQueries.defs ++ WarehouseQueries.defs ++ EntityQueries.defs ++
      AnalyticsQueries.defs ++ PqQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ExtQueries.oracles ++ PipelineQueries.oracles ++
      TrainQueries.oracles ++ EngineQueries.oracles ++ ScaleQueries.oracles ++
      StorageQueries.oracles ++ RetrievalQueries.oracles ++ CurationQueries.oracles ++
      GraphQueries.oracles ++ WarehouseQueries.oracles ++ EntityQueries.oracles ++
      AnalyticsQueries.oracles ++ PqQueries.oracles
}
