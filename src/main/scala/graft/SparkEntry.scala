package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-module registries; every entry has a
  * matching DuckDB oracle SQL (or is deliberately rows-only for operators that
  * are not SQL-expressible, e.g. approximate/hash-randomized ones).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.RelationalQueries2.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.TextQueries2.queries ++
      graft.queries.LakeQueries.queries ++
      graft.queries.MasterQueries.queries ++
      graft.queries.RelationalQueries3.queries ++
      graft.queries.ApiQueries.queries ++
      graft.queries.ScaleQueries.queries ++
      graft.queries.TrainingQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.GateQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.SeriesQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.LifecycleQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.RelationalQueries2.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.TextQueries2.oracleSql ++
      graft.queries.LakeQueries.oracleSql ++
      graft.queries.MasterQueries.oracleSql ++
      graft.queries.RelationalQueries3.oracleSql ++
      graft.queries.ApiQueries.oracleSql ++
      graft.queries.ScaleQueries.oracleSql ++
      graft.queries.TrainingQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.GateQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.GraphQueries.oracleSql ++
      graft.queries.SeriesQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.LifecycleQueries.oracleSql
}
