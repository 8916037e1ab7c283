package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{FunctionQueries, JsoniqQueries, PipelineQueries, RelationalQueries, StreamingQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Temporal cross-revision join (SURVEY.md §2.3 "flagship demo query"):
    * two as-of snapshots of the events changelog joined on node identity,
    * mirroring docs/ARCHITECTURE.md:469-486 in the reference.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.TemporalQueries.queries("t_diff_snapshots")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (TemporalQueries.queries, TemporalQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (FunctionQueries.queries, FunctionQueries.oracles),
      (StreamingQueries.queries, StreamingQueries.oracles),
      (JsoniqQueries.queries, JsoniqQueries.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
