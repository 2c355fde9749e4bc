package graft

import graft.queries.{GraphQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract (see SURVEY.md §7 and the harness docs):
 *  - `entry`: flagship query, smoke-checked at sf0.001;
 *  - `queries`: one entry per implemented operator from SURVEY.md §2
 *    (and per training-pipeline extension), each `(spark, sfDir) =>
 *    DataFrame` over the parquet tables in sfDir;
 *  - `oracleSql`: DuckDB-equivalent SQL per query; omitted for
 *    non-SQL-expressible operators (Pregel phases), which get a
 *    rows-only check.
 *
 * Column names are aliased identically on both sides — the driver's
 * comparison sorts columns by name before hashing.
 */
object SparkEntry {

  /** Flagship: full batch DWCC community detection on the
   * co-purchase graph (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    GraphQueries.wccPartition(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++
      PipelineQueries.queries ++ Map(
      "s_stream_hourly" -> (graft.streaming.StreamOps.hourlyEventCounts _))

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++
      PipelineQueries.oracles ++ Map(
      // the streaming query drains the bounded source completely, so
      // its final table equals the batch aggregation
      "s_stream_hourly" -> RelationalQueries.oracles("r_events_hourly"))
}
