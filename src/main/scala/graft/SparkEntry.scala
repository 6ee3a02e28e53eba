package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registry is assembled from per-family modules in graft.queries.
  */
object SparkEntry {
  private type Q = Map[String, (SparkSession, String) => DataFrame]

  private def queryMaps: Seq[Q] = Seq(
    _root_.graft.queries.VectorQueries.queries,
    _root_.graft.queries.IngestQueries.queries,
    _root_.graft.queries.RelationalQueries.queries,
    _root_.graft.queries.WindowSetQueries.queries,
    _root_.graft.queries.ScalarQueries.queries,
    _root_.graft.queries.TextQueries.queries,
    _root_.graft.queries.DedupQueries.queries,
    _root_.graft.queries.CoverageQueries.queries,
    _root_.graft.queries.EventAnalyticsQueries.queries,
    _root_.graft.queries.PipelineQueries.queries,
    _root_.graft.queries.SparseBinaryQueries.queries
  )

  private def sqlMaps: Seq[Map[String, String]] = Seq(
    _root_.graft.queries.VectorQueries.oracleSql,
    _root_.graft.queries.IngestQueries.oracleSql,
    _root_.graft.queries.RelationalQueries.oracleSql,
    _root_.graft.queries.WindowSetQueries.oracleSql,
    _root_.graft.queries.ScalarQueries.oracleSql,
    _root_.graft.queries.TextQueries.oracleSql,
    _root_.graft.queries.DedupQueries.oracleSql,
    _root_.graft.queries.CoverageQueries.oracleSql,
    _root_.graft.queries.EventAnalyticsQueries.oracleSql,
    _root_.graft.queries.PipelineQueries.oracleSql,
    _root_.graft.queries.SparseBinaryQueries.oracleSql
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.VectorQueries.knnL2(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Q = queryMaps.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = sqlMaps.reduce(_ ++ _)
}
