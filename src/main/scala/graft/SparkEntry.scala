package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.compile.QueryCompiler
import graft.ir._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * lucene-filtered, auto-granularity time-series count by event_type —
    * the reference's core search-page chart shape (SURVEY §3.1). */
  def entry(spark: SparkSession): DataFrame =
    QueryCompiler.compile(
      Query(
        select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
        from = "events",
        where = Some(Cond.Lucene("error")),
        groupBy = Seq("event_type"),
        granularity = Some(Granularity.Auto),
        dateRange = Some(QueryCompiler.range(
          "2024-01-01T00:00:00Z", "2024-03-01T00:00:00Z"))),
      Queries.cat(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ MetricQueries.all ++ PipelineQueries.all ++
      AnalysisQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ MetricQueries.oracles ++ PipelineQueries.oracles ++
      AnalysisQueries.oracles
}
