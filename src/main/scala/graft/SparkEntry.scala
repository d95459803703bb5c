package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries; every entry in `queries`
  * that is SQL-expressible has a matching DuckDB oracle in `oracleSql`
  * with identical column names and ORDER BY (the driver hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmQueries.queries ++
      graft.queries.Extended.queries ++ graft.queries.Pipeline.queries ++
      graft.queries.Curation.queries ++ graft.queries.Analytics.queries ++
      graft.queries.Advanced.queries ++ graft.queries.TpchTail.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.LlmQueries.oracleSql ++
      graft.queries.Extended.oracleSql ++ graft.queries.Pipeline.oracleSql ++
      graft.queries.Curation.oracleSql ++ graft.queries.Analytics.oracleSql ++
      graft.queries.Advanced.oracleSql ++ graft.queries.TpchTail.oracleSql
}
