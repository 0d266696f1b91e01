package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the north-star extensions) is one
  * `QuerySpec` in `allSpecs`; `queries`/`oracleSql` are derived views of it.
  */
object SparkEntry {

  /** All registered query specs, grouped by module. */
  def allSpecs: Seq[QuerySpec] =
    ParityQueries.specs ++ RelationalQueries.specs ++ TimeSeriesQueries.specs ++
      LlmQueries.specs ++ ScaleQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole job end-to-end (SURVEY.md §3): enumerate the
    * catalog, skip system tables, prepare + time-filter + sink-append every
    * table, return the per-table written/skipped ledger.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p06_migrate")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
