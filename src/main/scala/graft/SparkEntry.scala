package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{CoreQueries, QueryRegistry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Encodes lineitem through the fixedwidth DSv2 format and aggregates —
    * proves scan → decode → agg end-to-end (SURVEY.md §7.1 step 5). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
