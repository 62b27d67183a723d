package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.{DocumentSuite, RelationalSuite, ScrapeSuite, StreamingSuite}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every suite's operators; `oracleSql` carries the
  * DuckDB-equivalent SQL for each hash-checked key (rows-only operators
  * are present in `queries` but absent here).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalSuite.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalSuite.queries ++ DocumentSuite.queries ++ ScrapeSuite.queries ++
      StreamingSuite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalSuite.oracles ++ DocumentSuite.oracles ++ ScrapeSuite.oracles ++
      StreamingSuite.oracles
}
