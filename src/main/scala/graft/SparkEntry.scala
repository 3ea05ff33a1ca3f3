package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, DataOpsQueries, EventQueries, ExtendedQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has an entry in [[queries]]; each
  * SQL-expressible one also has a DuckDB oracle in [[oracleSql]] with
  * identical column names and deterministic (engine-independent) values.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03JoinDims(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ DataOpsQueries.all ++ EventQueries.all ++ ExtendedQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ DataOpsQueries.oracles ++ EventQueries.oracles ++ ExtendedQueries.oracles
}
