package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in `queries` is one operator from SURVEY.md §2 (or a
  * beyond-reference LLM-pipeline operator); `oracleSql` holds the
  * equivalent DuckDB SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TimeSeries.tvl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_tvl"             -> (TimeSeries.tvl _),
    "ts_gotk"            -> (TimeSeries.gotk _),
    "ts_total_return"    -> (TimeSeries.totalReturn _),
    "ts_trailing_return" -> (TimeSeries.trailingReturn _),
    "ts_interpolate"     -> (TimeSeries.interpolate _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ts_tvl"             -> OracleSql.tsTvl,
    "ts_gotk"            -> OracleSql.tsGotk,
    "ts_total_return"    -> OracleSql.tsTotalReturn,
    "ts_trailing_return" -> OracleSql.tsTrailingReturn,
    "ts_interpolate"     -> OracleSql.tsInterpolate
  )
}
