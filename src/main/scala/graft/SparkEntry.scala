package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every library query set, in presentation order. */
  private def querySets: Seq[Q] =
    CoreQueries.all ++ TextQueries.all ++ VectorQueries.all ++ MediaQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-by-nation star join: broadcast dims + decimal-exact measures. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    querySets.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    querySets.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
