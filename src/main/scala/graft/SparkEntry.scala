package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.StoreDaily

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query keys are SURVEY.md §2 operator ids. Every oracle-checked query
  * follows the parity conventions documented in [[graft.model.Tables]]. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StoreDaily.rollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_store_daily" -> ((s, dir) => StoreDaily.rollup(s, dir)),
    "a2_payment_breakdown" -> ((s, dir) => StoreDaily.paymentBreakdown(s, dir)),
    "a3_top_products" -> ((s, dir) => StoreDaily.topProducts(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a1_store_daily" -> StoreDaily.rollupSql,
    "a2_payment_breakdown" -> StoreDaily.paymentBreakdownSql,
    "a3_top_products" -> StoreDaily.topProductsSql()
  )
}
