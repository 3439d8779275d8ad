package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.{StoreDaily, CompanyDaily, ProductDaily, Completeness}
import graft.analytics.Kpis

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
    "a3_top_products" -> ((s, dir) => StoreDaily.topProducts(s, dir)),
    "a4_company_daily" -> ((s, dir) => CompanyDaily.rollup(s, dir)),
    "a5_best_worst_store" -> ((s, dir) => CompanyDaily.bestWorstStore(s, dir)),
    "a6_company_payment" -> ((s, dir) => CompanyDaily.paymentRollup(s, dir)),
    "a7_product_rollup_lossy" -> ((s, dir) => ProductDaily.rollupLossy(s, dir)),
    "a8_top10_products" -> ((s, dir) => ProductDaily.top10Lossy(s, dir)),
    "a9_kpis" -> ((s, dir) => Kpis.kpis(s, dir)),
    "a18_available_dates" -> ((s, dir) => Kpis.availableDates(s, dir)),
    "a19_completeness" -> ((s, dir) => Completeness.completeness(s, dir)),
    "j3_missing_stores" -> ((s, dir) => Completeness.missingStores(s, dir)),
    "product_rollup_exact" -> ((s, dir) => ProductDaily.rollupExact(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a1_store_daily" -> StoreDaily.rollupSql,
    "a2_payment_breakdown" -> StoreDaily.paymentBreakdownSql,
    "a3_top_products" -> StoreDaily.topProductsSql(),
    "a4_company_daily" -> CompanyDaily.rollupSql,
    "a5_best_worst_store" -> CompanyDaily.bestWorstStoreSql,
    "a6_company_payment" -> CompanyDaily.paymentRollupSql,
    "a7_product_rollup_lossy" -> ProductDaily.rollupLossySql,
    "a8_top10_products" -> ProductDaily.top10LossySql,
    "a9_kpis" -> Kpis.kpisSql(),
    "a18_available_dates" -> Kpis.availableDatesSql,
    "a19_completeness" -> Completeness.completenessSql(),
    "j3_missing_stores" -> Completeness.missingStoresSql(),
    "product_rollup_exact" -> ProductDaily.rollupExactSql
  )
}
