package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A4–A6: company-level daily rollups — re-aggregations of the per-store
  * summaries (reference: backend/functions/calc-company-metrics/
  * lambda_function.py:76-133).
  *
  * Scale posture: inputs are the (store,day) summary table — 4-5 orders of
  * magnitude smaller than the fact table — so these are cheap regardless;
  * the single groupBy(date) shuffle is on already-reduced data. The
  * stores_reported list is emitted as a sorted CSV string (array columns
  * don't hash-compare portably; CSV matches the reference's BI flattening,
  * export-to-quicksight/lambda_function.py:283-285).
  */
object CompanyDaily {

  /** A4: per-date company rollup across stores.
    * avg_transaction = Σsales/Σtxn, avg_store_sales = Σsales/store_count
    * (calc-company-metrics:97-103); both emitted as raw IEEE quotients of
    * exact operands (rounding on doubles is engine-divergent — Tables doc). */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"))
      .agg(
        sum(col("gross_dec")).as("sales_dec"),
        sum(col("transaction_count")).as("total_transactions"),
        sum(col("item_count")).as("total_items"),
        count(lit(1)).as("store_count"),
        array_join(sort_array(collect_list(col("store_id"))), ",").as("stores_reported"))
      .select(
        col("sale_date"),
        col("sales_dec").cast("double").as("total_sales"),
        col("total_transactions"), col("total_items"), col("store_count"),
        col("stores_reported"),
        (col("sales_dec").cast("double") / col("total_transactions")).as("avg_transaction"),
        (col("sales_dec").cast("double") / col("store_count")).as("avg_store_sales"))
      .orderBy(col("sale_date"))

  val rollupSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql})
       |SELECT sale_date,
       |  CAST(SUM(gross_dec) AS DOUBLE) AS total_sales,
       |  CAST(SUM(transaction_count) AS BIGINT) AS total_transactions,
       |  CAST(SUM(item_count) AS BIGINT) AS total_items,
       |  COUNT(*) AS store_count,
       |  string_agg(store_id, ',' ORDER BY store_id) AS stores_reported,
       |  CAST(SUM(gross_dec) AS DOUBLE) / CAST(SUM(transaction_count) AS BIGINT) AS avg_transaction,
       |  CAST(SUM(gross_dec) AS DOUBLE) / COUNT(*) AS avg_store_sales
       |FROM sd
       |GROUP BY sale_date
       |ORDER BY sale_date""".stripMargin

  /** A5: best & worst store per date (argmax/argmin by total sales,
    * calc-company-metrics:83-85,104-111). Tiebreaks replay Python's
    * STABLE `sorted(..., reverse=True)` over store_id-ordered input
    * (get-store-summaries:83): best = first of the max ties = SMALLEST
    * store_id; worst = `sorted_by_sales[-1]` = last of the min ties =
    * LARGEST store_id. One hash partitioning, two window sorts. */
  def bestWorstStore(spark: SparkSession, dir: String): DataFrame = {
    val sd = StoreDaily.rollupDec(spark, dir)
      .select(col("sale_date"), col("store_id"), col("gross_dec"))
    val wBest = Window.partitionBy(col("sale_date"))
      .orderBy(col("gross_dec").desc, col("store_id").asc)
    val wWorst = Window.partitionBy(col("sale_date"))
      .orderBy(col("gross_dec").asc, col("store_id").desc)
    sd.withColumn("rb", row_number().over(wBest))
      .withColumn("rw", row_number().over(wWorst))
      .groupBy(col("sale_date"))
      .agg(
        max(when(col("rb") === 1, col("store_id"))).as("best_store_id"),
        max(when(col("rb") === 1, col("gross_dec"))).cast("double").as("best_store_sales"),
        max(when(col("rw") === 1, col("store_id"))).as("worst_store_id"),
        max(when(col("rw") === 1, col("gross_dec"))).cast("double").as("worst_store_sales"))
      .orderBy(col("sale_date"))
  }

  val bestWorstStoreSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |ranked AS (
       |  SELECT sale_date, store_id, gross_dec,
       |    ROW_NUMBER() OVER (PARTITION BY sale_date ORDER BY gross_dec DESC, store_id ASC) AS rb,
       |    ROW_NUMBER() OVER (PARTITION BY sale_date ORDER BY gross_dec ASC, store_id DESC) AS rw
       |  FROM sd)
       |SELECT sale_date,
       |  MAX(CASE WHEN rb = 1 THEN store_id END) AS best_store_id,
       |  CAST(MAX(CASE WHEN rb = 1 THEN gross_dec END) AS DOUBLE) AS best_store_sales,
       |  MAX(CASE WHEN rw = 1 THEN store_id END) AS worst_store_id,
       |  CAST(MAX(CASE WHEN rw = 1 THEN gross_dec END) AS DOUBLE) AS worst_store_sales
       |FROM ranked
       |GROUP BY sale_date
       |ORDER BY sale_date""".stripMargin

  /** A6: company payment rollup — merge per-store payment maps by key-sum
    * (calc-company-metrics:88-93). Long-form relational: a second groupBy
    * over the cached A2 silver relation (decimal partials re-aggregate
    * exactly), no explode and no fact-table scan. */
  def paymentRollup(spark: SparkSession, dir: String): DataFrame =
    StoreDaily.paymentDec(spark, dir)
      .groupBy(col("sale_date"), col("payment_method"))
      .agg(sum(col("amt_dec")).as("amt_dec"))
      .select(col("sale_date"), col("payment_method"),
        col("amt_dec").cast("double").as("amount"))
      .orderBy(col("sale_date"), col("payment_method"))

  val paymentRollupSql: String =
    s"""WITH sales AS (${graft.model.Tables.salesWithPaymentSql})
       |SELECT sale_date, payment_method,
       |  CAST(SUM(line_total - discount_amount) AS DOUBLE) AS amount
       |FROM sales
       |GROUP BY sale_date, payment_method
       |ORDER BY sale_date, payment_method""".stripMargin
}
