package graft.analytics

import graft.etl.Defaults
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A9/A18: read-path KPI aggregates (reference: backend/functions/
  * get-analytics/lambda_function.py:192-230,52-80).
  *
  * A9 replicates a deliberate reference quirk: the flattened KPI/export
  * layer projects only {cash, credit, debit, gift_card} — `mobile` is
  * DROPPED (get-analytics:213-216; export-to-quicksight:205-209) even
  * though it exists in the breakdown maps. We preserve that projection
  * exactly.
  *
  * Scale posture: a single-row global aggregate = map-side partial agg
  * into a 1-row shuffle; the payment pivot is conditional aggregation
  * (no pivot shuffle, no second pass).
  */
object Kpis {

  /** A9: one-row KPI summary for a date range, 4-method payment pivot. */
  def kpis(spark: SparkSession, dir: String,
           from: String = Defaults.rangeStart,
           to: String = Defaults.rangeEnd): DataFrame = {
    def pay(m: String) =
      sum(when(col("payment_method") === m, col("line_total") - col("discount_amount"))
        .otherwise(lit(null))).as(s"pay_${m}_dec")
    Tables.salesWithPaymentInRange(spark, dir, from, to)
      .agg(
        sum(col("line_total")).as("sales_dec"),
        count(lit(1)).as("total_transactions"),
        sum(col("quantity")).as("total_items"),
        pay("cash"), pay("credit"), pay("debit"), pay("gift_card"))
      .select(
        col("sales_dec").cast("double").as("total_sales"),
        col("total_transactions"), col("total_items"),
        (col("sales_dec").cast("double") / col("total_transactions")).as("avg_transaction"),
        col("pay_cash_dec").cast("double").as("payment_cash"),
        col("pay_credit_dec").cast("double").as("payment_credit"),
        col("pay_debit_dec").cast("double").as("payment_debit"),
        col("pay_gift_card_dec").cast("double").as("payment_gift_card"))
  }

  def kpisSql(from: String = Defaults.rangeStart,
              to: String = Defaults.rangeEnd): String =
    s"""WITH sales AS (${Tables.salesWithPaymentSql})
       |SELECT
       |  CAST(SUM(line_total) AS DOUBLE) AS total_sales,
       |  COUNT(*) AS total_transactions,
       |  CAST(SUM(quantity) AS BIGINT) AS total_items,
       |  CAST(SUM(line_total) AS DOUBLE) / COUNT(*) AS avg_transaction,
       |  CAST(SUM(CASE WHEN payment_method = 'cash' THEN line_total - discount_amount END) AS DOUBLE) AS payment_cash,
       |  CAST(SUM(CASE WHEN payment_method = 'credit' THEN line_total - discount_amount END) AS DOUBLE) AS payment_credit,
       |  CAST(SUM(CASE WHEN payment_method = 'debit' THEN line_total - discount_amount END) AS DOUBLE) AS payment_debit,
       |  CAST(SUM(CASE WHEN payment_method = 'gift_card' THEN line_total - discount_amount END) AS DOUBLE) AS payment_gift_card
       |FROM sales
       |WHERE sale_date BETWEEN '$from' AND '$to'""".stripMargin

  /** A18: distinct-date inventory, newest first (get-analytics:80). */
  def availableDates(spark: SparkSession, dir: String): DataFrame =
    Tables.sales(spark, dir)
      .select(col("sale_date")).distinct()
      .orderBy(col("sale_date").desc)

  val availableDatesSql: String =
    s"""SELECT DISTINCT sale_date FROM (${Tables.salesSql})
       |ORDER BY sale_date DESC""".stripMargin
}
