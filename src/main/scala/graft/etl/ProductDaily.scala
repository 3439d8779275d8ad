package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A7/A8/O2: product rollups (reference: backend/functions/
  * calc-product-metrics/lambda_function.py:76-133 and
  * get-analytics/lambda_function.py:234-258).
  *
  * The reference's product rollup is DELIBERATELY LOSSY: it aggregates the
  * per-store TOP-5 lists, not raw line items (SURVEY.md §7.4). We preserve
  * that semantic exactly and offer an exact variant alongside.
  *
  * Scale posture: the top-5 truncation happens per (store,day) partition
  * BEFORE the company-wide shuffle, so the re-aggregation input is bounded
  * at 5 rows × stores × days regardless of fact-table size — the reference's
  * design is accidentally a good distributed-aggregation pattern and we keep
  * it. The exact variant is one groupBy(sku) over the fact table.
  */
object ProductDaily {

  /** A7: per-(date, sku) rollup of the per-store top-5s, with the product
    * name from `part` (reference carries item_name through; last-seen-wins
    * there, deterministic dimension join here) and the distinct selling
    * stores as a sorted CSV. */
  def rollupLossy(spark: SparkSession, dir: String): DataFrame = {
    val top5 = StoreDaily.topProductsDec(spark, dir, 5)
    val names = Tables.part(spark, dir)
      .select(col("p_partkey").as("sku"), col("p_name").as("product_name"))
    // one collect_set serves both store_count (its size) and the CSV —
    // a separate countDistinct would add an Expand + second aggregate pass
    top5.groupBy(col("sale_date"), col("sku"))
      .agg(
        sum(col("units")).as("units_sold"),
        sum(col("rev_dec")).as("rev_dec"),
        sort_array(collect_set(col("store_id"))).as("stores_arr"))
      .join(broadcast(names), Seq("sku"), "left")
      .select(col("sale_date"), col("sku"), col("product_name"),
        col("units_sold"), col("rev_dec").cast("double").as("revenue"),
        size(col("stores_arr")).cast("long").as("store_count"),
        array_join(col("stores_arr"), ",").as("stores_sold_at"))
      .orderBy(col("sale_date"), col("sku"))
  }

  val rollupLossySql: String =
    s"""WITH top5 AS (${StoreDaily.topProductsDecSql(5)})
       |SELECT t.sale_date, t.sku, p.p_name AS product_name,
       |  CAST(SUM(t.units) AS BIGINT) AS units_sold,
       |  CAST(SUM(t.rev_dec) AS DOUBLE) AS revenue,
       |  COUNT(DISTINCT t.store_id) AS store_count,
       |  string_agg(DISTINCT t.store_id, ',' ORDER BY t.store_id) AS stores_sold_at
       |FROM top5 t LEFT JOIN part p ON t.sku = p.p_partkey
       |GROUP BY t.sale_date, t.sku, p.p_name
       |ORDER BY t.sale_date, t.sku""".stripMargin

  /** A8/O2: company top-10 products by total (lossy) revenue across all
    * dates — the read-time re-aggregation shape. */
  def top10Lossy(spark: SparkSession, dir: String): DataFrame = {
    val top5 = StoreDaily.topProductsDec(spark, dir, 5)
    val names = Tables.part(spark, dir)
      .select(col("p_partkey").as("sku"), col("p_name").as("product_name"))
    top5.groupBy(col("sku"))
      .agg(sum(col("units")).as("units_sold"), sum(col("rev_dec")).as("rev_dec"))
      .join(broadcast(names), Seq("sku"), "left")
      .orderBy(col("rev_dec").desc, col("sku").asc)
      .limit(10)
      .select(col("sku"), col("product_name"), col("units_sold"),
        col("rev_dec").cast("double").as("revenue"))
  }

  val top10LossySql: String =
    s"""WITH top5 AS (${StoreDaily.topProductsDecSql(5)})
       |SELECT t.sku, p.p_name AS product_name,
       |  CAST(SUM(t.units) AS BIGINT) AS units_sold,
       |  CAST(SUM(t.rev_dec) AS DOUBLE) AS revenue
       |FROM top5 t LEFT JOIN part p ON t.sku = p.p_partkey
       |GROUP BY t.sku, p.p_name
       |ORDER BY SUM(t.rev_dec) DESC, t.sku ASC
       |LIMIT 10""".stripMargin

  /** Exact (non-lossy) product rollup over raw line items — the variant the
    * reference can't produce from its materialized top-5s. Documents the
    * bias of A7 by construction. */
  def rollupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.sales(spark, dir)
      .groupBy(col("sku"))
      .agg(
        sum(col("quantity")).as("units_sold"),
        sum(col("line_total") - col("discount_amount")).as("rev_dec"),
        countDistinct(col("store_id")).as("store_count"))
      .select(col("sku"), col("units_sold"),
        col("rev_dec").cast("double").as("revenue"), col("store_count"))
      .orderBy(col("sku"))

  val rollupExactSql: String =
    s"""SELECT sku,
       |  CAST(SUM(quantity) AS BIGINT) AS units_sold,
       |  CAST(SUM(line_total - discount_amount) AS DOUBLE) AS revenue,
       |  COUNT(DISTINCT store_id) AS store_count
       |FROM (${Tables.salesSql})
       |GROUP BY sku
       |ORDER BY sku""".stripMargin

  /** a26: quantified bias of the reference's lossy rollup — per sku, the
    * revenue the top-5 truncation loses vs the exact fact-table rollup
    * (lossy ≤ exact by construction; documents SURVEY §7.4's "lossy
    * product rollup" risk as a measurement instead of a footnote). */
  def rollupBias(spark: SparkSession, dir: String): DataFrame = {
    val lossy = StoreDaily.topProductsDec(spark, dir, 5)
      .groupBy(col("sku")).agg(sum(col("rev_dec")).as("lossy_dec"))
    val exact = Tables.sales(spark, dir)
      .groupBy(col("sku"))
      .agg(sum(col("line_total") - col("discount_amount")).as("exact_dec"))
    exact.join(lossy, Seq("sku"), "left")
      .select(col("sku"),
        col("exact_dec").cast("double").as("exact_revenue"),
        coalesce(col("lossy_dec"), lit(0)).cast("double").as("lossy_revenue"),
        (col("exact_dec") - coalesce(col("lossy_dec"), lit(0))).cast("double")
          .as("underreported"))
      .orderBy(col("sku"))
  }

  val rollupBiasSql: String =
    s"""WITH top5 AS (${StoreDaily.topProductsDecSql(5)}),
       |lossy AS (SELECT sku, SUM(rev_dec) AS lossy_dec FROM top5 GROUP BY sku),
       |exact AS (
       |  SELECT sku, SUM(line_total - discount_amount) AS exact_dec
       |  FROM (${Tables.salesSql}) GROUP BY sku)
       |SELECT e.sku,
       |  CAST(e.exact_dec AS DOUBLE) AS exact_revenue,
       |  CAST(COALESCE(l.lossy_dec, 0) AS DOUBLE) AS lossy_revenue,
       |  CAST(e.exact_dec - COALESCE(l.lossy_dec, 0) AS DOUBLE) AS underreported
       |FROM exact e LEFT JOIN lossy l USING (sku)
       |ORDER BY e.sku""".stripMargin
}
