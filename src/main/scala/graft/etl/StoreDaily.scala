package graft.etl

import graft.model.{Silver, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A1–A3: the per-(store, day) rollup — the reference's core aggregate
  * (reference: backend/functions/calculate-metrics/lambda_function.py:107-184).
  *
  * Scale posture: one hash aggregation keyed (store_id, sale_date) with
  * map-side partial aggregation; no joins. At 100 TB this is a single
  * shuffle on the natural partition key of the lake (the reference
  * partitions its lake by exactly these columns,
  * process_upload.py:205) — with the lake bucketed/partitioned by date
  * the shuffle disappears entirely.
  */
object StoreDaily {

  /** Exact-decimal form of A1, reused by company/product re-aggregations
    * (keeps all downstream sums order-independent → oracle-exact).
    *
    * CACHED: this is the engine's materialized (store, day) summary table —
    * the reference PERSISTS exactly this relation in DynamoDB
    * (write-metrics:77-104) and every read path re-queries it rather than
    * the raw line items. Our medallion equivalent is a silver parquet
    * table maintained incrementally by [[graft.streaming.StreamingIngest]];
    * in the ad-hoc query path the cache plays that role (CacheManager
    * dedupes by plan, so all ~15 downstream operators share one entry;
    * |stores|×|days| rows — dimension-sized at any fact-table scale). */
  def rollupDec(spark: SparkSession, dir: String): DataFrame =
    Silver.memoize(spark, "rollupDec", dir) {
      Tables.sales(spark, dir)
        .groupBy(col("store_id"), col("sale_date"))
        .agg(
          sum(col("line_total")).as("gross_dec"),
          sum(col("discount_amount")).as("disc_dec"),
          count(lit(1)).as("transaction_count"),
          sum(col("quantity")).as("item_count"))
        .cache()
    }

  val rollupDecSql: String =
    s"""SELECT store_id, sale_date,
       |  SUM(line_total) AS gross_dec,
       |  SUM(discount_amount) AS disc_dec,
       |  COUNT(*) AS transaction_count,
       |  CAST(SUM(quantity) AS BIGINT) AS item_count
       |FROM (${Tables.salesSql})
       |GROUP BY store_id, sale_date""".stripMargin

  /** A1: total_sales, total_discount, net_sales, transaction_count
    * (deliberately the LINE-ITEM count, not distinct transaction ids —
    * calculate-metrics/lambda_function.py:151), item_count, avg_transaction.
    */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    rollupDec(spark, dir)
      .select(
        col("store_id"), col("sale_date"),
        col("gross_dec").cast("double").as("total_sales"),
        col("disc_dec").cast("double").as("total_discount"),
        (col("gross_dec") - col("disc_dec")).cast("double").as("net_sales"),
        col("transaction_count"),
        col("item_count"),
        ((col("gross_dec") - col("disc_dec")).cast("double") / col("transaction_count"))
          .as("avg_transaction"))
      .orderBy(col("store_id"), col("sale_date"))

  val rollupSql: String =
    s"""WITH sales AS (${Tables.salesSql})
       |SELECT store_id, sale_date,
       |  CAST(SUM(line_total) AS DOUBLE) AS total_sales,
       |  CAST(SUM(discount_amount) AS DOUBLE) AS total_discount,
       |  CAST(SUM(line_total) - SUM(discount_amount) AS DOUBLE) AS net_sales,
       |  COUNT(*) AS transaction_count,
       |  CAST(SUM(quantity) AS BIGINT) AS item_count,
       |  CAST(SUM(line_total) - SUM(discount_amount) AS DOUBLE) / COUNT(*) AS avg_transaction
       |FROM sales
       |GROUP BY store_id, sale_date
       |ORDER BY store_id, sale_date""".stripMargin

  /** Exact-decimal per-(store, day, method) payment summary — the silver
    * payment relation. CACHED like [[rollupDec]]: the orders join (the one
    * fact-to-fact join in the engine, needed only to derive
    * payment_method) runs ONCE; a2/a6/a9/x1 then re-aggregate this
    * dimension-sized relation (≤ stores×days×5 rows). The production twin
    * is the payment_daily silver table ([[Materialize.writeSummaries]]) —
    * at 100 TB the join happens once per ingest increment, never per
    * read query. Decimal partials re-aggregate exactly, so every
    * downstream sum is unchanged. */
  def paymentDec(spark: SparkSession, dir: String): DataFrame =
    Silver.memoize(spark, "paymentDec", dir) {
      Tables.salesWithPayment(spark, dir)
        .groupBy(col("store_id"), col("sale_date"), col("payment_method"))
        .agg(
          sum(col("line_total") - col("discount_amount")).as("amt_dec"),
          sum(col("line_total")).as("gross_dec"),
          count(lit(1)).as("txn"),
          sum(col("quantity")).as("item_count"))
        .cache()
    }

  /** A2: payment breakdown — per (store, day, method):
    * sum(line_total - discount_amount)
    * (calculate-metrics/lambda_function.py:128,143,170-173). Kept relational
    * (long form) rather than a map column: map columns don't survive the
    * oracle compare, and long form re-aggregates without explode at scale.
    * Reads the cached [[paymentDec]] silver relation. */
  def paymentBreakdown(spark: SparkSession, dir: String): DataFrame =
    paymentDec(spark, dir)
      .select(col("store_id"), col("sale_date"), col("payment_method"),
        col("amt_dec").cast("double").as("amount"))
      .orderBy(col("store_id"), col("sale_date"), col("payment_method"))

  val paymentBreakdownSql: String =
    s"""WITH sales AS (${Tables.salesWithPaymentSql})
       |SELECT store_id, sale_date, payment_method,
       |  CAST(SUM(line_total - discount_amount) AS DOUBLE) AS amount
       |FROM sales
       |GROUP BY store_id, sale_date, payment_method
       |ORDER BY store_id, sale_date, payment_method""".stripMargin

  /** A3/O1: top-5 products per (store, day) by revenue
    * (calculate-metrics/lambda_function.py:155-167). Ties broken by sku
    * (Python's sort is stable; SQL needs the explicit tiebreak —
    * SURVEY.md §7.4). Window row_number keeps the whole thing one shuffle;
    * at scale Catalyst plans partial top-k per partition via
    * WindowGroupLimit pushdown (rank-limit optimization). */
  def topProducts(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    topProductsDec(spark, dir, k)
      .select(col("store_id"), col("sale_date"), col("rank"), col("sku"),
        col("units"), col("rev_dec").cast("double").as("revenue"))
      .orderBy(col("store_id"), col("sale_date"), col("rank"))

  /** Exact-decimal top-k-per-(store,day), reused by the lossy product
    * rollup (A7) which by reference semantics aggregates truncated
    * per-store top-5s, not raw line items.
    *
    * CACHED: this is the engine's product_daily silver relation — the
    * reference PERSISTS it (calc-product-metrics:117-133) and seven read
    * paths (a3/a7/a8/j6/a26/d7/r2) re-aggregate it. Output is bounded at
    * k×stores×days rows regardless of fact-table size. */
  def topProductsDec(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Silver.memoize(spark, s"topProductsDec:$k", dir) {
      topProductsFrom(Tables.sales(spark, dir), k).cache()
    }

  /** Date-bounded variant: a range FILTER over the shared
    * [[topProductsDec]] silver — the same read path [[graft.analytics
    * .Trends]]' sdRange takes over rollupDec. In production the
    * product_daily silver is PERSISTED partitioned by sale_date, so this
    * filter is partition pruning on a k×stores×days-bounded table; the
    * earlier build-from-pruned-fact-scan formulation recomputed the
    * rollup per query and only helped when the queried range was a small
    * slice of an UNSUMMARIZED lake (not the medallion architecture this
    * engine materializes). Values are identical either way. */
  def topProductsDecRange(spark: SparkSession, dir: String, k: Int,
                          from: String, to: String): DataFrame =
    topProductsDec(spark, dir, k)
      .filter(col("sale_date").between(from, to))

  private def topProductsFrom(sales: DataFrame, k: Int): DataFrame = {
    val perSku = sales
      .groupBy(col("store_id"), col("sale_date"), col("sku"))
      .agg(
        sum(col("quantity")).as("units"),
        sum(col("line_total") - col("discount_amount")).as("rev_dec"))
    val w = Window.partitionBy(col("store_id"), col("sale_date"))
      .orderBy(col("rev_dec").desc, col("sku").asc)
    perSku
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The reference's complete store-daily summary DOCUMENT — one row per
    * (store, day) with the nested `top_products: array<struct>` (sorted,
    * truncated to 5) and `payment_breakdown: map<method, amount>` columns
    * (write-metrics:77-98's DynamoDB item as a typed nested row;
    * map_from_entries over the per-method aggregate). Not oracle-checked
    * (nested values don't hash-compare portably — their flat projections
    * j6/x1/a2 are); value-consistency with the flat relations is
    * spec-tested. */
  def summaryDocument(spark: SparkSession, dir: String): DataFrame = {
    val base = rollupDec(spark, dir)
    val top = topProductsDec(spark, dir, 5)
      .groupBy(col("store_id"), col("sale_date"))
      .agg(array_sort(collect_list(struct(col("rank"), col("sku"),
        col("units"), col("rev_dec")))).as("top_products"))
    val pay = Tables.salesWithPayment(spark, dir)
      .groupBy(col("store_id"), col("sale_date"), col("payment_method"))
      .agg(sum(col("line_total") - col("discount_amount")).as("amt_dec"))
      .groupBy(col("store_id"), col("sale_date"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("payment_method"), col("amt_dec"))))).as("payment_breakdown"))
    base
      .join(top, Seq("store_id", "sale_date"), "left")
      .join(pay, Seq("store_id", "sale_date"), "left")
      .select(col("store_id"), col("sale_date"),
        col("gross_dec").cast("double").as("total_sales"),
        col("disc_dec").cast("double").as("total_discount"),
        (col("gross_dec") - col("disc_dec")).cast("double").as("net_sales"),
        col("transaction_count"), col("item_count"),
        col("top_products"), col("payment_breakdown"))
  }

  def topProductsDecSql(k: Int = 5): String =
    s"""SELECT * FROM (
       |  SELECT store_id, sale_date, sku,
       |    CAST(SUM(quantity) AS BIGINT) AS units,
       |    SUM(line_total - discount_amount) AS rev_dec,
       |    ROW_NUMBER() OVER (PARTITION BY store_id, sale_date
       |      ORDER BY SUM(line_total - discount_amount) DESC, sku ASC) AS rank
       |  FROM (${Tables.salesSql})
       |  GROUP BY store_id, sale_date, sku)
       |WHERE rank <= $k""".stripMargin

  def topProductsSql(k: Int = 5): String =
    s"""WITH sales AS (${Tables.salesSql}),
       |per_sku AS (
       |  SELECT store_id, sale_date, sku,
       |    CAST(SUM(quantity) AS BIGINT) AS units,
       |    SUM(line_total - discount_amount) AS rev_dec
       |  FROM sales GROUP BY store_id, sale_date, sku),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY store_id, sale_date
       |    ORDER BY rev_dec DESC, sku ASC) AS rank
       |  FROM per_sku)
       |SELECT store_id, sale_date, rank, sku, units,
       |  CAST(rev_dec AS DOUBLE) AS revenue
       |FROM ranked WHERE rank <= $k
       |ORDER BY store_id, sale_date, rank""".stripMargin
}
