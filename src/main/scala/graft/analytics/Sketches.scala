package graft.analytics

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the operators you reach for at
  * 100 TB when exactness isn't contractual (SURVEY.md §7.5): HyperLogLog++
  * distinct counts and GK-sketch quantiles. Fixed-size sketch state means
  * map-side partials stay KB-sized regardless of input rows, and merges
  * are associative — the shuffle carries sketches, not values.
  *
  * Registered WITHOUT oracle SQL: approximate results are
  * implementation-defined, so the driver records the rows-only check.
  * The exact twins (e2 hourly n_users; a18 distinct dates) are the
  * correctness anchors; [[SketchesSpec]] bounds the approximation error
  * against them. */
object Sketches {

  /** sk1: daily approx distinct users + approx event-value quantiles.
    * rsd 0.01 ≈ HLL with 2^14 registers — 16 KB per group. */
  def dailyApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("user_id"), col("value"))
      .groupBy(col("event_date"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_date"))

  /** sk2: approx distinct skus sold per store across the whole fact table
    * — the "how many products does each store actually move" question that
    * needs no exact answer at scale. */
  def storeSkuApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.sales(spark, dir)
      .groupBy(col("store_id"))
      .agg(
        approx_count_distinct(col("sku"), rsd = 0.02).as("approx_skus"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("store_id"))
}
