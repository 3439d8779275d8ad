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

  /** sk3: approximate top sellers per store via the custom Misra-Gries
    * aggregate ([[graft.functions.TopKByCount]]) — the bounded-state
    * answer to "top products per store" when the per-group key space is
    * too wide for an exact partial aggregate to hold: the shuffle carries
    * a `summarySize`-entry summary per (partition, store), never the full
    * sku distribution. Every estimate is an under-count and `max_err`
    * bounds the loss (est ≤ true ≤ est + max_err); with `summarySize` ≥
    * distinct skus the result is exact — both spec-asserted against the
    * exact a3-style ranking. Rows-only like sk1/sk2 (summary contents
    * are algorithm-defined, not SQL-expressible). */
  def storeTopSellers(spark: SparkSession, dir: String,
                      topK: Int = 5, summarySize: Int = 32): DataFrame =
    Tables.sales(spark, dir)
      .groupBy(col("store_id"))
      // the summary keys are strings (its tie-break is key order): bind
      // the cast explicitly so the key space semantic is visible here
      .agg(graft.functions.TopKByCount
        .topKByCount(col("sku").cast("string"), summarySize).as("mg"))
      .select(col("store_id"), col("mg.max_err").as("max_err"),
        posexplode(slice(col("mg.items"), 1, topK)).as(Seq("idx", "item")))
      .select(col("store_id"), (col("idx") + 1).cast("long").as("rank"),
        col("item.sku").as("sku"), col("item.est_count").as("est_count"),
        col("max_err"))
      .orderBy("store_id", "rank")
}
