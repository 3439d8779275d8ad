package graft

import graft.analytics.Sketches
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Error bounds for the approximate sketches vs their exact twins. */
class SketchesSpec extends GraftSpec {

  test("sk1: HLL daily user counts within 5% of exact; quantiles ordered") {
    val approx = Sketches.dailyApprox(spark, sfDir)
      .select(col("event_date"), col("approx_users"), col("p50_value"), col("p99_value"))
    val exact = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val j = approx.join(exact, "event_date")
    assert(j.count() > 0)
    val bad = j.filter(
      abs(col("approx_users") - col("exact_users")) >
        greatest(col("exact_users") * 0.05, lit(3.0)))
    assert(bad.count() === 0, "HLL rsd=0.01 should stay within 5% (or ±3 small-n)")
    assert(j.filter(col("p99_value") < col("p50_value")).count() === 0)
  }

  test("sk2: approx sku counts within 5% of exact per store") {
    val approx = Sketches.storeSkuApprox(spark, sfDir)
    val exact = Tables.sales(spark, sfDir)
      .groupBy("store_id").agg(countDistinct(col("sku")).as("exact_skus"))
    val j = approx.join(exact, "store_id")
    val bad = j.filter(
      abs(col("approx_skus") - col("exact_skus")) >
        greatest(col("exact_skus") * 0.05, lit(3.0)))
    assert(bad.count() === 0)
  }
}
