package graft.analytics

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sk18: SPARK-NATIVE DATASKETCHES HLL — the engine's own Apache
  * DataSketches integration (`hll_sketch_agg` / `hll_sketch_estimate` /
  * `hll_union_agg`), exercised as the production counterpart of the
  * from-scratch HLL family (sk1/sk2: house registers, error-bounded by
  * exact twins). Per store: the native sketch estimate of distinct
  * skus next to the EXACT bitmap count (sk17's relation), plus the
  * company row built BOTH ways — one direct sketch over all rows, and
  * the `hll_union_agg` MERGE of the per-store sketches. Same-lgK HLL
  * union is LOSSLESS (register-wise max), so merged and direct
  * estimates must agree exactly — the mergeability contract that lets
  * 1000 executors sketch partitions independently; NativeHllSpec
  * asserts it, plus the published error envelope against the exact
  * column. Rows-only by design: DuckDB's approx_count_distinct is a
  * different HLL implementation (different hashing, different
  * estimator), so no cross-engine hash can exist — exactness is
  * instead anchored by the in-row exact column.
  *
  * Scale shape: one (store, bucket-free) sketch agg — fixed 2^lgK
  * register state per store, map-side-combinable; the company union
  * folds |stores| sketches. The exact column rides sk17's memoized
  * bitmap leaf, not a second row scan. */
object NativeHll {

  def nativeHll(spark: SparkSession, dir: String, lgK: Int = 12): DataFrame = {
    val sales = Tables.sales(spark, dir).select(col("store_id"), col("sku"))
    // Both small relations feed multiple consumers below (the store join,
    // the company union, the two exact anchors) — memoized as leaves so
    // the row-sized sketch agg and sk17's grain folds run ONCE, not once
    // per consumer subtree.
    val perStore = graft.model.Silver.memoize(spark, s"hllPerStore$lgK", dir) {
      sales.groupBy(col("store_id"))
        .agg(expr(s"hll_sketch_agg(sku, $lgK)").as("sketch"))
    }
    val exact = graft.model.Silver.memoize(spark, "bitmapExact", dir) {
      Sketches.bitmapDistinct(spark, dir)
        .select(col("store_id"), col("n_distinct_skus").as("n_exact"),
          col("n_distinct_company"))
    }
    val storeRows = perStore.join(exact, Seq("store_id"))
      .select(col("store_id"),
        expr("hll_sketch_estimate(sketch)").as("n_est"),
        col("n_exact"))
    val companyExact = broadcast(exact
      .select(col("n_distinct_company").as("n_exact")).limit(1))
    val direct = sales
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(sku, $lgK))").as("n_est"))
      .crossJoin(companyExact)
      .select(lit("__company_direct__").as("store_id"), col("n_est"),
        col("n_exact"))
    val merged = perStore
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, false))").as("n_est"))
      .crossJoin(companyExact)
      .select(lit("__company_merged__").as("store_id"), col("n_est"),
        col("n_exact"))
    storeRows.unionAll(direct).unionAll(merged)
      .orderBy(col("store_id"))
  }
}
