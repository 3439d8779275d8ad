package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The medallion materialization the reference implements with DynamoDB
  * puts (write-metrics:77-104, calc-company-metrics:117-133,
  * calc-product-metrics:117-133): persist the silver/gold summary tables
  * as parquet so every read path queries |stores|×|days|-sized relations
  * instead of re-aggregating the fact table.
  *
  * Scale posture: this is THE 100 TB architecture decision. The fact
  * table is touched once per ingest increment ([[graft.streaming.
  * StreamingIngest]] maintains the same tables incrementally, overwriting
  * only the touched (sale_date, store_id) partitions); everything in
  * `analytics/` runs on the materialized summaries. store_daily is
  * partitioned by sale_date — the access path of every history/trend
  * query — so date-range reads are directory pruning. Summary tables are
  * dimension-sized: company_daily is 1 row/day, product_daily is bounded
  * by 5×stores×days (the lossy top-5 construction) regardless of
  * fact-table size. */
object Materialize {

  /** Write the three summary tables under `root`. Returns their paths. */
  def writeSummaries(spark: SparkSession, dir: String, root: String): Map[String, String] = {
    val storeDaily = StoreDaily.rollupDec(spark, dir)
    storeDaily.write
      .partitionBy("sale_date")
      .mode("overwrite")
      .parquet(s"$root/store_daily")

    CompanyDaily.rollup(spark, dir).write
      .mode("overwrite")
      .parquet(s"$root/company_daily")

    ProductDaily.rollupLossy(spark, dir).write
      .partitionBy("sale_date")
      .mode("overwrite")
      .parquet(s"$root/product_daily")

    // the payment dimension is join-derived (orders → payment_method);
    // materializing the per-(store, day, method) silver relation means the
    // orders join happens once per ingest increment, never per read query
    StoreDaily.paymentDec(spark, dir).write
      .partitionBy("sale_date")
      .mode("overwrite")
      .parquet(s"$root/payment_daily")

    Map(
      "store_daily" -> s"$root/store_daily",
      "company_daily" -> s"$root/company_daily",
      "product_daily" -> s"$root/product_daily",
      "payment_daily" -> s"$root/payment_daily")
  }

  /** Bucketed variants of the summary tables: 8 buckets on store_id,
    * sorted within buckets. Two tables bucketed the same way join WITHOUT
    * an exchange on either side — at 1000 executors this is the
    * difference between a co-located hash join and a full-cluster shuffle
    * of both relations. Bucketing rides the session catalog
    * (`saveAsTable`); `spark.sql.sources.bucketing.enabled` is on by
    * default. Returns the two table names. */
  def writeBucketed(spark: SparkSession, dir: String): (String, String) = {
    // idempotent: drop catalog entries AND any orphaned managed location
    // (a killed session can leave the directory without the entry, which
    // fails CTAS with LOCATION_ALREADY_EXISTS)
    Seq("graft_store_daily_bucketed", "graft_store_top5_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    StoreDaily.rollupDec(spark, dir).write
      .bucketBy(8, "store_id").sortBy("store_id")
      .mode("overwrite")
      .saveAsTable("graft_store_daily_bucketed")
    StoreDaily.topProductsDec(spark, dir, 5)
      .groupBy(col("store_id"))
      .agg(sum(col("rev_dec")).as("top5_rev_dec"))
      .write
      .bucketBy(8, "store_id").sortBy("store_id")
      .mode("overwrite")
      .saveAsTable("graft_store_top5_bucketed")
    ("graft_store_daily_bucketed", "graft_store_top5_bucketed")
  }

  /** Join the two bucketed tables on their bucket key — the plan must
    * contain no ShuffleExchange (asserted in MaterializeSpec). */
  def bucketedJoin(spark: SparkSession): DataFrame = {
    val sd = spark.table("graft_store_daily_bucketed")
      .groupBy(col("store_id")).agg(sum(col("gross_dec")).as("gross_dec"))
    val t5 = spark.table("graft_store_top5_bucketed")
    sd.join(t5, Seq("store_id"))
      .select(col("store_id"), col("gross_dec").cast("double").as("total_sales"),
        col("top5_rev_dec").cast("double").as("top5_revenue"))
      .orderBy(col("store_id"))
  }

  /** Read the silver store-daily table (partition-pruned on sale_date). */
  def storeDaily(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/store_daily")

  /** The A4 company rollup recomputed FROM THE SILVER TABLE — the shape
    * every reference read path uses (query the summary store, never the
    * raw line items). Demonstrates the re-aggregation is closed over the
    * materialized schema. */
  def companyDailyFromSilver(spark: SparkSession, root: String): DataFrame =
    storeDaily(spark, root)
      .groupBy(col("sale_date"))
      .agg(
        sum(col("gross_dec")).as("sales_dec"),
        sum(col("transaction_count")).as("total_transactions"),
        count(lit(1)).as("store_count"))
      .select(col("sale_date"),
        col("sales_dec").cast("double").as("total_sales"),
        col("total_transactions"), col("store_count"))
      .orderBy(col("sale_date"))

  // ---------------------------------------------------------------- a66

  /** The ingest boundary for a66: facts at or before this date are
    * "yesterday's silver", facts after are "today's arrivals". Chosen
    * mid-corpus so the boundary month (1995-06) STRADDLES it — the
    * merge must genuinely combine partials with the same (store, month)
    * key, not just concatenate disjoint ranges. */
  val IngestBoundary = "1995-06-15"

  /** a66: INCREMENTAL AGGREGATE MAINTENANCE — the IVM step that closes
    * the incremental-lifecycle triad (d29 dedups the delta, v38 searches
    * it, a66 folds it into the gold rollup): the monthly revenue rollup
    * is maintained as base-silver ⊕ delta, where the base partial is
    * PHYSICALLY MATERIALIZED to parquet (yesterday's silver, exactly
    * what [[writeSummaries]] persists), today's delta is aggregated
    * alone (work ∝ delta), and ⊕ is re-aggregation of the sum/count
    * monoid over the union. The ORACLE recomputes the rollup from the
    * full fact table, so the hash match is the machine-checked proof
    * that partial-aggregate merge == full recompute — history is never
    * rescanned, the algebra guarantees the same bytes. Decimal partials
    * make ⊕ exact (the [[StoreDaily.paymentDec]] argument); a
    * float-summed silver could not offer this contract. */
  def incrementalRollup(spark: SparkSession, dir: String): DataFrame =
    graft.model.Silver.memoize(spark, "a66IncrementalRollup", dir) {
      val root = Scratch.tempDir("a66-silver")
      def partial(pred: org.apache.spark.sql.Column): DataFrame =
        graft.model.Tables.sales(spark, dir)
          .filter(pred)
          .groupBy(col("store_id"),
            substring(col("sale_date"), 1, 7).as("month"))
          .agg(sum(col("line_total")).as("gross_dec"),
            count(lit(1)).as("n_lines"))
      partial(col("sale_date") <= IngestBoundary)
        .write.mode("overwrite").parquet(s"$root/base")
      spark.read.parquet(s"$root/base")
        .unionByName(partial(col("sale_date") > IngestBoundary))
        .groupBy(col("store_id"), col("month"))
        .agg(sum(col("gross_dec")).as("gross_dec"),
          sum(col("n_lines")).as("n_lines"))
        .select(col("store_id"), col("month"),
          col("gross_dec").cast("double").as("total_sales"),
          col("n_lines"))
        .orderBy(col("store_id"), col("month"))
    }

  /** Full recompute from raw facts — what the merged silver must equal. */
  def incrementalRollupSql(): String =
    s"""SELECT store_id, substring(sale_date, 1, 7) AS month,
       |  CAST(SUM(line_total) AS DOUBLE) AS total_sales,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines
       |FROM (${graft.model.Tables.salesSql})
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- a67

  /** a67: INCREMENTAL EXACT DISTINCT — IVM past the sum/count monoid
    * (a66's natural sequel): the per-store distinct-sku count
    * maintained as OR-mergeable bitmap partials (sk17's discipline).
    * Yesterday's (store, bucket) bitmaps are PHYSICALLY materialized to
    * parquet (a binary column, one fixed 4 KB page per 32 768-key sku
    * bucket), today's delta is aggregated alone (work ∝ delta), ⊕ is
    * `bitmap_or_agg` over the union, and `bitmap_count` reads the
    * answer. COUNT(DISTINCT) is NOT a sum-monoid — naive partials
    * double-count keys seen on both sides of the boundary; the bitmap
    * page is the classic exactly-mergeable representation. The oracle
    * recomputes COUNT(DISTINCT sku) from the full fact table, so the
    * hash match proves base ⊕ delta == full recompute on the OR monoid
    * — history never rescanned, and unlike the HLL rung (sk1) the
    * result is EXACT, so it rides the hash gate. */
  def incrementalDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.model.Silver.memoize(spark, "a67IncrementalDistinct", dir) {
      val root = Scratch.tempDir("a67-silver")
      def buckets(pred: org.apache.spark.sql.Column): DataFrame =
        graft.model.Tables.sales(spark, dir)
          .filter(pred)
          .groupBy(col("store_id"),
            expr("bitmap_bucket_number(sku)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(sku))")
            .as("bm"))
      buckets(col("sale_date") <= IngestBoundary)
        .write.mode("overwrite").parquet(s"$root/base")
      spark.read.parquet(s"$root/base")
        .unionByName(buckets(col("sale_date") > IngestBoundary))
        .groupBy(col("store_id"), col("bucket"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy(col("store_id"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct_skus"))
        .orderBy(col("store_id"))
    }

  /** Full recompute — the merged bitmap fold must equal it exactly. */
  def incrementalDistinctSql(): String =
    s"""SELECT store_id,
       |  CAST(COUNT(DISTINCT sku) AS BIGINT) AS n_distinct_skus
       |FROM (${graft.model.Tables.salesSql})
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- a68

  /** a68: INCREMENTAL TOP-K — IVM on the Misra-Gries summary, the third
    * non-trivially-mergeable rung (a66 sum/count, a67 OR-bitmap, a68
    * heavy hitters). Yesterday's per-store MG sketch is PHYSICALLY
    * persisted as a binary column ([[graft.functions.TopKSketch]]'s
    * wire format — the DataSketches sketch-in-silver pattern), today's
    * delta is sketched alone (work ∝ delta), and ⊕ is the
    * mergeable-summaries combine ([[graft.functions.TopKMergeSketch]])
    * folding the two sketch rows per store back into a summary. In the
    * exactness regime (summarySize ≥ per-store distinct skus, sk4's
    * anchor) the merged summary is EXACT with max_err = 0, so the
    * DuckDB oracle — a full-recompute COUNT + ROW_NUMBER ranking —
    * hash-certifies partial-merge == full recompute on an aggregate
    * whose naive partials (per-slice top-k lists) would NOT merge
    * correctly. */
  def incrementalTopK(spark: SparkSession, dir: String,
                      topK: Int = 5): DataFrame =
    graft.model.Silver.memoize(spark, "a68IncrementalTopK", dir) {
      val root = Scratch.tempDir("a68-silver")
      val size = graft.analytics.Sketches.exactSummarySize
      def sketch(pred: org.apache.spark.sql.Column): DataFrame =
        graft.model.Tables.sales(spark, dir)
          .filter(pred)
          .groupBy(col("store_id"))
          .agg(graft.functions.TopKByCount
            .topKSketch(col("sku").cast("string"), size).as("sketch"))
      sketch(col("sale_date") <= IngestBoundary)
        .write.mode("overwrite").parquet(s"$root/base")
      spark.read.parquet(s"$root/base")
        .unionByName(sketch(col("sale_date") > IngestBoundary))
        .groupBy(col("store_id"))
        .agg(graft.functions.TopKByCount
          .topKMergeSketch(col("sketch"), size).as("mg"))
        .select(col("store_id"), col("mg.max_err").as("max_err"),
          posexplode(slice(col("mg.items"), 1, topK)).as(Seq("idx", "item")))
        .select(col("store_id"), (col("idx") + 1).cast("long").as("rank"),
          col("item.sku").as("sku"), col("item.est_count").as("est_count"),
          col("max_err"))
        .orderBy("store_id", "rank")
    }

  /** Full recompute + exact ranking — what the merged sketches must
    * equal in the exactness regime (max_err pinned to 0). */
  def incrementalTopKSql(topK: Int = 5): String =
    s"""WITH s AS (${graft.model.Tables.salesSql}),
       |counts AS (
       |  SELECT store_id, CAST(sku AS VARCHAR) AS sku,
       |    CAST(COUNT(*) AS BIGINT) AS est_count
       |  FROM s GROUP BY 1, 2),
       |ranked AS (
       |  SELECT store_id, sku, est_count,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY store_id
       |      ORDER BY est_count DESC, sku ASC) AS BIGINT) AS rank
       |  FROM counts)
       |SELECT store_id, rank, sku, est_count, CAST(0 AS BIGINT) AS max_err
       |FROM ranked WHERE rank <= $topK
       |ORDER BY store_id, rank""".stripMargin
}
