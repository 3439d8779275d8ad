package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J4 (date-spine zero-fill), J5 (union of per-range results), S2
  * (filename/partition-key parse) — the remaining join/source shapes.
  *
  * Scale posture: the spine is |dates| × |stores| — dimension-sized — and
  * broadcasts against the summary relation; the fact table is never
  * crossed. */
object Spine {

  /** J4: dense (date × store) spine over a range, left-joined to the daily
    * summary and zero-filled (reference loops dates and defaults missing
    * entries to zero, get-trends/lambda_function.py:216-222,286-302). */
  def dateSpine(spark: SparkSession, dir: String,
                from: String = Defaults.rangeStart,
                to: String = Defaults.rangeEnd): DataFrame = {
    val dates = spark.range(1).select(
      explode(sequence(to_date(lit(from)), to_date(lit(to)))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("sale_date"))
    val spine = dates.crossJoin(Completeness.expectedStores(spark, dir))
    val sd = StoreDaily.rollupDec(spark, dir)
      .filter(col("sale_date").between(from, to))
      .select(col("sale_date"), col("store_id"), col("gross_dec"),
        col("transaction_count"))
    spine.join(sd, Seq("sale_date", "store_id"), "left")
      .select(
        col("sale_date"), col("store_id"),
        coalesce(col("gross_dec"), lit(0)).cast("double").as("sales"),
        coalesce(col("transaction_count"), lit(0L)).as("transactions"))
      .orderBy(col("sale_date"), col("store_id"))
  }

  def dateSpineSql(from: String = Defaults.rangeStart,
                   to: String = Defaults.rangeEnd): String =
    s"""WITH dates AS (
       |  SELECT strftime(CAST(g AS DATE), '%Y-%m-%d') AS sale_date
       |  FROM generate_series(DATE '$from', DATE '$to', INTERVAL 1 DAY) AS t(g)),
       |stores AS (${Completeness.expectedStoresSql}),
       |sd AS (SELECT * FROM (${StoreDaily.rollupDecSql})
       |       WHERE sale_date BETWEEN '$from' AND '$to')
       |SELECT d.sale_date, s.store_id,
       |  CAST(COALESCE(sd.gross_dec, 0) AS DOUBLE) AS sales,
       |  COALESCE(sd.transaction_count, 0) AS transactions
       |FROM dates d CROSS JOIN stores s
       |LEFT JOIN sd ON sd.sale_date = d.sale_date AND sd.store_id = s.store_id
       |ORDER BY d.sale_date, s.store_id""".stripMargin

  /** J5: union of per-range results (the reference extends a list across a
    * date loop, get-trends:383-389; relationally a UNION ALL that Catalyst
    * collapses into one ranged scan per branch). */
  def unionRanges(spark: SparkSession, dir: String): DataFrame = {
    def branch(from: String, to: String, tag: String) =
      StoreDaily.rollupDec(spark, dir)
        .filter(col("sale_date").between(from, to))
        .groupBy(col("sale_date"))
        .agg(sum(col("gross_dec")).as("sales_dec"),
          sum(col("transaction_count")).as("total_transactions"))
        .select(lit(tag).as("range_tag"), col("sale_date"),
          col("sales_dec").cast("double").as("total_sales"),
          col("total_transactions"))
    branch("1998-06-01", "1998-06-30", "june")
      .unionByName(branch("1998-07-01", "1998-07-31", "july"))
      .orderBy(col("range_tag"), col("sale_date"))
  }

  val unionRangesSql: String = {
    def branch(from: String, to: String, tag: String) =
      s"""SELECT '$tag' AS range_tag, sale_date,
         |  CAST(SUM(gross_dec) AS DOUBLE) AS total_sales,
         |  CAST(SUM(transaction_count) AS BIGINT) AS total_transactions
         |FROM (${StoreDaily.rollupDecSql})
         |WHERE sale_date BETWEEN '$from' AND '$to'
         |GROUP BY sale_date""".stripMargin
    s"""${branch("1998-06-01", "1998-06-30", "june")}
       |UNION ALL
       |${branch("1998-07-01", "1998-07-31", "july")}
       |ORDER BY range_tag, sale_date""".stripMargin
  }

  /** S6/O6: file inventory via the `_metadata` hidden column — path,
    * size, modification time per scanned file, newest first (the
    * reference's S3 listing + last_modified sort, list-files:60,96-169).
    * No oracle: DuckDB has no analogue of Spark's _metadata; rows-only. */
  def fileInventory(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        col("_metadata.file_path").as("file_path"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.file_modification_time").as("last_modified"))
      .distinct()
      .orderBy(col("last_modified").desc, col("file_path"))

  /** S2: filename/partition-key parser — the reference's regex
    * `store_(\\d{4})_(\\d{4})-(\\d{2})-(\\d{2})\\.json` over upload names
    * (process_upload.py:28,45-57,132-150). Round-trips the canonical
    * (store, date) keys through a filename and parses them back with
    * regexp_extract, including the reject flag for malformed names. */
  def filenameParse(spark: SparkSession, dir: String): DataFrame = {
    val pat = "^store_(\\d{4})_(\\d{4})-(\\d{2})-(\\d{2})\\.json$"
    // distinct (store, day) is exactly the grain of the rollupDec silver
    // relation — read the cache instead of re-distincting the fact table
    graft.etl.StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"))
      .select(concat(lit("store_"), col("store_id"), lit("_"),
        col("sale_date"), lit(".json")).as("filename"))
      .select(
        col("filename"),
        regexp_extract(col("filename"), pat, 1).as("parsed_store_id"),
        regexp_extract(col("filename"), pat, 2).as("year"),
        regexp_extract(col("filename"), pat, 3).as("month"),
        regexp_extract(col("filename"), pat, 4).as("day"),
        col("filename").rlike(pat).as("valid"))
      .orderBy(col("filename"))
  }

  val filenameParseSql: String = {
    val pat = "^store_(\\d{4})_(\\d{4})-(\\d{2})-(\\d{2})\\.json$"
    s"""WITH names AS (
       |  SELECT DISTINCT 'store_' || store_id || '_' || sale_date || '.json' AS filename
       |  FROM (${Tables.salesSql}))
       |SELECT filename,
       |  regexp_extract(filename, '$pat', 1) AS parsed_store_id,
       |  regexp_extract(filename, '$pat', 2) AS year,
       |  regexp_extract(filename, '$pat', 3) AS month,
       |  regexp_extract(filename, '$pat', 4) AS day,
       |  regexp_matches(filename, '$pat') AS valid
       |FROM names
       |ORDER BY filename""".stripMargin
  }
}
