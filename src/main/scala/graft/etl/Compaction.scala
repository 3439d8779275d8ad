package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k17: SMALL-FILE COMPACTION PLAN — the lakehouse OPTIMIZE bin-pack
  * readout. Streaming ingest writes one file per (day, store)
  * micro-batch (the reference's per-event-batch S3 writes produce the
  * same pathology at scale), so partitions accumulate files far below
  * the scan-efficient target and every reader pays per-file open cost.
  * The planner models that inventory, then packs each partition's
  * small files into rewrite bins by the running-total rule production
  * compactors use (files in deterministic order, a bin closes when its
  * byte budget fills): bin = (cumulative_bytes - 1) DIV target.
  *
  * One row per (month, store) lake partition: files before, small
  * files, files after (bins + kept large files), total/rewritten
  * bytes, and the per-mille rewrite share — the I/O bill of the
  * OPTIMIZE run. Exact integers end to end (the file-size model is
  * header + fixed row encoding, so the DuckDB twin hash-matches).
  *
  * Scale shape: the file inventory is ONE (day, store)-grain
  * conditional aggregate of the fact table (metadata-sized output —
  * this is the only row-sized move); the pack window and the final
  * rollup both run at the (month, store) partition grain over that
  * inventory. Compaction never crosses a lake partition, so the
  * window key IS the partition key — no global sort, no skew: a
  * partition's file count is bounded by days-per-month. */
object Compaction {

  /** Byte model: 32-byte file header + 24 bytes per row. */
  private val HeaderBytes = 32L
  private val RowBytes = 24L

  def compactionPlan(spark: SparkSession, dir: String,
                     targetBytes: Long = 4096L): DataFrame = {
    // grain keys aggregate on the RAW ints (suppkey, day-truncated
    // shipdate — to_date makes the grain identical to the string date
    // at any timestamp resolution); format_string/date_format run once
    // per (store, day) grain instead of per fact row, and the exchange
    // carries (long, date) instead of two strings (guide §2.3)
    val files = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("d"), col("l_suppkey"))
      .agg((lit(HeaderBytes) + lit(RowBytes) * count(lit(1))).as("file_bytes"))
      .select(date_format(col("d"), "yyyy-MM").as("part_month"),
        format_string("%04d", col("l_suppkey")).as("store_id"),
        date_format(col("d"), "yyyy-MM-dd").as("sale_date"), col("file_bytes"),
        (col("file_bytes") < targetBytes).cast("long").as("small"))
    val packWin = Window.partitionBy(col("part_month"), col("store_id"))
      .orderBy(col("sale_date"))
    // bin id only matters for small files: large files keep their own
    // file; cum sums small bytes only so bins stay tight around target
    val binned = files.withColumn("cum_small",
        sum(col("small") * col("file_bytes")).over(packWin))
      .withColumn("bin",
        when(col("small") === 1L,
          expr(s"(cum_small - 1) DIV $targetBytes")).otherwise(lit(-1L)))
    // small-file bins are contiguous from 0 (each small file advances
    // cum by < target, so the bin id never skips) — bin count is
    // max+1, no distinct-rewrite Expand needed
    binned.groupBy(col("part_month"), col("store_id"))
      .agg(count(lit(1)).as("files_before"),
        sum(col("small")).as("small_files"),
        (coalesce(max(when(col("small") === 1L, col("bin"))) + 1L, lit(0L)) +
          sum(lit(1L) - col("small"))).as("files_after"),
        sum(col("file_bytes")).as("bytes_total"),
        sum(col("small") * col("file_bytes")).as("bytes_rewritten"))
      .withColumn("rewrite_milli",
        expr("bytes_rewritten * 1000 DIV bytes_total"))
      .orderBy(col("part_month"), col("store_id"))
  }

  def compactionPlanSql(targetBytes: Long = 4096L): String =
    s"""WITH s AS (${Tables.salesSql}),
       |files AS (
       |  SELECT substring(sale_date, 1, 7) AS part_month, store_id, sale_date,
       |    32 + 24 * CAST(COUNT(*) AS BIGINT) AS file_bytes
       |  FROM s GROUP BY store_id, sale_date),
       |flagged AS (
       |  SELECT *, CASE WHEN file_bytes < $targetBytes THEN 1 ELSE 0 END AS small
       |  FROM files),
       |binned AS (
       |  SELECT *,
       |    CASE WHEN small = 1 THEN
       |      (CAST(SUM(small * file_bytes) OVER (
       |         PARTITION BY part_month, store_id ORDER BY sale_date
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1)
       |        // $targetBytes
       |    ELSE -1 END AS bin
       |  FROM flagged)
       |SELECT part_month, store_id,
       |  CAST(COUNT(*) AS BIGINT) AS files_before,
       |  CAST(SUM(small) AS BIGINT) AS small_files,
       |  CAST(COALESCE(MAX(CASE WHEN small = 1 THEN bin END) + 1, 0)
       |    + SUM(1 - small) AS BIGINT) AS files_after,
       |  CAST(SUM(file_bytes) AS BIGINT) AS bytes_total,
       |  CAST(SUM(small * file_bytes) AS BIGINT) AS bytes_rewritten,
       |  CAST(SUM(small * file_bytes) AS BIGINT) * 1000
       |    // CAST(SUM(file_bytes) AS BIGINT) AS rewrite_milli
       |FROM binned
       |GROUP BY part_month, store_id
       |ORDER BY part_month, store_id""".stripMargin
}
