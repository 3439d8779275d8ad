package graft.streaming

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming semantics (SURVEY.md §2.7): tumbling
  * windows over the `events` stream table. The live Structured Streaming
  * wrapper (file source + foreachBatch + completeness gate) lives in
  * [[StreamingIngest]]; these relational forms are the oracle-checkable
  * part — same plan shape batch or micro-batch.
  *
  * events.value is 2-dp (money-like) → DECIMAL casts stay exact. */
object EventsBatch {

  /** Tumbling 1-day window per event type: the reference's "day = filename
    * date" daily aggregation keyed by calendar date
    * (process_upload.py:134; write-metrics:84). */
  def dailyByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("event_type"),
        col("value").cast(Tables.Money).as("value_dec"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value_dec")).as("sum_dec"),
        min(col("value_dec")).as("min_dec"),
        max(col("value_dec")).as("max_dec"))
      .select(col("event_date"), col("event_type"), col("n_events"),
        col("sum_dec").cast("double").as("total_value"),
        col("min_dec").cast("double").as("min_value"),
        col("max_dec").cast("double").as("max_value"))
      .orderBy(col("event_date"), col("event_type"))

  val dailyByTypeSql: String =
    """SELECT
      |  strftime(ts, '%Y-%m-%d') AS event_date,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
      |  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Tumbling 1-hour windows (window() produces the struct; emitted as
    * string bounds for portability) with per-user-bucket salting hook:
    * the hour key is already high-cardinality so no salt needed. */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("n_users"))
      .orderBy(col("window_start"), col("event_type"))

  val hourlyWindowSql: String =
    """SELECT
      |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}
