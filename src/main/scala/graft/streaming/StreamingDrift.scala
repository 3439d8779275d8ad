package graft.streaming

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of batch e19 ([[EventsBatch.driftMonitor]]): ONLINE
  * distribution-drift detection — per event-time day window and event
  * type, the total-variation distance (milli) of the window's value-
  * bucket distribution against a BASELINE distribution fitted offline,
  * carried into the stream as a literal map (|types|×10 entries — the
  * same bounded fit-offline/score-online contract as the LM and
  * benchmark-shingle gates).
  *
  * The streaming-legal shape is the point: Structured Streaming allows
  * ONE aggregation per query, so the bucket histogram is folded into
  * that single windowed aggregate as ten conditional counts (map-side
  * combinable, fixed-width state per window), and the TV arithmetic is
  * a STATELESS projection over the finalized row — same integer milli
  * algebra as batch e19, no second aggregation, no join, no extra
  * state. Append mode + watermark: a window's verdict emits exactly
  * once, when the watermark closes it — the alerting contract a
  * monitoring consumer wants. */
object StreamingDrift {

  /** e19's value bucket: $50-wide, capped at bucket 9. */
  private def bucketCol: Column =
    least(lit(9L),
      expr("cast(cast(value AS decimal(18,2)) * 100 AS bigint) div 5000"))

  /** Offline baseline fit: per (type, bucket) milli proportions of the
    * batch corpus's FIRST calendar half — e19's reference window, one
    * bounded collect (|types|×10). Keys are "type:bucket". */
  def baseline(spark: SparkSession, dir: String): Map[String, Long] = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        bucketCol.as("bucket"))
    val bounds = ev.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val firstHalf = ev.crossJoin(broadcast(bounds))
      .filter(datediff(col("d"), col("lo")) * 2 <=
        datediff(col("hi"), col("lo")))
    val counts = firstHalf.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("n")).as("win_n"))
    counts.join(totals, Seq("event_type"))
      .select(concat(col("event_type"), lit(":"), col("bucket")).as("k"),
        expr("n * 1000 div win_n").as("p_milli"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** The streaming monitor: input is a streaming events frame with
    * (ts timestamp, event_type string, value double). Emits one row per
    * finalized (day window, type): the window's bucket histogram row
    * count, TV distance vs baseline (milli), and the drift flag. */
  def monitor(events: DataFrame, base: Map[String, Long],
              thresholdMilli: Long = 50L,
              delay: String = "1 hour"): DataFrame = {
    val bucketCounts = (0 to 9).map(b =>
      sum(when(col("bucket") === b.toLong, 1L).otherwise(0L)).as(s"n$b"))
    val agged = events
      .withColumn("bucket", bucketCol)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(bucketCounts.head, bucketCounts.tail: _*)
    val baseLit = map(base.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    def baseP(b: Int): Column = coalesce(
      element_at(baseLit, concat(col("event_type"), lit(s":$b"))), lit(0L))
    val tvSum = (0 to 9)
      .map(b => abs(expr(s"n$b * 1000 div win_n") - baseP(b)))
      .reduce(_ + _)
    agged
      .withColumn("win_n", (0 to 9).map(b => col(s"n$b")).reduce(_ + _))
      .withColumn("tv_sum", tvSum)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("window_day"),
        col("event_type"), col("win_n"),
        expr("tv_sum div 2").as("tv_milli"),
        (expr("tv_sum div 2") >= thresholdMilli).as("is_drifted"))
  }
}
