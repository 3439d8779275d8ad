package graft

import graft.streaming.{DailySummary, StatefulAnomalies, StatefulAnomaliesTws}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The transformWithState (state API v2) anomaly detector is a TWIN of
  * the flatMapGroupsWithState one: same emissions bit-for-bit against
  * the batch a11 relation and the same re-delivery semantics. Runs
  * under the RocksDB state store provider — the only one the v2
  * operator supports. */
class TwsAnomaliesSpec extends GraftSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("tws anomaly detector matches batch a11 AND the v1 stateful twin bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .select(col("store_id"), col("sale_date"), col("gross_dec"),
        unix_date(to_date(col("sale_date"))).as("day_idx"))
      .collect()
      .map(r => DailySummary(r.getString(0), r.getInt(3), r.getString(1),
        BigDecimal(r.getDecimal(2))))
      .sortBy(_.sale_date)
    val midDate = rows(rows.length / 2).sale_date
    val (b1, b2) = rows.partition(_.sale_date < midDate)
    withRocksDb {
      val input = MemoryStream[DailySummary]
      val q = StatefulAnomaliesTws.detect(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_anoms").start()
      try {
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
        def key(r: org.apache.spark.sql.Row) =
          (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4), r.getString(5))
        val got = spark.sql(
            """SELECT store_id, sale_date, today_sales, hist_avg_sales,
              |  deviation_pct, severity FROM tws_anoms""".stripMargin)
          .collect().map(key).sortBy(t => (t._1, t._2))
        val want = graft.analytics.History.anomalies(spark, sfDir)
          .collect().map(key).sortBy(t => (t._1, t._2))
        assert(want.nonEmpty)
        assert(got.toSeq === want.toSeq,
          "tws anomalies must equal the batch relation exactly")
      } finally q.stop()
    }
  }

  test("tws re-delivery: point overwrite, no duplicate emission, old-day self-eviction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def s(d: Int, g: Int) = DailySummary("0001", d, f"2024-01-${d + 1}%02d", BigDecimal(g))
    withRocksDb {
      val input = MemoryStream[DailySummary]
      val q = StatefulAnomaliesTws.detect(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_dup").start()
      try {
        input.addData(s(0, 100), s(1, 100), s(2, 100)); q.processAllAvailable()
        // day-2 correction then the following days: day 3's window must see
        // ONE day-2 entry valued 400 — {100,100,400} avg 200 (v1's values)
        input.addData(s(2, 400), s(3, 100), s(4, 100), s(5, 100))
        q.processAllAvailable()
        val got = spark.sql(
            """SELECT sale_date, hist_avg_sales, deviation_pct, severity
              |FROM tws_dup ORDER BY sale_date""".stripMargin)
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
        val want = Seq(
          ("2024-01-04", 200.0, (100.0 - 200.0) / 200.0 * 100, "warning"),
          ("2024-01-05", 175.0, (100.0 - 175.0) / 175.0 * 100, "warning"),
          ("2024-01-06", 160.0, (100.0 - 160.0) / 160.0 * 100, "warning"))
        assert(got.toSeq === want)
        // a re-delivered day far older than the window evicts itself: the
        // next real day's window is unchanged by it
        input.addData(s(-30, 999), s(6, 100)); q.processAllAvailable()
        val after = spark.sql(
            "SELECT hist_avg_sales FROM tws_dup WHERE sale_date = '2024-01-07'")
          .collect().map(_.getDouble(0))
        assert(after.toSeq === Seq(150.0)) // {400,100,100,100,100,100} avg
      } finally q.stop()
    }
  }
}
