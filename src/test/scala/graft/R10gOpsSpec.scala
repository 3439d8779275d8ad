package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-7 keys: a56 MAD screen on
  * the decomposition remainder, a57 matched-model price indices. */
class R10gOpsSpec extends GraftSpec {

  test("a56: flagged days match an in-process median/MAD recompute over " +
      "the a55 remainder") {
    val rem = graft.analytics.Series.seasonalDecompose(spark, sfDir)
      .filter(col("remainder_c").isNotNull)
      .select(col("sale_date"), col("net_c"), col("remainder_c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[(Long, String)]): Long = {
      val sorted = xs.sortBy(x => (x._1, x._2))
      sorted((xs.size + 1) / 2 - 1)._1
    }
    val med = lowerMedian(rem.toSeq.map(r => (r._3, r._1)))
    val mad = math.max(1L,
      lowerMedian(rem.toSeq.map(r => (math.abs(r._3 - med), r._1))))
    val expect = rem.filter(r => math.abs(r._3 - med) > 3 * mad)
      .map { r =>
        val dev = math.abs(r._3 - med)
        r._1 -> (r._2, r._3, med, mad, dev, dev * 1000 / mad)
      }.toMap
    val got = graft.analytics.Series.remainderAnomalies(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got == expect)
  }

  test("a57: indices match an in-process matched-model recompute, and " +
      "the base month reads exactly 1000") {
    val monthly = Tables.sales(spark, sfDir)
      .groupBy(col("sku"), substring(col("sale_date"), 1, 7).as("m"))
      .agg((sum(col("line_total")) * 100).cast("decimal(18,0)")
        .cast("long").as("cents"),
        sum(col("quantity")).cast("long").as("qty"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .map { case (sku, m, c, q) => (sku, m, c * 1000 / q, q) }
    val baseMonth = monthly.map(_._2).min
    val base = monthly.filter(_._2 == baseMonth)
      .map(r => r._1 -> (r._3, r._4)).toMap
    val expect = monthly.groupBy(_._2).flatMap { case (m, rows) =>
      val matched = rows.filter(r => base.contains(r._1))
      if (matched.isEmpty) None
      else {
        val ptq0 = matched.map(r => r._3 * base(r._1)._2).sum
        val p0q0 = matched.map(r => base(r._1)._1 * base(r._1)._2).sum
        val ptqt = matched.map(r => r._3 * r._4).sum
        val p0qt = matched.map(r => base(r._1)._1 * r._4).sum
        Some(m -> (matched.size.toLong, ptq0 * 1000 / p0q0,
          ptqt * 1000 / p0qt))
      }
    }
    val got = graft.analytics.Series.priceIndex(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(got(baseMonth) == ((base.size.toLong, 1000L, 1000L)),
      "base month must index at exactly 1000")
    // matched-model must actually drop entering/exiting SKUs somewhere
    val allMonths = monthly.groupBy(_._2).map { case (m, rs) =>
      m -> rs.size.toLong }
    assert(got.exists { case (m, (n, _, _)) => n < allMonths(m) },
      "fixture must contain SKUs absent from the base month")
  }
}
