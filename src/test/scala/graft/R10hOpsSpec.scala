package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-8 keys: a58 brand skyline
  * (window formulation vs brute-force dominance), a59 per-store exact
  * multivariate OLS (Cramer solve vs BigInt recompute), v36 ALS
  * half-step (closed-form ridge vs BigInt recompute + rec sanity). */
class R10hOpsSpec extends GraftSpec {

  test("a58: window skyline equals the brute-force dominance frontier") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
          .cast("long").as("price_c"),
        col("p_size").cast("long").as("size"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byBrand = parts.groupBy(_._2)
    val expect = byBrand.toSeq.flatMap { case (_, ps) =>
      ps.toSeq.filter(p => !ps.exists(q =>
        (q._3 < p._3 && q._4 >= p._4) || (q._3 <= p._3 && q._4 > p._4)))
    }.map(p => (p._2, p._1, p._3, p._4)).toSet
    val got = graft.analytics.Skyline.brandSkyline(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expect)
    // frontier_rank is dense 1..k per brand in (price, partkey) order
    val ranks = graft.analytics.Skyline.brandSkyline(spark, sfDir)
      .collect().groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getInt(1)).sorted.toSeq }
    assert(ranks.forall(rs => rs == (1 to rs.size)))
  }

  test("a59: Cramer coefficients match a BigInt normal-equations solve " +
      "per store") {
    val rows = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .select(col("store_id"), col("sale_date"),
        ((col("gross_dec") - col("disc_dec")) * 100)
          .cast("decimal(18,0)").cast("long").as("y_c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def toEpochDay(s: String) = java.time.LocalDate.parse(s, fmt).toEpochDay
    def isWeekend(s: String) = {
      val dow = java.time.LocalDate.parse(s, fmt).getDayOfWeek
      dow == java.time.DayOfWeek.SATURDAY || dow == java.time.DayOfWeek.SUNDAY
    }
    val expect = rows.groupBy(_._1).map { case (store, rs) =>
      val minDay = rs.map(r => toEpochDay(r._2)).min
      val obs = rs.map { r =>
        (BigInt(toEpochDay(r._2) - minDay),
          BigInt(if (isWeekend(r._2)) 1 else 0), BigInt(r._3))
      }
      val n = BigInt(obs.size)
      val sx1 = obs.map(_._1).sum; val sx2 = obs.map(_._2).sum
      val sx11 = obs.map(o => o._1 * o._1).sum
      val sx12 = obs.map(o => o._1 * o._2).sum
      val sx22 = obs.map(o => o._2 * o._2).sum
      val sy = obs.map(_._3).sum
      val sx1y = obs.map(o => o._1 * o._3).sum
      val sx2y = obs.map(o => o._2 * o._3).sum
      val det = n * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
      val d0 = sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)
      val d1 = n * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
      val d2 = n * (sx11 * sx2y - sx1y * sx12) -
        sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
      def milli(num: BigInt): Option[Long] =
        if (det == 0) None
        else Some(((num * 1000) / det).toLong) // BigInt / truncates toward 0
      store -> (obs.size.toLong, milli(d0), milli(d1), milli(d2))
    }
    val got = graft.analytics.Regression.storeMlr(spark, sfDir)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getString(0) -> (r.getLong(1), opt(2), opt(3), opt(4))
      }.toMap
    assert(got == expect)
  }

  test("v36: closed-form ridge factors match a BigInt recompute and the " +
      "rec is a best-scoring unpurchased brand") {
    val ratings = graft.vector.Als.ratingsForSpec(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def f1(b: Long) = b * 37 % 101 - 50
    def f2(b: Long) = b * 73 % 101 - 50
    val allBrands = Tables.part(spark, sfDir)
      .select(substring(col("p_brand"), 7, 8).cast("long").as("bid"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    val expect = ratings.groupBy(_._1).map { case (ck, rs) =>
      val a11 = BigInt(rs.map(r => f1(r._2) * f1(r._2)).sum + 1000)
      val a12 = BigInt(rs.map(r => f1(r._2) * f2(r._2)).sum)
      val a22 = BigInt(rs.map(r => f2(r._2) * f2(r._2)).sum + 1000)
      val b1 = BigInt(rs.map(r => r._3 * f1(r._2)).sum)
      val b2 = BigInt(rs.map(r => r._3 * f2(r._2)).sum)
      val det = a11 * a22 - a12 * a12
      val u1 = ((b1 * a22 - b2 * a12) * 1000 / det).toLong
      val u2 = ((b2 * a11 - b1 * a12) * 1000 / det).toLong
      val owned = rs.map(_._2).toSet
      val cand = allBrands.filterNot(owned)
        .map(b => (b, u1 * f1(b) + u2 * f2(b)))
      val rec = if (cand.isEmpty) None
        else Some(cand.maxBy(c => (c._2, -c._1)))
      ck -> (rs.size.toLong, u1, u2, rec)
    }
    val got = graft.vector.Als.alsRecs(spark, sfDir)
      .collect().map { r =>
        val rec = if (r.isNullAt(4)) None
          else Some((r.getLong(4), r.getLong(5)))
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), rec)
      }.toMap
    assert(got == expect)
  }
}
