package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Star, Kpis}
import graft.model.Tables

/** Invariants for the star-schema join keys (j9/j10) and the
  * new-vs-repeat decomposition (a39). Value-level correctness vs
  * DuckDB is the driver's gate; these pin conservation laws, the
  * physical join strategy (broadcast dims / top-k operator), and an
  * in-process recomputation of j10's ranking from raw collected rows. */
class StarSpec extends GraftSpec {

  test("j9: output revenue conserves the 1997 fact total exactly") {
    val out = Star.starRevenue(spark, sfDir)
    val got = out.agg(sum(col("revenue_cents"))).head.getLong(0)
    // every 1997 line item has exactly one order -> one customer ->
    // one nation -> one region, so the star rollup must conserve
    val want = Tables.salesInRange(spark, sfDir, "1997-01-01", "1997-12-31")
      .agg((sum(col("line_total") - col("discount_amount")) * 100)
        .cast("long")).head.getLong(0)
    assert(got == want)
    val lines = out.agg(sum(col("n_lines"))).head.getLong(0)
    val wantLines =
      Tables.salesInRange(spark, sfDir, "1997-01-01", "1997-12-31").count()
    assert(lines == wantLines)
  }

  test("j9: tiny dims broadcast — plan contains a broadcast join") {
    val plan = Star.starRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("j10: global top-k lowers to TakeOrderedAndProject, not a sort") {
    val df = Star.shippingPriority(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("j10: ranking matches an in-process recomputation from raw rows") {
    val cutoff = java.time.LocalDateTime.parse("1998-06-01T00:00:00")
    val seg = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .filter(r => seg(r.getLong(1)) &&
        r.getAs[java.time.LocalDateTime]("o_orderdate").isBefore(cutoff))
      .map(r => r.getLong(0) ->
        r.getAs[java.time.LocalDateTime]("o_orderdate").toLocalDate.toString)
      .toMap
    val net = scala.collection.mutable.Map[Long, BigDecimal]()
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
      .collect()
      .foreach { r =>
        val ok = r.getLong(0)
        if (orders.contains(ok) &&
            r.getAs[java.time.LocalDateTime]("l_shipdate").isAfter(cutoff)) {
          val price = BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          val disc = BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          val d = (price * disc).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          net(ok) = net.getOrElse(ok, BigDecimal(0)) + (price - d)
        }
      }
    val want = net.toSeq
      .map { case (ok, dec) => (ok, orders(ok), (dec * 100).toLongExact) }
      .sortBy { case (ok, d, cents) => (-cents, d, ok) }
      .take(10)
      .map { case (ok, d, cents) => (ok, d, cents) }
    val got = Star.shippingPriority(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("j12: pricing summary conserves the filtered fact exactly") {
    val out = graft.analytics.Star.pricingSummary(spark, sfDir).collect()
    assert(out.length == 6)
    val nLines = out.map(_.getAs[Long]("n_lines")).sum
    val want = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <
        lit("2001-09-01").cast(org.apache.spark.sql.types.TimestampNTZType))
      .count()
    assert(nLines == want)
    out.foreach { r =>
      // disc_price <= base price; charge >= disc_price (tax >= 0)
      assert(r.getAs[Long]("sum_disc_price_e4") <=
        r.getAs[Long]("sum_base_cents") * 100)
      assert(r.getAs[Long]("sum_charge_e6") >=
        r.getAs[Long]("sum_disc_price_e4") * 100)
      assert(r.getAs[Double]("avg_qty") ==
        r.getAs[Long]("sum_qty").toDouble / r.getAs[Long]("n_lines").toDouble)
    }
  }

  test("j13: promo share is bounded and revenue conserves per month") {
    val out = graft.analytics.Star.promoShare(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val promo = r.getAs[Long]("promo_cents")
      val total = r.getAs[Long]("total_cents")
      assert(promo >= 0 && promo <= total)
      assert(r.getAs[Long]("promo_milli") == promo * 1000 / total)
    }
    val totalAll = out.map(_.getAs[Long]("total_cents")).sum
    val want = Tables.sales(spark, sfDir)
      .agg((sum(col("line_total") - col("discount_amount")) * 100)
        .cast("long")).head.getLong(0)
    assert(totalAll == want)
  }

  test("a39: per-day new+repeat partitions that day's distinct customers") {
    val out = Kpis.newVsRepeat(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_custkey"))
      .groupBy("d").agg(countDistinct("o_custkey").as("n"))
    val joined = out.join(o, "d")
      .filter(col("new_customers") + col("repeat_customers") =!= col("n"))
    assert(joined.count() == 0)
    // revenue conservation: the two halves sum to the raw order total
    val got = out
      .agg(sum(col("new_revenue_cents") + col("repeat_revenue_cents")))
      .head.getLong(0)
    val want = Tables.orders(spark, sfDir)
      .agg((sum(col("o_totalprice").cast(Tables.Money)) * 100).cast("long"))
      .head.getLong(0)
    assert(got == want)
  }

  test("a39: first observed day for every customer lands in new, never repeat") {
    // a customer's first day contributes >=1 new customer that day:
    // aggregate new_customers over all days == |customers with orders|
    val out = Kpis.newVsRepeat(spark, sfDir)
    val newTotal = out.agg(sum(col("new_customers"))).head.getLong(0)
    val want = Tables.orders(spark, sfDir)
      .agg(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(newTotal == want)
  }
}
