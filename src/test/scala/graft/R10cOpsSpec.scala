package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-3 keys: k17 compaction plan,
  * k18 expectation suite, sk19 native GK quantiles. */
class R10cOpsSpec extends GraftSpec {

  test("k17: compaction plan matches an in-process bin-pack recompute " +
      "and the fixture shows real compaction") {
    val target = 4096L
    val got = graft.etl.Compaction.compactionPlan(spark, sfDir, target)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    val files = Tables.sales(spark, sfDir)
      .groupBy(col("sale_date"), col("store_id")).count().collect()
      .map(r => (r.getString(0), r.getString(1), 32L + 24L * r.getLong(2)))
    val byPart = files.groupBy(f => (f._1.substring(0, 7), f._2))
    byPart.foreach { case (part, fs) =>
      val ordered = fs.sortBy(_._1)
      var cum = 0L
      var bins = Set.empty[Long]
      var small = 0L
      var rewritten = 0L
      ordered.foreach { case (_, _, b) =>
        if (b < target) {
          cum += b; small += 1; rewritten += b
          bins += (cum - 1) / target
        }
      }
      val total = ordered.map(_._3).sum
      val expect = (ordered.size.toLong, small,
        bins.size.toLong + (ordered.size - small),
        total, rewritten, rewritten * 1000 / total)
      assert(got(part) == expect, s"partition $part")
      // bins must be contiguous from 0 (the max+1 counting rule)
      if (bins.nonEmpty) assert(bins == (0L until bins.max + 1).toSet)
    }
    assert(got.keySet == byPart.keySet)
    val before = got.values.map(_._1).sum
    val after = got.values.map(_._3).sum
    assert(after < before,
      "fixture must show the plan actually merging small files")
  }

  test("k18: every expectation metric matches an in-process recompute, " +
      "and the rubric exercises both the pass and fail paths") {
    val got = graft.analytics.Expectations.expectationSuite(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .collect()
    val n = ord.length.toLong
    assert(got("ord_custkey_complete")._1 ==
      ord.count(!_.isNullAt(1)) * 1000L / n)
    assert(got("ord_status_domain")._1 ==
      ord.count(r => Set("O", "F", "P")(r.getString(2))) * 1000L / n)
    assert(got("ord_total_positive")._1 ==
      ord.count(_.getDouble(3) > 0d) * 1000L / n)
    assert(got("ord_key_unique")._1 ==
      ord.map(_.getLong(0)).distinct.length * 1000L / n)
    val months = ord.map(_.getInt(4)).distinct
    assert(got("ord_month_continuity")._1 ==
      months.length * 1000L / (months.max - months.min + 1))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_discount"), col("l_extendedprice"))
      .collect()
    val ln = li.length.toLong
    assert(got("li_qty_range")._1 ==
      li.count(r => r.getDouble(0) >= 1d && r.getDouble(0) <= 50d) * 1000L / ln)
    assert(got("li_disc_range")._1 ==
      li.count(r => r.getDouble(1) >= 0d && r.getDouble(1) <= 0.10) * 1000L / ln)
    assert(got("li_disc_low")._1 ==
      li.count(_.getDouble(1) <= 0.05) * 1000L / ln)
    assert(got("li_price_positive")._1 ==
      li.count(_.getDouble(2) > 0d) * 1000L / ln)
    // ok is the threshold comparison, and the suite shows both verdicts
    got.values.foreach { case (m, t, ok) =>
      assert(ok == (if (m >= t) 1L else 0L))
    }
    assert(got("li_disc_low")._3 == 0L,
      "the deliberately tight expectation must FAIL on this corpus")
    assert(got.count(_._2._3 == 1L) >= 7,
      "the healthy checks must pass on this corpus")
  }

  test("a50: ACF matches an in-process recompute over the positional " +
      "company series and lag-0 self-correlation sanity holds at lag 7 vs 1") {
    val got = graft.analytics.Series.acf(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == (1L to 14L).toSet)
    val series = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .groupBy(col("sale_date"))
      .agg(sum((col("gross_dec") - col("disc_dec")) * 100).as("net"))
      .orderBy(col("sale_date")).collect()
      .map(_.getDecimal(1).longValueExact())
    (1 to 14).foreach { k =>
      val x = series.dropRight(k).map(_.toDouble)
      val y = series.drop(k).map(_.toDouble)
      val n = x.length.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum
      val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val expect = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (np, acf) = got(k.toLong)
      assert(np == x.length.toLong)
      assert(math.abs(acf - expect) < 1e-9, s"lag $k: $acf vs $expect")
    }
  }

  test("a52: the changepoint is the argmax of an in-process gain scan " +
      "and the two-mean decomposition is exact") {
    val r = graft.analytics.Series.changepoint(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val series = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .groupBy(col("sale_date"))
      .agg(sum((col("gross_dec") - col("disc_dec")) * 100).as("net"))
      .orderBy(col("sale_date")).collect()
      .map(x => (x.getString(0), x.getDecimal(1).longValueExact()))
    val n = series.length
    val s = series.map(_._2).sum
    val cums = series.map(_._2).scanLeft(0L)(_ + _).tail
    def gainOf(t: Int): Double = {
      val sl = cums(t - 1).toDouble
      val sr = s.toDouble - sl
      sl * sl / t + sr * sr / (n - t) - s.toDouble * s.toDouble / n
    }
    val bestT = (1 until n).minBy(t => (-gainOf(t), t))
    assert(row.getLong(1) == bestT.toLong)
    assert(row.getString(0) == series(bestT - 1)._1)
    assert(row.getLong(2) == n.toLong)
    assert(math.abs(row.getDouble(3) - gainOf(bestT)) < 1e-6)
    assert(row.getLong(5) == cums(bestT - 1) / bestT)
    assert(row.getLong(6) == (s - cums(bestT - 1)) / (n - bestT))
    val syy = series.map(v => BigInt(v._2) * BigInt(v._2)).sum
    val sse = syy.toDouble - s.toDouble * s.toDouble / n
    assert(row.getLong(4) == math.floor(gainOf(bestT) * 1000d / sse).toLong)
  }

  test("a51: Benford digit counts match an in-process recompute and the " +
      "per-mille table is exact") {
    val got = graft.analytics.Series.benfordAudit(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cents = Tables.orders(spark, sfDir)
      .where(col("o_totalprice") > 0d)
      .select((col("o_totalprice").cast(Tables.Money) * 100).cast("long"))
      .collect().map(_.getLong(0))
    val counts = cents.groupBy(_.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val benford = Map(1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
      6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)
    assert(got.keySet == counts.keySet.map(_.toLong))
    counts.foreach { case (d, n) =>
      val obsMilli = n * 1000L / total
      assert(got(d.toLong) ==
        (n, obsMilli, benford(d), obsMilli - benford(d)), s"digit $d")
    }
  }

  test("sk19: GK estimates honor the rank-error bound n/accuracy against " +
      "the per-store order statistics, and the exact anchors are positional") {
    val accuracy = 1000
    val rows = graft.analytics.Sketches.nativeQuantiles(spark, sfDir, accuracy)
      .collect()
    assert(rows.nonEmpty)
    val byStore = Tables.sales(spark, sfDir)
      .select(col("store_id"), (col("line_total") * 100).cast("long"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val store = r.getString(0)
      val sorted = byStore(store)
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      val allowed = n.toDouble / accuracy + 1
      Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4).foreach { case (q, i) =>
        val est = r.getLong(i)
        // rank interval of the returned value in the sorted series
        val lo = sorted.count(_ < est) + 1
        val hi = sorted.count(_ <= est)
        assert(hi >= lo, s"store $store q=$q: estimate $est not in data")
        val targetRank = q * n
        assert(targetRank >= lo - allowed && targetRank <= hi + allowed,
          s"store $store q=$q: est $est ranks [$lo,$hi], target $targetRank")
      }
      // positional anchors: value at row ceil(qn) of the sorted series
      assert(r.getLong(5) == sorted((n + 1) / 2 - 1))
      assert(r.getLong(6) == sorted((9 * n + 9) / 10 - 1))
      assert(r.getLong(7) == sorted((99 * n + 99) / 100 - 1))
    }
  }
}
