package graft

import graft.analytics.Sketches
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Error bounds for the approximate sketches vs their exact twins. */
class SketchesSpec extends GraftSpec {

  test("sk1: HLL daily user counts within 5% of exact; quantiles ordered") {
    val approx = Sketches.dailyApprox(spark, sfDir)
      .select(col("event_date"), col("approx_users"), col("p50_value"), col("p99_value"))
    val exact = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val j = approx.join(exact, "event_date")
    assert(j.count() > 0)
    val bad = j.filter(
      abs(col("approx_users") - col("exact_users")) >
        greatest(col("exact_users") * 0.05, lit(3.0)))
    assert(bad.count() === 0, "HLL rsd=0.01 should stay within 5% (or ±3 small-n)")
    assert(j.filter(col("p99_value") < col("p50_value")).count() === 0)
  }

  test("sk2: approx sku counts within 5% of exact per store") {
    val approx = Sketches.storeSkuApprox(spark, sfDir)
    val exact = Tables.sales(spark, sfDir)
      .groupBy("store_id").agg(countDistinct(col("sku")).as("exact_skus"))
    val j = approx.join(exact, "store_id")
    val bad = j.filter(
      abs(col("approx_skus") - col("exact_skus")) >
        greatest(col("exact_skus") * 0.05, lit(3.0)))
    assert(bad.count() === 0)
  }

  test("sk5: approx vocabulary within 5% of t16's exact types per domain") {
    val approx = Sketches.domainVocabApprox(spark, sfDir)
    val exact = graft.text.TextAnalysis.lexicalDiversity(spark, sfDir)
      .select(col("lang"), col("source"),
        col("n_types").as("exact_types"), col("n_tokens").as("exact_tokens"))
    val j = approx.join(exact, Seq("lang", "source")).cache()
    try {
      assert(j.count() === approx.count(), "domains must line up 1:1")
      val bad = j.filter(
        abs(col("approx_types") - col("exact_types")) >
          greatest(col("exact_types") * 0.05, lit(3.0)))
      assert(bad.count() === 0, "HLL rsd=0.01 should stay within 5% (or ±3 small-n)")
      // the token counts share no sketch — they must be exactly equal
      assert(j.filter(col("n_tokens") =!= col("exact_tokens")).count() === 0)
    } finally j.unpersist()
  }

  test("sk3: Misra-Gries is exact when the summary covers the key space") {
    // summarySize >> distinct skus: no decrements ever fire, so the
    // summary IS the exact count map and the top-5 must equal the exact
    // ranking under the same (count desc, sku asc) tie-break
    val mg = Sketches.storeTopSellers(spark, sfDir, topK = 5, summarySize = 100000)
    assert(mg.filter(col("max_err") =!= 0L).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("store_id"))
      .orderBy(col("n").desc, col("sku").asc)
    val exact = Tables.sales(spark, sfDir)
      // the summary keys on strings — rank the exact twin over the same
      // key space so ties break identically
      .select(col("store_id"), col("sku").cast("string").as("sku"))
      .groupBy("store_id", "sku").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("store_id"), col("rank").cast("long").as("rank"),
        col("sku"), col("n").as("exact_count"))
    val j = mg.join(exact, Seq("store_id", "rank"), "full")
    assert(j.filter(mg("sku").isNull || exact("sku").isNull).count() === 0,
      "row sets differ")
    assert(j.filter(mg("sku") =!= exact("sku") ||
      col("est_count") =!= col("exact_count")).count() === 0,
      "exact-regime summary diverges from the true ranking")
  }

  test("sk3: under-count + error bound hold under a tight summary") {
    val mg = Sketches.storeTopSellers(spark, sfDir, topK = 5, summarySize = 8)
    val exact = Tables.sales(spark, sfDir)
      .select(col("store_id"), col("sku").cast("string").as("sku"))
      .groupBy("store_id", "sku").agg(count(lit(1)).as("exact_count"))
    val j = mg.join(exact, Seq("store_id", "sku"), "left")
    // every reported key exists in the data with est <= true <= est+err
    assert(j.filter(col("exact_count").isNull).count() === 0)
    assert(j.filter(col("est_count") > col("exact_count")).count() === 0,
      "Misra-Gries must never over-count")
    assert(j.filter(col("exact_count") > col("est_count") + col("max_err"))
      .count() === 0, "true count exceeds the certified error bound")
    assert(mg.filter(col("max_err") < 0).count() === 0)
  }

  test("sk6: merged-sketch rolling series within 5% of e15's exact series, " +
    "same day spine") {
    val approx = Sketches.rollingApprox(spark, sfDir)
    val exact = graft.streaming.EventsBatch.rollingDistinct(spark, sfDir)
    val j = approx.join(exact, "window_day")
    assert(j.count() === exact.count(), "sketch series must cover the exact spine")
    assert(approx.count() === exact.count())
    val bad = j.filter(
      abs(col("approx_active_7d") - col("n_active_7d")) >
        greatest(col("n_active_7d") * 0.05, lit(3.0)))
    assert(bad.count() === 0, "HLL union should stay within 5% (or ±3 small-n)")
  }

  test("sk7: CMS estimates recompute exactly in-process; one-sided " +
    "(never an undercount); exact when width clears the key space") {
    val P = 1000003L
    val (depth, width) = (3, 64)
    def bucket(j: Int, k: Long): Long =
      ((k * (37L + 101L * j) + (17L + 61L * j)) % P) % width
    val skus = Tables.sales(spark, sfDir).select("sku").collect()
      .map(_.getAs[Long]("sku"))
    val truth = skus.groupBy(identity).map { case (k, rs) => k -> rs.length.toLong }
    val cells = skus.flatMap(k => (0 until depth).map(j => (j, bucket(j, k))))
      .groupBy(identity).map { case (c, rs) => c -> rs.length.toLong }
    val expect = truth.keys.map { k =>
      k -> (0 until depth).map(j => cells((j, bucket(j, k)))).min
    }.toMap
    val res = Sketches.cmsEstimates(spark, sfDir).collect()
    assert(res.length === truth.size)
    res.foreach { r =>
      val k = r.getAs[Long]("sku")
      assert(r.getAs[Long]("true_n") === truth(k))
      assert(r.getAs[Long]("est_n") === expect(k))
      assert(r.getAs[Long]("overcount") === expect(k) - truth(k))
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"),
        "CMS must never under-count")
    }
    // exact regime: width larger than the key space -> only same-key
    // collisions remain possible per row, but the affine family is
    // injective on this small domain, so estimates equal truth
    val wide = Sketches.cmsEstimates(spark, sfDir, depth, 65536).collect()
    assert(wide.forall(r => r.getAs[Long]("overcount") === 0L),
      "with width >> keys the sketch must be exact")
  }

  test("sk8: Bloom prune has ZERO false negatives and an exact ledger") {
    val res = Sketches.bloomPrune(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      // one-sided error: every true match must pass the filter
      assert(r.getAs[Long]("n_bloom_pass") >= r.getAs[Long]("n_true_match"),
        "a Bloom filter must never reject a member")
      assert(r.getAs[Long]("n_false_pos") ===
        r.getAs[Long]("n_bloom_pass") - r.getAs[Long]("n_true_match"))
      assert(r.getAs[Long]("n_probe") >= r.getAs[Long]("n_bloom_pass"))
    }
    // the ledger's true-match total must equal an independent semi-join
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey")).distinct()
    val exact = Tables.lineitem(spark, sfDir)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(res.map(_.getAs[Long]("n_true_match")).sum === exact)
  }

  test("sk10: CMS join-size estimate is one-sided and within the " +
    "L1-bound of the exact size") {
    val r = Sketches.cmsJoinSize(spark, sfDir).collect()
    assert(r.length === 3)
    r.foreach { x =>
      // colliding keys only add phantom products: never an under-estimate
      assert(x.getAs[Long]("overcount") >= 0L,
        s"${x.getAs[String]("join_name")}: CMS inner product under-counted")
      // and the error stays in the ||a||1*||b||1/w regime, not degenerate
      assert(x.getAs[Long]("est_rows") <=
        50L * math.max(1L, x.getAs[Long]("exact_rows")),
        s"${x.getAs[String]("join_name")}: estimate degenerate")
    }
  }

  test("sk9: sketch set algebra brackets the exact segment overlap") {
    val r = Sketches.audienceOverlap(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val typed = Tables.events(spark, sfDir)
      .select(when(dayofweek(col("ts")).isin(1, 7), "weekend")
        .otherwise("weekday").as("day_type"), col("user_id"))
    val exactWd = typed.filter(col("day_type") === "weekday")
      .select("user_id").distinct().count()
    val exactWe = typed.filter(col("day_type") === "weekend")
      .select("user_id").distinct().count()
    val exactUnion = typed.select("user_id").distinct().count()
    val exactOverlap = exactWd + exactWe - exactUnion
    def within(est: Long, exact: Long, tol: Double, slack: Double) =
      math.abs(est - exact).toDouble <= math.max(exact * tol, slack)
    assert(within(row.getAs[Long]("n_weekday"), exactWd, 0.05, 3))
    assert(within(row.getAs[Long]("n_weekend"), exactWe, 0.05, 3))
    assert(within(row.getAs[Long]("n_union"), exactUnion, 0.05, 3))
    // intersection inherits BOTH operands' error — wider tolerance
    assert(within(row.getAs[Long]("n_overlap_est"), exactOverlap, 0.15,
      0.1 * exactUnion))
  }

  test("sk12: every precision tier brackets the exact distinct count at " +
    "its advertised rsd; exact column is the true count") {
    import graft.analytics.Sketches
    import graft.model.Tables
    val rows = Sketches.hllPrecisionSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("rsd"))
    assert(rows.map(_.getAs[Double]("rsd")).toSeq === Seq(0.01, 0.02, 0.05, 0.1))
    val exact = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") === exact)
      val est = r.getAs[Long]("approx_users")
      // 5-sigma of the advertised rsd, plus small-count slack
      val tol = math.max(exact * r.getAs[Double]("rsd") * 5, 3.0)
      assert(math.abs(est - exact).toDouble <= tol,
        s"rsd=${r.getAs[Double]("rsd")}: est $est vs exact $exact")
      assert(r.getAs[Long]("abs_err_milli") ===
        math.abs(est - exact) * 1000 / exact)
    }
  }

  test("sk15: histogram quantile estimates honor the bin-width error " +
    "guarantee against an exact in-process recompute") {
    val bins = 64
    val vals = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .select(col("store_id"),
        ((col("gross_dec") - col("disc_dec")) * 100).cast("long").as("cents"))
      .collect()
      .map(r => r.getAs[String]("store_id") -> r.getAs[Long]("cents"))
    val lo = vals.map(_._2).min
    val hi = vals.map(_._2).max
    val width = (hi - lo + 1) / bins + 1
    val byStore = vals.groupBy(_._1).map { case (s, vs) =>
      s -> vs.map(_._2).sorted
    }
    val res = graft.analytics.Sketches.histogramQuantiles(spark, sfDir).collect()
    assert(res.length === byStore.size)
    res.foreach { r =>
      val s = r.getAs[String]("store_id")
      val sorted = byStore(s)
      val n = sorted.length
      assert(r.getAs[Long]("n_days") === n.toLong)
      // a34's positional ranks: value at ceil(n/2), ceil(9n/10)
      val exactP50 = sorted(((n + 1) / 2) - 1)
      val exactP90 = sorted(((9 * n + 9) / 10) - 1)
      val estP50 = r.getAs[Long]("p50_est_cents")
      val estP90 = r.getAs[Long]("p90_est_cents")
      // the estimate is the lower edge of the bin CONTAINING the exact
      // positional value: never above it, never more than a width below
      assert(estP50 <= exactP50 && exactP50 - estP50 <= width,
        s"store $s: p50 est $estP50 vs exact $exactP50 (width $width)")
      assert(estP90 <= exactP90 && exactP90 - estP90 <= width,
        s"store $s: p90 est $estP90 vs exact $exactP90 (width $width)")
      assert(estP50 <= estP90, "quantile estimates must be monotone")
    }
  }
}
