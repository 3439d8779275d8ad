package graft

import graft.etl.{StoreDaily, CompanyDaily, Completeness}
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Cross-operator invariants the reference guarantees by construction
  * (SURVEY.md §5): rollup consistency, top-k containment, anti-join
  * partitioning. */
class OperatorInvariantsSpec extends GraftSpec {

  /** Single-date-parameterized queries may legitimately be empty at
    * sf0.001 (~2.4 rows/day); the sf0.01 oracle gate covers their values. */
  private val mayBeEmptyAtSf0001 = Set("a16_product_history",
    // blocked edit-distance pairs: (brand, size) shelves hold ~1 part
    // each at sf0.001, so no candidate pairs exist to score
    "k11_fuzzy_part_names")

  test("every SparkEntry query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (!mayBeEmptyAtSf0001(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key with oracle SQL exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("a20 precondition: dimension store set equals the range-active store set") {
    // pivotWide's Spark side takes its column list from the supplier
    // dimension (the reference's fixed store set); the DuckDB oracle's
    // dynamic PIVOT derives columns from the fact data. They only agree
    // while every dimension store trades in the queried range — assert
    // that here so a future data change fails fast with a clear message.
    val fromDim = graft.model.Tables.supplier(spark, sfDir)
      .select(format_string("%04d", col("s_suppkey")).as("store_id"))
      .collect().map(_.getString(0)).toSet
    val fromFact = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .filter(col("sale_date").between(
        graft.etl.Defaults.rangeStart, graft.etl.Defaults.rangeEnd))
      .select(col("store_id")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(fromDim === fromFact,
      "supplier dimension and range-active fact stores diverged — " +
        "pivotWide's column list no longer matches the oracle's dynamic PIVOT")
  }

  test("a1: net_sales = total_sales - total_discount; avg = net/count") {
    val bad = StoreDaily.rollup(spark, sfDir)
      .filter(abs(col("net_sales") - (col("total_sales") - col("total_discount"))) > 1e-9 ||
        abs(col("avg_transaction") - col("net_sales") / col("transaction_count")) > 1e-9)
      .count()
    assert(bad === 0)
  }

  test("a4 company daily equals sum of a1 store dailies") {
    val fromStores = StoreDaily.rollupDec(spark, sfDir)
      .groupBy("sale_date")
      .agg(sum("gross_dec").cast("double").as("s"), sum("transaction_count").as("t"))
    val company = CompanyDaily.rollup(spark, sfDir)
      .select(col("sale_date"), col("total_sales"), col("total_transactions"))
    val joined = company.join(fromStores, "sale_date")
    assert(joined.count() > 0)
    val bad = joined.filter(abs(col("total_sales") - col("s")) > 1e-6 ||
      col("total_transactions") =!= col("t")).count()
    assert(bad === 0)
  }

  test("a3 top-5 is a subset of the full per-(store,day,sku) ranking") {
    val top5 = StoreDaily.topProductsDec(spark, sfDir, 5)
    val full = Tables.sales(spark, sfDir)
      .groupBy(col("store_id"), col("sale_date"), col("sku"))
      .agg(sum(col("line_total") - col("discount_amount")).as("rev_full"))
    val joined = top5.join(full, Seq("store_id", "sale_date", "sku"), "left")
    assert(joined.filter(col("rev_full").isNull).count() === 0)
    assert(joined.filter(col("rev_dec") =!= col("rev_full")).count() === 0)
    // never more than 5 per group
    val over = top5.groupBy("store_id", "sale_date").count().filter(col("count") > 5)
    assert(over.count() === 0)
  }

  test("summary document: nested columns agree with their flat projections") {
    val doc = StoreDaily.summaryDocument(spark, sfDir).cache()
    try {
      // nested top_products explodes back to the a3 relation
      val fromDoc = doc.select(col("store_id"), col("sale_date"),
          explode(col("top_products")).as("p"))
        .select(col("store_id"), col("sale_date"), col("p.rank"),
          col("p.sku"), col("p.units"), col("p.rev_dec"))
      val flat = StoreDaily.topProductsDec(spark, sfDir, 5)
        .select(col("store_id"), col("sale_date"), col("rank"),
          col("sku"), col("units"), col("rev_dec"))
      assert(fromDoc.exceptAll(flat).count() === 0)
      assert(flat.exceptAll(fromDoc).count() === 0)
      // payment map values sum to total_sales - total_discount (net)
      val mapSum = doc.select(col("store_id"), col("sale_date"), col("net_sales"),
        aggregate(map_values(col("payment_breakdown")),
          lit(0.0), (acc, v) => acc + v.cast("double")).as("map_total"))
      assert(mapSum.filter(abs(col("map_total") - col("net_sales")) > 1e-6).count() === 0)
    } finally doc.unpersist()
  }

  test("j3: missing ∪ reported = expected stores, disjoint") {
    val date = graft.etl.Defaults.targetDate
    val expected = Completeness.expectedStores(spark, sfDir)
    val reported = Tables.sales(spark, sfDir)
      .filter(col("sale_date") === date).select("store_id").distinct()
    val missing = Completeness.missingStores(spark, sfDir)
    assert(missing.count() + reported.count() === expected.count())
    assert(missing.join(reported, "store_id").count() === 0)
  }

  test("a12: trend direction moves at exactly 2 history days (reference n==2 rule)") {
    import spark.implicits._
    // 3 consecutive days for one store: day3 has hist {d1, d2}; recent
    // avg=(d1+d2)/2 vs earlier=d1. 100 then 200 -> avg 150 > 100*1.05.
    val rows = Seq(
      ("0001", "2020-01-01", BigDecimal(100)),
      ("0001", "2020-01-02", BigDecimal(200)),
      ("0001", "2020-01-03", BigDecimal(50))).toDF("store_id", "sale_date", "gross")
    // reproduce trendDirection's algebra directly on a tiny frame through
    // the same rule: recent=[both], earlier=[older] at n==2
    val hist2 = Seq(100.0, 200.0)
    val recentAvg = hist2.sum / 2
    val earlierAvg = hist2.head
    assert(recentAvg > earlierAvg * 1.05) // 'increasing' per reference
    val a12 = graft.analytics.History.trendDirection(spark, sfDir)
    val n2 = a12.filter(col("hist_days") === 2)
    assert(n2.count() > 0, "sf0.001 should contain 2-day histories")
    // with the fix, 2-day rows must have non-null earlier_avg
    assert(n2.filter(col("earlier_avg").isNull).count() === 0)
    assert(rows.count() === 3)
  }

  test("t18: charset census matches an exact per-char classification") {
    import graft.text.TextAnalysis
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val res = TextAnalysis.charsetProfile(spark, sfDir).collect()
    assert(res.length === docs.size)
    res.foreach { r =>
      val t = docs(r.getAs[Long]("doc_id"))
      val cs = t.toCharArray
      val nChars = cs.length.toLong
      val nLetter = cs.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')).toLong
      val nUpper = cs.count(c => c >= 'A' && c <= 'Z').toLong
      val nDigit = cs.count(c => c >= '0' && c <= '9').toLong
      val nSpace = cs.count(c => c == ' ' || c == '\t' || c == '\n' || c == '\r').toLong
      val nAscii = cs.count(c => (c >= ' ' && c <= '~') || c == '\t' || c == '\n' || c == '\r').toLong
      assert(r.getAs[Long]("n_chars") === nChars)
      assert(r.getAs[Long]("n_letter") === nLetter)
      assert(r.getAs[Long]("n_upper") === nUpper)
      assert(r.getAs[Long]("n_digit") === nDigit)
      assert(r.getAs[Long]("n_space") === nSpace)
      assert(r.getAs[Long]("n_punct") === nAscii - nLetter - nDigit - nSpace)
      assert(r.getAs[Long]("n_non_ascii") === nChars - nAscii)
      assert(r.getAs[Double]("ascii_ratio") ===
        nAscii.toDouble / nChars.toDouble)
    }
  }
}
