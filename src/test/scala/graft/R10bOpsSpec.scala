package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-2 keys: smp3 temperature mix,
  * er2 golden-record survivorship, sk17 bitmap exact-distinct, s9 ORC
  * round trip. */
class R10bOpsSpec extends GraftSpec {

  test("smp3: quotas are Hamilton over isqrt weights, sum to budget, " +
      "and flatten the mixture relative to smp1") {
    val budget = 60
    def isqrt(n: Long): Long = {
      val f = math.sqrt(n.toDouble).toLong
      f + (if ((f + 1) * (f + 1) <= n) 1L else 0L) - (if (f * f > n) 1L else 0L)
    }
    val strata = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val smp3 = graft.text.Sampling.temperatureMix(spark, sfDir, budget)
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.length.toLong).toMap
    assert(smp3.values.sum == budget)
    // Hamilton over isqrt weights, recomputed in-process
    val w = strata.view.mapValues(isqrt).toMap
    val tot = w.values.sum
    val base = w.view.mapValues(v => budget * v / tot).toMap
    val leftover = budget - base.values.sum
    val extras = w.toSeq
      .sortBy { case (k, v) => (-(budget * v % tot), k._1, k._2) }
      .take(leftover.toInt).map(_._1).toSet
    strata.keys.foreach { k =>
      val expect = base(k) + (if (extras(k)) 1L else 0L)
      assert(smp3.getOrElse(k, 0L) == expect, s"stratum $k")
    }
    // sqrt temperature flattens: smallest stratum's share grows (or holds),
    // largest stratum's share shrinks (or holds) vs proportional smp1
    val smp1 = graft.text.Sampling.stratifiedSample(spark, sfDir, budget)
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.length.toLong).toMap
    val smallest = strata.minBy(_._2)._1
    val largest = strata.maxBy(_._2)._1
    assert(smp3.getOrElse(smallest, 0L) >= smp1.getOrElse(smallest, 0L))
    assert(smp3.getOrElse(largest, 0L) <= smp1.getOrElse(largest, 0L))
  }

  test("er2: survivorship matches a full in-process recompute of all " +
      "three merge rules") {
    val got = graft.analytics.Linkage.goldenRecord(spark, sfDir).collect()
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        (col("c_acctbal").cast(Tables.Money) * 100).cast("long"))
      .collect()
    assert(got.length == cust.length)
    val byKey = got.map(r => r.getLong(0) -> r).toMap
    cust.foreach { c =>
      val (k, nm, seg, cents) =
        (c.getLong(0), c.getString(1), c.getString(2), c.getLong(3))
      val srcs = Seq(
        ("crm", 1, nm, if (k % 7 == 0) None else Some(cents - k % 100),
          if (k % 3 == 0) None else Some(seg)),
        ("web", 2, nm.take(12), Some(cents), Some(seg.toLowerCase)),
        ("pos", 3, nm.toUpperCase, if (k % 5 == 0) None else Some(cents),
          Some(seg)))
      val r = byKey(k)
      val bestName = srcs.minBy { case (_, p, n, _, _) => (-n.length, n, p) }
      assert(r.getString(1) == bestName._3 && r.getString(2) == bestName._1,
        s"name pick for $k")
      val balCands = srcs.filter(_._4.isDefined).sortBy(_._2)
      assert(r.getLong(3) == balCands.head._4.get, s"balance for $k")
      assert(r.getString(4) == balCands.head._1)
      assert(r.getLong(5) == balCands.length.toLong)
      val votes = srcs.flatMap(_._5).groupBy(identity)
        .view.mapValues(_.size).toSeq
      val bestSeg = votes.minBy { case (v, n) => (-n, v) }
      assert(r.getString(6) == bestSeg._1, s"segment for $k")
      assert(r.getLong(7) == bestSeg._2.toLong)
      assert(r.getLong(8) == votes.length.toLong)
    }
  }

  test("sk17: bitmap fold equals Spark's own exact distinct, with no " +
      "Expand-based rewrite in the plan") {
    val got = graft.analytics.Sketches.bitmapDistinct(spark, sfDir)
    val exact = Tables.sales(spark, sfDir)
      .groupBy(col("store_id"))
      .agg(countDistinct(col("sku")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val company = Tables.sales(spark, sfDir)
      .select(col("sku")).distinct().count()
    val rows = got.collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), s"store ${r.getString(0)}")
      assert(r.getLong(2) == company)
    }
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "bitmap path must not fall back to the expand-based distinct rewrite")
  }

  test("k15: layouts conserve rows, agree on selectivity, and the " +
      "z-order box test matches an in-process recompute") {
    val rowsPerFile = 64
    // rectangle sized to the sf0.001 domains (sku 0..199, supp 0..9)
    val (qSkuLo, qSkuHi, qSupLo, qSupHi) = (40L, 120L, 2L, 4L)
    val got = graft.etl.Layout.zorderPruning(spark, sfDir, rowsPerFile,
      qSkuLo, qSkuHi, qSupLo, qSupHi)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong))
    val n = rows.length.toLong
    // in-process z recompute with the same 10-bit min-max scaling
    val (skuLo, skuHi) = (rows.map(_._1).min, rows.map(_._1).max)
    val (supLo, supHi) = (rows.map(_._2).min, rows.map(_._2).max)
    def scale(v: Long, lo: Long, hi: Long) = (v - lo) * 1023 / math.max(1, hi - lo)
    def z(sku: Long, sup: Long): Long = {
      val (a, b) = (scale(sku, skuLo, skuHi), scale(sup, supLo, supHi))
      (0 until 10).map(i =>
        (((a >> i) & 1) << (2 * i)) + (((b >> i) & 1) << (2 * i + 1))).sum
    }
    def readout(ordered: Array[(Long, Long, Long, Long)]) = {
      val files = ordered.zipWithIndex.groupBy(_._2 / rowsPerFile).values
      val touched = files.count { f =>
        val skus = f.map(_._1._1); val sups = f.map(_._1._2)
        skus.min <= qSkuHi && skus.max >= qSkuLo &&
          sups.min <= qSupHi && sups.max >= qSupLo
      }.toLong
      (files.size.toLong, touched)
    }
    val (zf, zt) = readout(rows.sortBy(r => (z(r._1, r._2), r._3, r._4)))
    val (lf, lt) = readout(rows.sortBy(r => (r._1, r._2, r._3, r._4)))
    val sel = rows.count(r => r._1 >= qSkuLo && r._1 <= qSkuHi &&
      r._2 >= qSupLo && r._2 <= qSupHi).toLong
    assert(got("zorder") ==
      (zf, zt, zt * 1000 / zf, n, sel), "zorder readout")
    assert(got("linear") ==
      (lf, lt, lt * 1000 / lf, n, sel), "linear readout")
    assert(got("zorder")._2 < got("linear")._2,
      "fixture must show z-order actually pruning more than linear")
  }

  test("k16: purge audit matches an in-process recompute of cohort, " +
      "partition touch set, and write amplification") {
    val mod = 97L
    val got = graft.etl.Purge.purgeAudit(spark, sfDir, mod).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val purged = orders.filter(t => t._2 % mod == 0).map(_._1).toSet
    def readout[K](parts: Map[K, (Long, Long)]) = {
      val rows = parts.values.map(_._1).sum
      val np = parts.values.map(_._2).sum
      val touched = parts.values.filter(_._2 > 0)
      (rows, np, np * 1000 / rows, parts.size.toLong,
        touched.size.toLong,
        touched.map(_._1).sum * 1000 / math.max(1, np))
    }
    val oParts = orders.groupBy(_._3).view.mapValues(g =>
      (g.length.toLong, g.count(t => purged(t._1)).toLong)).toMap
    assert(got("orders") == readout(oParts))
    val sales = Tables.sales(spark, sfDir)
      .select(col("l_orderkey"), col("store_id"),
        substring(col("sale_date"), 1, 7)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val lParts = sales.groupBy(t => (t._3, t._2)).view.mapValues(g =>
      (g.length.toLong, g.count(t => purged(t._1)).toLong)).toMap
    assert(got("lineitem") == readout(lParts))
    assert(got("lineitem")._6 > 1000L,
      "fixture must show real write amplification (>1 row rewritten per purge)")
  }

  test("s9: the ORC round trip is value-exact — rollup via ORC equals " +
      "the same rollup straight off parquet") {
    val viaOrc = graft.ingest.Ingest.orcRoundtrip(spark, sfDir).collect()
    val direct = Tables.sales(spark, sfDir)
      .groupBy(col("store_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("quantity")).as("total_units"),
        sum(col("line_total") - col("discount_amount")).cast("double")
          .as("net_sales"),
        countDistinct(col("sale_date")).as("n_dates"))
      .orderBy(col("store_id")).collect()
    assert(viaOrc.length == direct.length && viaOrc.length > 0)
    viaOrc.zip(direct).foreach { case (a, b) => assert(a == b) }
  }
}
