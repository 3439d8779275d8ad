package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-5 keys: t33 Naive Bayes lang
  * classifier, k19 workload-aware partition-key advisor. */
class R10eOpsSpec extends GraftSpec {

  /** Exact milli-bits of q/1024 — the engine's floor-log2 + linear
    * mantissa read-off, recomputed independently. */
  private def bitsMilli(q: Long): Long = {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(q)
    val p = 1L << b
    (b - 10) * 1000L + (q - p) * 1000L / p
  }

  test("t33: confusion matrix matches an in-process NB train/score " +
      "recompute with Laplace smoothing in exact milli-bits") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").filter(_.nonEmpty)))
    val train = docs.filter(_._1 % 2 == 0)
    val test = docs.filter(_._1 % 2 == 1)
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    train.foreach { case (_, l, ws) => ws.foreach(w => cnt((l, w)) += 1) }
    val totL = train.groupBy(_._2).map { case (l, ds) =>
      l -> ds.map(_._3.length.toLong).sum }
    val ndL = train.groupBy(_._2).map { case (l, ds) => l -> ds.size.toLong }
    val v = train.flatMap(_._3).distinct.length.toLong
    val nTrain = train.length.toLong
    val langs = totL.keys.toSeq.sorted
    val pred = test.map { case (_, trueL, ws) =>
      val best = langs.map { l =>
        val prior = bitsMilli((nTrain * 1024) / ndL(l))
        val tok = ws.groupBy(identity).map { case (w, occ) =>
          occ.length * bitsMilli(((totL(l) + v) * 1024) / (cnt((l, w)) + 1))
        }.sum
        (prior + tok, l)
      }.min // (score, lang) — min is the argmin with lang-asc tie-break
      (trueL, best._2)
    }
    val conf = pred.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong }
    val nTrue = pred.groupBy(_._1).map { case (l, xs) => l -> xs.length.toLong }
    val expect = conf.map { case ((t, p), n) =>
      (t, p) -> (n, n * 1000 / nTrue(t), t == p) }
    val got = graft.text.TextAnalysis.nbLangClassify(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got == expect)
    // every test doc lands in exactly one cell
    assert(got.values.map(_._1).sum == test.length.toLong)
  }

  test("k19: every (layout, predicate) cell matches an in-process " +
      "partition-hit recompute, and key-aligned predicates prune") {
    val rows = Tables.sales(spark, sfDir)
      .select(col("sale_date"), col("store_id"), col("sku"),
        col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val layouts = Map[String, ((String, String, Long, String)) => String](
      "by_month" -> (r => r._1.substring(0, 7)),
      "by_store" -> (_._2),
      "by_returnflag" -> (_._4),
      "by_sku_bucket" -> (r => (r._3 % 16).toString))
    val preds = Map[String, ((String, String, Long, String)) => Boolean](
      "w1_date_range" -> (r => r._1 >= "1995-06-01" && r._1 <= "1995-08-31"),
      "w2_single_day" -> (_._1 == "1995-06-15"),
      "w3_store_point" -> (_._2 == "0042"),
      "w4_returns" -> (_._4 == "R"),
      "w5_sku_point" -> (_._3 == 100L))
    val expect = (for {
      (ln, lf) <- layouts.toSeq
      (pn, pf) <- preds.toSeq
    } yield {
      val parts = rows.groupBy(lf)
      val hit = parts.filter(_._2.exists(pf))
      val total = rows.length.toLong
      val scanned = hit.values.map(_.length.toLong).sum
      (ln, pn) -> (parts.size.toLong, hit.size.toLong, total, scanned,
        (total - scanned) * 1000 / total)
    }).toMap
    val got = graft.etl.Layout.layoutAdvisor(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got == expect)
    // a predicate that is a function of the partition key prunes to the
    // exact matching rows (the layout the advisor should recommend)
    val exactStore = rows.count(_._2 == "0042").toLong
    assert(got(("by_store", "w3_store_point"))._4 == exactStore)
    val exactFlag = rows.count(_._4 == "R").toLong
    assert(got(("by_returnflag", "w4_returns"))._4 == exactFlag)
    // and the advisor separates layouts: by_month prunes the date range
    // strictly better than by_store does
    assert(got(("by_month", "w1_date_range"))._5 >
      got(("by_store", "w1_date_range"))._5)
  }
}
