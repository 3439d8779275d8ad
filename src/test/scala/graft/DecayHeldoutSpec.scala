package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsBatch
import graft.text.{TextAnalysis, Corpus, CorpusPrep}

/** Invariants for e26 time-decay attribution and t29 held-out LM
  * surprisal. Value-level parity vs DuckDB is the driver's gate. */
class DecayHeldoutSpec extends GraftSpec {

  test("e26: shares normalize to 1 per purchase and weights follow the decay law") {
    val out = EventsBatch.decayAttribution(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val gap = r.getAs[Long]("gap_us")
      val bucket = gap / 600000000L
      val want = if (bucket == 0) 1000L else if (bucket == 1) 500L
                 else if (bucket == 2) 250L else 125L
      assert(r.getAs[Long]("weight_milli") == want)
    }
    val byPurchase = out.groupBy(_.getAs[Long]("purchase_id"))
    byPurchase.foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-9)
      assert(rows.forall(_.getAs[Long]("n_touches") == rows.length))
    }
  }

  test("e26: pair set is exactly e9's interval relation") {
    val e26 = EventsBatch.decayAttribution(spark, sfDir)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e9 = EventsBatch.intervalJoin(spark, sfDir)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e26 == e9)
  }

  test("t30: profile agrees with a direct df census and the cap rule") {
    val out = TextAnalysis.stopwordProfile(spark, sfDir).collect()
    assert(out.length == 20)
    val docs = Corpus.docsTok(spark, sfDir)
      .select(col("doc_id"), col("words")).collect()
    val nDocs = docs.length.toLong
    val df = docs.flatMap(r => r.getSeq[String](1).distinct)
      .groupBy(x => x).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val w = r.getString(0)
      assert(r.getAs[Long]("df") == df(w))
      assert(r.getAs[Long]("df_milli") == df(w) * 1000 / nDocs)
      assert(r.getAs[Boolean]("is_capped") == (df(w) * 100 > 78 * nDocs))
    }
    // the 20 rows are exactly the df-top-20 (ties by word)
    val want = df.toSeq.sortBy { case (w, d) => (-d, w) }.take(20).map(_._1)
    assert(out.map(_.getString(0)).toSeq == want)
  }

  test("e31: counts, rates and z match an in-process recomputation") {
    val ev = graft.model.Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toLocalDate))
    val lo = ev.map(_._2).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val hi = ev.map(_._2).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val span = java.time.temporal.ChronoUnit.DAYS.between(lo, hi)
    val daysA = span / 2 + 1
    val daysB = span + 1 - daysA
    val out = graft.streaming.EventsBatch.rateDrift(spark, sfDir).collect()
    out.foreach { r =>
      val t = r.getString(0)
      val cA = ev.count { case (et, d) =>
        et == t && java.time.temporal.ChronoUnit.DAYS.between(lo, d) * 2 <= span }.toLong
      val cB = ev.count(_._1 == t).toLong - cA
      assert(r.getAs[Long]("c_a") == cA && r.getAs[Long]("c_b") == cB, t)
      assert(r.getAs[Long]("days_a") == daysA && r.getAs[Long]("days_b") == daysB)
      val ra = cA.toDouble / daysA.toDouble
      val rb = cB.toDouble / daysB.toDouble
      assert(r.getAs[Double]("rate_a") == ra && r.getAs[Double]("rate_b") == rb)
      if (cA + cB > 0) {
        val z = (rb - ra) / math.sqrt(ra / daysA.toDouble + rb / daysB.toDouble)
        assert(r.getAs[Double]("z_score") == z)
      }
    }
  }

  test("t29: splits partition the corpus (docs and tokens conserve)") {
    val out = TextAnalysis.heldoutSurprisal(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    val nToks = out.map(_.getAs[Long]("n_tokens")).sum
    val corpus = Corpus.docsTok(spark, sfDir)
      .agg(count(lit(1)), sum(size(col("words")).cast("long"))).head
    assert(nDocs == corpus.getLong(0))
    assert(nToks == corpus.getLong(1))
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_fit") == (r.getAs[String]("split") == "train"))
    }
  }

  test("t29: scoring the fit split reproduces a direct in-split t13-style score") {
    // fit and score recomputed in-process over the train docs only:
    // the train row of t29 must match it bit-for-bit
    val toks = Corpus.docsTok(spark, sfDir)
      .filter(CorpusPrep.splitOf(col("doc_id")) === "train")
      .select(explode(col("words")).as("word")).collect()
      .map(_.getString(0))
    val total = toks.length.toLong
    val oov = 63L - java.lang.Long.numberOfLeadingZeros(total)
    val kept = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(TextAnalysis.lmVocabCap)
      .map { case (w, c) =>
        w -> (63L - java.lang.Long.numberOfLeadingZeros(total / c)) }
      .toMap
    val sumBits = toks.map(w => kept.getOrElse(w, oov)).sum
    val train = TextAnalysis.heldoutSurprisal(spark, sfDir)
      .filter(col("split") === "train").head
    assert(train.getAs[Long]("n_tokens") == total)
    assert(train.getAs[Long]("sum_bits") == sumBits)
  }
}
