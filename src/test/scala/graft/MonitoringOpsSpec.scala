package graft

import graft.analytics.{Kpis, Profile, Sketches, Trends}
import graft.vector.Similarity
import graft.streaming.EventsBatch
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-7 monitoring/calibration operators: CUSUM changepoints (e23),
  * KS drift (e24), Gini concentration (a36), EWMA control (a37), cohort
  * triangle (a38), PMI collocations (t27), KMV sweep (sk13), sample
  * calibration (k10). Each is checked against an independent in-process
  * recomputation of the math (not the SQL) on sf0.001. */
class MonitoringOpsSpec extends GraftSpec {

  test("e23: closed-form CUSUM equals the sequential recursion; alarms " +
    "agree with the relative threshold") {
    val rows = EventsBatch.cusumChangepoint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val series = rs.sortBy(_.getAs[String]("d"))
      val muMilli = series.head.getAs[Long]("mu_milli")
      // every row in a type carries the same fitted mean
      assert(series.forall(_.getAs[Long]("mu_milli") == muMilli))
      var sPos = 0L
      var sNeg = 0L
      series.foreach { r =>
        val x = r.getAs[Long]("n_events") * 1000L - muMilli
        sPos = math.max(0L, sPos + x)
        sNeg = math.max(0L, sNeg - x)
        assert(r.getAs[Long]("cusum_pos_milli") === sPos)
        assert(r.getAs[Long]("cusum_neg_milli") === sNeg)
        assert(r.getAs[Boolean]("is_alarm") ===
          (math.max(sPos, sNeg) > muMilli * 2L))
      }
    }
  }

  test("e24: KS stat matches an exact in-process two-sample computation") {
    val got = EventsBatch.ksDrift(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("ks_milli"), r.getAs[Long]("v_at_max"),
          r.getAs[Long]("n_first_half"), r.getAs[Long]("n_second_half")))
      .toMap
    assert(got.nonEmpty)
    val ev = graft.model.Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        expr("cast(cast(value AS decimal(18,2)) * 100 AS bigint)").as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("d").toString, r.getAs[Long]("v")))
    val days = ev.map(_._2).distinct.sorted
    val (lo, hi) = (days.head, days.last)
    def dayIdx(d: String) = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(lo), java.time.LocalDate.parse(d))
    val span = dayIdx(hi)
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val a = rows.filter(r => dayIdx(r._2) * 2 <= span).map(_._3).sorted
      val b = rows.filter(r => dayIdx(r._2) * 2 > span).map(_._3).sorted
      val vs = (a ++ b).distinct.sorted
      val diffs = vs.map { v =>
        val ca = a.count(_ <= v) * 1000L / a.length
        val cb = b.count(_ <= v) * 1000L / b.length
        (math.abs(ca - cb), v)
      }
      val ks = diffs.map(_._1).max
      val vAt = diffs.filter(_._1 == ks).map(_._2).min
      val (gKs, gV, gNa, gNb) = got(tpe)
      assert(gKs === ks, s"type $tpe")
      assert(gV === vAt, s"type $tpe")
      assert(gNa === a.length.toLong && gNb === b.length.toLong)
    }
  }

  test("a36: gini matches the rank closed form recomputed per day; " +
    "bounded [0, 1000)") {
    val rows = Trends.giniConcentration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_milli")
      assert(g >= 0L && g < 1000L)
    }
    // spot-recompute the busiest day from the store rollup silver
    val byDay = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .groupBy(col("sale_date"), col("store_id"))
      .agg(((sum(col("gross_dec")) - sum(col("disc_dec"))) * 100)
        .cast("long").as("net_c"))
      .collect()
      .map(r => (r.getAs[String]("sale_date"), r.getAs[String]("store_id"),
        r.getAs[Long]("net_c")))
    val day = byDay.groupBy(_._1).maxBy(_._2.size)._1
    val xs = byDay.filter(_._1 == day).sortBy(r => (r._3, r._2)).map(_._3)
    val n = xs.length.toLong
    val tot = xs.sum
    val rw = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expected = (2 * rw - (n + 1) * tot) * 1000 / (n * tot)
    val gotDay = rows.find(_.getAs[String]("sale_date") == day).get
    assert(gotDay.getAs[Long]("gini_milli") === expected)
    assert(gotDay.getAs[Long]("n_stores") === n)
  }

  test("a37: EWMA recomputes from the 8 prior days with geometric " +
    "integer weights; early days unflagged-null") {
    val rows = Trends.ewmaControl(spark, sfDir).collect()
      .sortBy(_.getAs[String]("sale_date"))
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.isNullAt(first.fieldIndex("ewma_c")))
    assert(!first.getAs[Boolean]("is_flagged"))
    val net = rows.map(_.getAs[Long]("net_c"))
    val weights = (1 to 8).map(i =>
      math.pow(3, i - 1).toLong * math.pow(4, 8 - i).toLong)
    rows.zipWithIndex.drop(1).foreach { case (r, t) =>
      val lags = (1 to 8).flatMap(i =>
        if (t - i >= 0) Some((net(t - i), weights(i - 1))) else None)
      val expected = lags.map { case (x, w) => x * w }.sum / lags.map(_._2).sum
      assert(r.getAs[Long]("ewma_c") === expected,
        s"day ${r.getAs[String]("sale_date")}")
      val dev = (net(t) - expected) * 1000 / expected
      assert(r.getAs[Long]("dev_milli") === dev)
      assert(r.getAs[Boolean]("is_flagged") === (math.abs(dev) > 300))
    }
  }

  test("a38: triangle conserves orders and revenue; month-0 row has the " +
    "full cohort active") {
    val tri = Kpis.cohortTriangle(spark, sfDir).collect()
    assert(tri.nonEmpty)
    val orders = graft.model.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"),
        (col("o_totalprice").cast(graft.model.Tables.Money) * 100)
          .cast("long").as("cents"))
      .collect()
    assert(tri.map(_.getAs[Long]("n_orders")).sum === orders.length.toLong)
    assert(tri.map(_.getAs[Long]("revenue_cents")).sum ===
      orders.map(_.getAs[Long]("cents")).sum)
    assert(tri.forall(_.getAs[Long]("months_since") >= 0L))
    // every customer is active in their own acquisition month
    val cohortSizes = orders
      .map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[java.time.LocalDateTime]("o_orderdate")))
      .groupBy(_._1)
      .map { case (_, os) =>
        val first = os.map(_._2).minBy(d => (d.getYear, d.getMonthValue))
        f"${first.getYear}%04d-${first.getMonthValue}%02d"
      }
      .groupBy(identity).map { case (m, cs) => m -> cs.size.toLong }
    tri.filter(_.getAs[Long]("months_since") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_customers") ===
        cohortSizes(r.getAs[String]("cohort_month")))
    }
  }

  test("t27: PMI bits recompute from the pair/unigram counts; ranks are " +
    "dense within topN") {
    val rows = TextAnalysis.pmiCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks === (1L to ranks.length).toArray.toSeq)
      assert(ranks.length <= 20)
    }
    val langTotals = rows.groupBy(_.getAs[String]("lang"))
    // recompute pmi_bits for every returned row from its own counts and
    // the lang's bigram total (taken from an independent aggregation)
    val totals = graft.text.Corpus.docsTok(spark, sfDir)
      .filter(size(col("words")) >= 2)
      .groupBy(col("lang"))
      .agg(sum((size(col("words")) - lit(1)).cast("long")).as("n"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    def log2floor(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    rows.foreach { r =>
      val num = r.getAs[Long]("c_ab") * totals(r.getAs[String]("lang"))
      val den = r.getAs[Long]("c_first") * r.getAs[Long]("c_second")
      val expected =
        if (num >= den) log2floor(num / den) else -log2floor(den / num)
      assert(r.getAs[Long]("pmi_bits") === expected)
      assert(r.getAs[Long]("c_ab") >= 5L)
    }
  }

  test("sk13: KMV is exact below k, within loose theory bounds above it") {
    val rows = Sketches.kmvSweep(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, exact, est, err) = (r.getAs[Long]("k"),
        r.getAs[Long]("exact_skus"), r.getAs[Long]("kmv_est"),
        r.getAs[Long]("err_milli"))
      assert(err === math.abs(est - exact) * 1000 / exact)
      if (exact <= k) {
        assert(est === exact)
        assert(err === 0L)
      }
    }
    // the k=256 tier should be visibly tighter than k=16 in aggregate
    val byK = rows.groupBy(_.getAs[Long]("k"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("err_milli")).sum }
    if (byK.contains(16L) && byK.contains(256L) &&
      rows.exists(r => r.getAs[Long]("exact_skus") > 256L))
      assert(byK(256L) <= byK(16L))
  }

  test("k10: estimates scale the sample by the exact inverse ratio; " +
    "overall sampled fraction is near 1/20") {
    val rows = Profile.sampleCalibration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val P = 1000003L
    val T = P / 20L
    val sales = graft.model.Tables.sales(spark, sfDir)
      .select(col("store_id"), col("l_orderkey"),
        (col("line_total") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[String]("store_id"), r.getAs[Long]("l_orderkey"),
        r.getAs[Long]("cents")))
    val sampled = sales.filter(r => (r._2 * 48271L + 11L) % P < T)
    val frac = sampled.length.toDouble / sales.length
    assert(frac > 0.02 && frac < 0.10, s"sample fraction $frac")
    rows.foreach { r =>
      val sid = r.getAs[String]("store_id")
      val s = sampled.filter(_._1 == sid)
      assert(r.getAs[Long]("est_rows") === s.length.toLong * P / T)
      assert(r.getAs[Long]("est_cents") === s.map(_._3).sum * P / T)
    }
  }

  test("t28: KN continuation stats recompute from a brute-force bigram pass") {
    val rows = TextAnalysis.kneserNey(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.text.Corpus.docsTok(spark, sfDir)
      .select(col("words")).collect().map(_.getSeq[String](0))
    val bigrams = docs.filter(_.length >= 2)
      .flatMap(ws => ws.sliding(2).map(p => (p(0), p(1))))
    val types = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val nTypes = types.size.toLong
    val n1 = types.values.count(_ == 1).toLong
    val n2 = types.values.count(_ == 2).toLong
    val leftT = types.keys.groupBy(_._2).map { case (w, ps) => w -> ps.size.toLong }
    val rightT = types.keys.groupBy(_._1).map { case (w, ps) => w -> ps.size.toLong }
    val uni = docs.flatten.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    assert(rows.length === uni.size)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(r.getAs[Long]("c_uni") === uni(w))
      assert(r.getAs[Long]("left_types") === leftT.getOrElse(w, 0L))
      assert(r.getAs[Long]("right_types") === rightT.getOrElse(w, 0L))
      assert(r.getAs[Long]("n_bigram_types") === nTypes)
      assert(r.getAs[Long]("p_cont_milli") ===
        leftT.getOrElse(w, 0L) * 1000 / nTypes)
      assert(r.getAs[Long]("discount_micro") === n1 * 1000000 / (n1 + 2 * n2))
    }
    // the KN insight is observable: continuation mass sums to ~1
    assert(rows.map(_.getAs[Long]("left_types")).sum === nTypes)
  }

  test("e25: path census matches an in-process sessionized trigram count") {
    val rows = EventsBatch.pathMining(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.model.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      // 30-min-gap sessions on second-floored timestamps (e4's rule)
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Option.empty[Long]
      sorted.foreach { e =>
        if (prev.exists(p => e._2 / 1000000 - p / 1000000 > 1800))
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += e._4
        prev = Some(e._2)
      }
      sessions.flatMap(_.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2))))
    }
    val counts = tris.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = counts.values.sum
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    rows.sortBy(_.getAs[Long]("rank")).zip(expected).foreach {
      case (r, ((a, b, c), n)) =>
        assert((r.getAs[String]("t1"), r.getAs[String]("t2"),
          r.getAs[String]("t3")) === ((a, b, c)))
        assert(r.getAs[Long]("n_paths") === n)
        assert(r.getAs[Long]("share_milli") === n * 1000 / total)
    }
  }

  test("sk14: KMV set algebra is internally consistent and exact when " +
    "unsaturated") {
    val r = Sketches.kmvSetAlgebra(spark, sfDir).collect().head
    val k = r.getAs[Long]("k")
    def g(n: String) = r.getAs[Long](n)
    // estimates land within a loose 3-sigma KMV band (rsd ~ 1/sqrt(k-2))
    val band = 3.0 / math.sqrt(k - 2.0)
    Seq(("exact_weekday", "est_weekday"), ("exact_weekend", "est_weekend"),
      ("exact_union", "est_union")).foreach { case (ex, es) =>
      if (g(ex) <= k) assert(g(es) === g(ex), s"$es exact regime")
      else assert(math.abs(g(es) - g(ex)).toDouble / g(ex) <= band, s"$es")
    }
    // inclusion-exclusion sanity on the exact side
    assert(g("exact_weekday") + g("exact_weekend") - g("exact_overlap") ===
      g("exact_union"))
    assert(g("est_overlap") >= 0L && g("exact_overlap") >= 0L)
  }

  test("v29: centroid geometry matches a brute-force quantized recompute") {
    val rows = Similarity.centroidGeometry(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val e = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Int]("label"), r.getSeq[Float](1).toArray))
    val dims = e.head._2.length
    val mins = (0 until dims).map(d => e.map(_._2(d).toDouble).min)
    val maxs = (0 until dims).map(d => e.map(_._2(d).toDouble).max)
    def q(x: Double, d: Int): Long =
      if (maxs(d) == mins(d)) 0L
      else math.min(255L, math.floor((x - mins(d)) * 255.0 / (maxs(d) - mins(d))).toLong)
    val byLabel = e.groupBy(_._1).map { case (l, vs) =>
      l -> ((0 until dims).map(d => vs.map(v => q(v._2(d), d)).sum).toArray,
        vs.length.toLong)
    }
    rows.foreach { r =>
      val (sa, na) = byLabel(r.getAs[Int]("label_a"))
      val (sb, nb) = byLabel(r.getAs[Int]("label_b"))
      assert(r.getAs[Long]("n_a") === na && r.getAs[Long]("n_b") === nb)
      val l2 = (0 until dims).map { d =>
        val num = sa(d) * nb - sb(d) * na; num * num }.sum
      assert(r.getAs[Long]("l2_num") === l2)
      assert(r.getAs[Double]("centroid_dist2") ===
        l2.toDouble / ((na * nb) * (na * nb)).toDouble)
    }
    // every unordered label pair appears exactly once
    val labels = byLabel.keys.toSeq
    assert(rows.length === labels.size * (labels.size - 1) / 2)
  }

  test("x11: drift cards join the three detectors without loss and the " +
    "verdict rubric is first-match") {
    val cards = graft.export.Flatten.exportDriftCards(spark, sfDir).collect()
    val types = EventsBatch.driftMonitor(spark, sfDir)
      .select("event_type").collect().map(_.getString(0)).sorted
    assert(cards.map(_.getAs[String]("event_type")).sorted === types)
    cards.foreach { r =>
      val expected =
        if (r.getAs[Boolean]("tv_drifted") || r.getAs[Boolean]("ks_drifted"))
          "drifted"
        else if (r.getAs[Long]("n_alarm_days") > 0) "level_shift"
        else "stable"
      assert(r.getAs[String]("verdict") === expected)
    }
  }
}
