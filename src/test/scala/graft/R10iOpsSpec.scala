package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-9 keys: g5 link prediction
  * (wedge-scored non-edges vs a brute-force neighborhood recompute). */
class R10iOpsSpec extends GraftSpec {

  test("g5: scores match a brute-force neighborhood-overlap recompute") {
    val sales = Tables.sales(spark, sfDir)
      .select(col("l_orderkey").as("oid"), col("sku")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = sales.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // co-purchase pair supports, a < b
    val supp = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    byOrder.foreach { case (_, skus) =>
      val s = skus.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size)
        supp((s(i), s(j))) = supp.getOrElse((s(i), s(j)), 0L) + 1
    }
    val edges = supp.filter(_._2 >= 2).keys.toSet
    val nbrs = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    // wedge-budgeted ladder cap, mirrored from the engine
    val ladder = Seq(8L, 16L, 32L, 64L, 128L, 256L)
    val cap = ladder.foldLeft(ladder.head) { (acc, c) =>
      val w = deg.values.filter(_ <= c).map(d => d * (d - 1) / 2).sum
      if (w <= 20000000L) c else acc
    }
    // wedge generation under the budgeted apex-degree cap
    val cn = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    val ra = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    nbrs.foreach { case (z, ns) =>
      if (deg(z) <= cap) {
        val s = ns.toSeq.sorted
        for (i <- s.indices; j <- (i + 1) until s.size) {
          val k = (s(i), s(j))
          cn(k) = cn.getOrElse(k, 0L) + 1
          ra(k) = ra.getOrElse(k, 0L) + 1000000L / deg(z)
        }
      }
    }
    val expect = cn.keys.filterNot(edges.contains).toSeq.map { case (a, b) =>
      val (da, db) = (deg(a), deg(b))
      val c = cn((a, b))
      (a, b, c, da, db, c * 1000 / (da + db - c), ra((a, b)))
    }.sortBy { case (a, b, c, _, _, _, r) => (-r, -c, a, b) }.take(30)
    val got = graft.analytics.Graph.linkPrediction(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect)
    // every emitted pair is a genuine non-edge with overlap evidence
    assert(got.forall { case (a, b, c, _, _, _, _) =>
      !edges.contains((a, b)) && c >= 1 })
  }

  test("sk20: AMS estimate matches a BigInt recompute of the tug-of-war " +
      "counters and exact F2") {
    val P = BigInt(1000003L)
    val skus = Tables.sales(spark, sfDir).select(col("sku"))
      .collect().map(_.getLong(0))
    def sign(j: Int, k: Long): Long =
      if ((BigInt(k) * (37 + 101 * j) + (17 + 61 * j)).mod(P) % 2 == 0) 1L
      else -1L
    val z = (0 until 12).map(j => BigInt(skus.map(sign(j, _)).sum))
    val means = (0 until 4).map { g =>
      (g * 3 until g * 3 + 3).map(j => z(j) * z(j)).sum / 3
    }
    val est = means.sorted.apply(1) // lower median of 4
    val freqs = skus.groupBy(identity).view.mapValues(_.length.toLong)
    val f2 = freqs.values.map(f => BigInt(f) * f).sum
    val row = graft.analytics.Sketches.amsF2(spark, sfDir).collect().head
    assert(row.getLong(0) == freqs.size.toLong)
    assert(row.getLong(1) == skus.length.toLong)
    assert(BigInt(row.getLong(2)) == f2)
    assert(BigInt(row.getLong(3)) == est)
    val diff = est - f2
    val errExpect = (if (diff < 0) -1 else 1) * (diff.abs * 1000 / f2)
    assert(BigInt(row.getLong(4)) == errExpect)
  }

  test("a60: DiD cells, estimate, and pre-trend slopes match an " +
      "in-process recompute") {
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def day(s: String) = java.time.LocalDate.parse(s, fmt).toEpochDay
    val sd = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .select(col("store_id"), col("sale_date"),
        ((col("gross_dec") - col("disc_dec")) * 100)
          .cast("decimal(18,0)").cast("long").as("y_c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val maxd = day(sd.map(_._2).max)
    val w = 28L
    val base = sd.map { case (store, date, y) =>
      val gap = maxd - day(date)
      (store, gap, y, if (gap < w) 1 else 0,
        if (BigInt(store.toLong) * BigInt(2654435761L) % 1000000007 % 2 == 0) 1
        else 0)
    }.filter(_._2 < 2 * w)
    def mean(t: Int, p: Int): Long = {
      val cell = base.filter(r => r._5 == t && r._4 == p)
      (BigInt(cell.map(_._3).sum) * 1000 / cell.size).toLong
    }
    def slope(t: Int): Long = {
      val daily = base.filter(r => r._5 == t && r._4 == 0)
        .groupBy(2 * w - 1 - _._2).view
        .mapValues(rs => BigInt(rs.map(_._3).sum)).toSeq
      val n = BigInt(daily.size)
      val st = daily.map(d => BigInt(d._1)).sum
      val stt = daily.map(d => BigInt(d._1) * d._1).sum
      val sy = daily.map(_._2).sum
      val sty = daily.map(d => d._2 * d._1).sum
      val num = n * sty - st * sy
      val den = n * stt - st * st
      val s = if ((num < 0) != (den < 0)) -1 else 1
      (BigInt(s) * (num.abs * 1000 / den.abs)).toLong
    }
    val row = graft.analytics.Regression.didPromo(spark, sfDir)
      .collect().head
    assert(row.getLong(0) == mean(1, 0) && row.getLong(1) == mean(1, 1))
    assert(row.getLong(2) == mean(0, 0) && row.getLong(3) == mean(0, 1))
    assert(row.getLong(4) ==
      (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0)))
    assert(row.getLong(5) == slope(1) && row.getLong(6) == slope(0))
    assert(row.getLong(7) == slope(1) - slope(0))
  }

  test("k22: per-column drift diff matches an in-process recompute over " +
      "the two newest months") {
    val rows = Tables.sales(spark, sfDir)
      .select(substring(col("sale_date"), 1, 7).as("m"), col("quantity"),
        (col("line_total") * 100).cast("long").as("cents"), col("sku"),
        col("store_id").cast("long").as("store"),
        ascii(col("l_returnflag")).cast("long").as("rflag"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val months = rows.map(_._1).distinct.sorted
    val (ma, mb) = (months(months.size - 2), months.last)
    val cols: Seq[(String, ((String, Long, Long, Long, Long, Long)) => Long)] =
      Seq(("cents", _._3), ("quantity", _._2), ("returnflag", _._6),
        ("sku", _._4), ("store", _._5))
    val expect = cols.map { case (name, f) =>
      val a = rows.filter(_._1 == ma).map(f)
      val b = rows.filter(_._1 == mb).map(f)
      val (meanA, meanB) = ((BigInt(a.sum) * 1000 / a.size).toLong,
        (BigInt(b.sum) * 1000 / b.size).toLong)
      val (setA, setB) = (a.toSet, b.toSet)
      val shift = if (meanA == 0) None
        else Some((if (meanB < meanA) -1 else 1) *
          ((BigInt(meanB) - meanA).abs * 1000 / BigInt(meanA).abs).toLong)
      val newV = (setB -- setA).size.toLong
      (name, a.size.toLong, b.size.toLong, 0L, 0L,
        setA.size.toLong, setB.size.toLong,
        a.min, a.max, b.min, b.max, meanA, meanB, shift,
        if (b.min < a.min || b.max > a.max) 1L else 0L,
        if (newV > 0) 1L else 0L,
        if (shift.exists(s => s.abs > 100)) 1L else 0L,
        newV, (setA -- setB).size.toLong)
    }
    val got = graft.analytics.Profile.profileDrift(spark, sfDir)
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11),
          r.getLong(12),
          if (r.isNullAt(13)) None else Some(r.getLong(13)),
          r.getLong(14), r.getLong(15), r.getLong(16), r.getLong(17),
          r.getLong(18))
      }.toSeq
    assert(got == expect)
  }

  test("g6: hop histogram matches an in-process multi-source BFS") {
    val sales = Tables.sales(spark, sfDir)
      .select(col("l_orderkey").as("oid"), col("sku")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val supp = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    sales.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.size)
        supp((s(i), s(j))) = supp.getOrElse((s(i), s(j)), 0L) + 1
    }
    val edges = supp.filter(_._2 >= 2).keys.toSet
    val nbrs = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val nodes = nbrs.keySet.toSet
    val seeds = nodes.toSeq.sorted.take(8)
    val dist = scala.collection.mutable.HashMap.from(seeds.map(_ -> 0L))
    var frontier = seeds.toSet
    for (hop <- 1 to 8 if frontier.nonEmpty) {
      frontier = frontier.flatMap(nbrs.getOrElse(_, Set.empty[Long]))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = hop.toLong)
    }
    val hist = dist.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap +
      (-1L -> (nodes.size - dist.size).toLong)
    val expect = hist.toSeq.sortBy(_._1).map { case (h, n) =>
      (h, n, n * 1000 / nodes.size) }
    val got = graft.analytics.Graph.bfsHops(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // conservation: every node is in exactly one bucket
    assert(got.map(_._2).sum == nodes.size.toLong)
  }

  test("a61: bridge effects match an in-process recompute and the " +
      "waterfall identity holds with a floor-bounded residual") {
    val ms = Tables.sales(spark, sfDir)
      .select(substring(col("sale_date"), 1, 7).as("m"), col("sku"),
        (col("line_total") * 100).cast("decimal(18,0)").cast("long")
          .as("c"), col("quantity"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(rs => (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    val months = ms.keys.map(_._1).toSeq.distinct.sorted
    val (ma, mb) = (months(months.size - 2), months.last)
    def slice(m: String) = ms.collect { case ((`m`, sku), (c, q)) =>
      sku -> (c, q, c * 1000 / q) }.toMap
    val (sa, sb) = (slice(ma), slice(mb))
    val both = sa.keySet & sb.keySet
    val pe = both.toSeq.map(k => (sb(k)._3 - sa(k)._3) * sb(k)._2).sum
    val ve = both.toSeq.map(k => (sb(k)._2 - sa(k)._2) * sa(k)._3).sum
    val ne = (sb.keySet -- sa.keySet).toSeq.map(sb(_)._1 * 1000).sum
    val de = -(sa.keySet -- sb.keySet).toSeq.map(sa(_)._1 * 1000).sum
    val (ra, rb) = (sa.values.map(_._1).sum, sb.values.map(_._1).sum)
    val row = graft.analytics.Series.revenueBridge(spark, sfDir)
      .collect().head
    assert(row.getString(0) == ma && row.getString(1) == mb)
    assert(row.getLong(2) == ra && row.getLong(3) == rb)
    assert(row.getLong(4) == both.size.toLong)
    assert(row.getLong(5) == (sb.keySet -- sa.keySet).size.toLong)
    assert(row.getLong(6) == (sa.keySet -- sb.keySet).size.toLong)
    assert(row.getLong(8) == pe && row.getLong(9) == ve)
    assert(row.getLong(10) == ne && row.getLong(11) == de)
    // identity: delta = sum of effects + residual (exactly)
    assert(row.getLong(7) ==
      row.getLong(8) + row.getLong(9) + row.getLong(10) +
        row.getLong(11) + row.getLong(12))
    // the residual is pure price-floor rounding: bounded by 1 milli-cent
    // per quantity unit appearing in a floored term
    val bound = both.toSeq.map(k => 2 * sb(k)._2 + (sb(k)._2 - sa(k)._2).abs)
      .sum
    assert(row.getLong(12).abs <= bound)
  }

  test("er5: sweep matches an in-process cumulative recompute over the " +
      "scored-pairs silver; recall is monotone in the threshold") {
    val scored = graft.analytics.Linkage.scoredPairs(spark, sfDir, 2000L, 0L)
      .select(col("score_milli"), col("is_true"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nTruth = Tables.part(spark, sfDir).count()
    val grain = scored.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toSeq
      .sortBy(-_._1)
    var (cp, ct) = (0L, 0L)
    val expect = grain.map { case (tau, (np, nt)) =>
      cp += np; ct += nt
      val p = ct * 1000 / cp
      val r = ct * 1000 / nTruth
      (tau, cp, ct, p, r, if (p + r > 0) 2 * p * r / (p + r) else 0L)
    }.sortBy(_._1)
    val got = graft.analytics.Linkage.thresholdSweep(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // descending tau: n_link strictly grows, recall never decreases
    val desc = got.sortBy(-_._1)
    desc.sliding(2).foreach {
      case Seq(hi, lo) =>
        assert(lo._2 > hi._2); assert(lo._5 >= hi._5)
      case _ =>
    }
  }

  test("j33: drill-across panel counts and correlation match an " +
      "in-process recompute of both fact rollups") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM-dd"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val oDaily = orders.groupBy(r => (r._1, r._2)).view
      .mapValues(rs => (rs.map(_._3).sum, rs.size.toLong)).toMap
    val eDaily = events.groupBy(r => (r._1, r._2)).view
      .mapValues(_.size.toLong).toMap
    val keys = (oDaily.keySet ++ eDaily.keySet).groupBy(_._1)
    val expect = keys.toSeq.map { case (k, kd) =>
      val panel = kd.toSeq.map { cell =>
        val (yc, no) = oDaily.getOrElse(cell, (0L, 0L))
        (eDaily.getOrElse(cell, 0L), yc, no)
      }
      val n = panel.size.toLong
      val sx = panel.map(_._1).sum; val sy = panel.map(_._2).sum
      val sxx = panel.map(p => p._1 * p._1).sum
      val syy = panel.map(p => BigInt(p._2) * p._2).sum
      val sxy = panel.map(p => BigInt(p._1) * p._2).sum
      val nD = n.toDouble
      val varx = sxx.toDouble - sx.toDouble * sx.toDouble / nD
      val vary = syy.toDouble - sy.toDouble * sy.toDouble / nD
      val cov = sxy.toDouble - sx.toDouble * sy.toDouble / nD
      val corr = if (varx == 0.0 || vary == 0.0) None
        else Some(cov / math.sqrt(varx * vary))
      (k, n, panel.count(_._3 > 0).toLong, panel.count(_._1 > 0).toLong,
        panel.count(p => p._3 > 0 && p._1 > 0).toLong,
        panel.map(_._3).sum, sx, sy, corr)
    }.sortBy(_._1)
    val got = graft.analytics.Star.drillAcross(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toSeq
    assert(got == expect)
    // the panel genuinely drills across: some customers carry BOTH fact
    // tables' days (the fixtures' calendars are disjoint, so same-day
    // overlap — n_days_both — is structurally 0 here; the conformed-
    // dimension stitch is what the operator certifies)
    assert(got.exists(t => t._3 > 0 && t._4 > 0))
    assert(got.exists(_._9.isDefined))
  }

  test("g7: LPA partition, densities, and modularity match an " +
      "in-process synchronous propagation") {
    val sales = Tables.sales(spark, sfDir)
      .select(col("l_orderkey").as("oid"), col("sku")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val supp = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    sales.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.size)
        supp((s(i), s(j))) = supp.getOrElse((s(i), s(j)), 0L) + 1
    }
    val edges = supp.filter(_._2 >= 2).keys.toSeq
    val nbrs = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    var lbl = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lbl = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size.toLong).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val m = edges.size.toLong
    val byComm = lbl.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    val eC = byComm.map { case (c, vs) =>
      c -> edges.count { case (a, b) => vs(a) && vs(b) }.toLong }
    val dC = byComm.map { case (c, vs) =>
      c -> vs.toSeq.map(nbrs(_).size.toLong).sum }
    val num = byComm.keys.map(c =>
      BigInt(4) * m * eC(c) - BigInt(dC(c)) * dC(c)).sum
    val qMilli = ((if (num < 0) -1 else 1) *
      (num.abs * 1000 / (BigInt(4) * m * m))).toLong
    val nTotal = lbl.size.toLong
    val expect = byComm.toSeq.map { case (c, vs) =>
      val n = vs.size.toLong
      (c, n, eC(c),
        if (n > 1) Some(2 * eC(c) * 1000 / (n * (n - 1))) else None,
        n * 1000 / nTotal, qMilli)
    }.sortBy(t => (-t._2, t._1)).take(20)
    val got = graft.analytics.Graph.lpaCommunities(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // at sf0.001 the dense co-purchase graph collapses to ONE community
    // after 4 rounds (the equality above is the contract); the sf0.01
    // oracle gate exercises the multi-community readout (20 rows)
    assert(byComm.nonEmpty)
    assert(got.map(_._2).sum <= nTotal)
  }

  test("h4: IR metrics match an in-process recompute from the parent " +
      "rankings and the pseudo-qrels; nDCG is bounded by 1000") {
    val docs = graft.text.Corpus.docsTok(spark, sfDir)
      .select(col("doc_id"), col("words"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).distinct.toSet)
    val nDocs = docs.length
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val kept = docs.map { case (id, ws) =>
      id -> ws.filter(w => df(w) * 100L <= 78L * nDocs) }.toMap
    val rel = (for {
      q <- 0L until 3L
      (d, ws) <- kept if d != q
      g = (kept(q) & ws).size.toLong if g > 0
    } yield (q, d) -> g).toMap
    val disc = (1 to 5).map(i =>
      (1000.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    def evalSys(name: String, rows: Seq[(Long, Long, Long)]) =
      rows.groupBy(_._1).map { case (q, rs) =>
        val gs = rs.map(r => (r._3, rel.getOrElse((q, r._2), 0L)))
        val hits = gs.count(_._2 > 0).toLong
        val dcg = gs.map { case (rk, g) => g * disc(rk.toInt - 1) }.sum
        val mrr = gs.filter(_._2 > 0).map(_._1) match {
          case Seq() => 0L
          case rks => 1000L / rks.min
        }
        (name, q) -> (hits, dcg, mrr)
      }
    val bm = graft.text.TextAnalysis.bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val cos = graft.vector.Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(1).toLong))
    val rrf = graft.vector.Similarity.rrfFusion(spark, sfDir, 3, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val sys = evalSys("bm25", bm.toSeq) ++ evalSys("cosine", cos.toSeq) ++
      evalSys("rrf", rrf.toSeq)
    val idcg = (0L until 3L).map { q =>
      // NB: .toSeq BEFORE collect — Map.collect over pair results
      // rebuilds a Map and silently collapses duplicate gains
      val gains = rel.toSeq.collect { case ((`q`, d), g) => (g, d) }
        .sortBy { case (g, d) => (-g, d) }.take(5).map(_._1)
      q -> gains.zipWithIndex.map { case (g, i) => g * disc(i) }.sum
    }.toMap
    val got = graft.vector.Similarity.rankerEval(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6), r.getLong(7)))
    assert(got.length == 9)
    got.foreach { case (s, q, hits, dcg, idcgG, ndcg, mrr, pk) =>
      val (eh, ed, em) = sys((s, q))
      assert(hits == eh && dcg == ed && mrr == em, s"($s,$q)")
      assert(idcgG == idcg(q))
      assert(ndcg == (if (idcg(q) > 0) Some(dcg * 1000 / idcg(q)) else None))
      ndcg.foreach(v => assert(v >= 0 && v <= 1000))
      assert(pk == hits * 1000 / 5)
    }
  }

  test("a62: weighted quantiles match an in-process cumulative-weight " +
      "recompute per brand") {
    val brandOf = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = Tables.sales(spark, sfDir)
      .select(col("sku"),
        (col("line_total") * 100).cast("decimal(18,0)").cast("long"),
        col("quantity"), col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (brandOf(r.getLong(0)), r.getLong(1) * 1000 / r.getLong(2),
        r.getLong(2), r.getLong(3), r.getInt(4).toLong))
    val expect = lines.groupBy(_._1).toSeq.map { case (brand, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4, r._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L; var med = Option.empty[Long]; var p90 = Option.empty[Long]
      sorted.foreach { r =>
        cum += r._3
        if (med.isEmpty && cum * 2 >= tot) med = Some(r._2)
        if (p90.isEmpty && cum * 10 >= tot * 9) p90 = Some(r._2)
      }
      (brand, rs.length.toLong, tot, med.get, p90.get)
    }.sortBy(_._1)
    val got = graft.analytics.Series.weightedQuantiles(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // weighted p90 never precedes the weighted median
    assert(got.forall(t => t._5 >= t._4))
  }

  test("v37: ARI and purity match a BigInt recompute of both partitions " +
      "from the raw embeddings") {
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val cents = embs.take(8).map(_._2)
    val assigned = embs.map { case (id, e) =>
      val n2 = dot(e, e)
      val best = cents.zipWithIndex.map { case (c, ci) =>
        (dot(e, c) / math.sqrt(n2 * dot(c, c)), ci)
      }.maxBy { case (cos, ci) => (cos, -ci) }._2
      val bucket = (0 until 3).map(i =>
        if (e(i * 4) > 0f) 1L << i else 0L).sum
      (best.toLong, bucket)
    }
    val cont: Map[(Long, Long), Long] = assigned.groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    def c2(x: BigInt): BigInt = x * (x - 1) / 2
    val sij = cont.values.map(v => c2(BigInt(v))).sum
    val sa = cont.toSeq.groupBy(_._1._1).values
      .map(g => c2(BigInt(g.map(_._2).sum))).sum
    val sb = cont.toSeq.groupBy(_._1._2).values
      .map(g => c2(BigInt(g.map(_._2).sum))).sum
    val n = BigInt(assigned.length)
    val t = c2(n)
    val pureN = cont.toSeq.groupBy(_._1._2).values.map(_.map(_._2).max).sum
    val num = 2 * t * sij - 2 * sa * sb
    val den = t * (sa + sb) - 2 * sa * sb
    val ari = if (den == 0) None
      else Some(((if (num < 0) -1 else 1) * (num.abs * 1000 / den.abs)).toLong)
    val row = graft.vector.Similarity.partitionAri(spark, sfDir)
      .collect().head
    assert(row.getLong(0) == assigned.length.toLong)
    assert(row.getLong(1) == cont.keySet.map(_._1).size.toLong)
    assert(row.getLong(2) == cont.keySet.map(_._2).size.toLong)
    assert(row.getLong(3) == cont.size.toLong)
    assert(row.getLong(4) == (BigInt(pureN) * 1000 / n).toLong)
    assert((if (row.isNullAt(5)) None else Some(row.getLong(5))) == ari)
  }

  test("k23: masking PRF and k-anonymity audit match an in-process " +
      "recompute; masking preserves the name format") {
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_name"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    def mask(name: String): String = {
      val num = name.substring(9)
      val v = num.toLong
      val h = v * 2654435761L % 1000000007L
      "Customer#" + (0 until 9).map { i =>
        val d = num.charAt(i) - '0'
        val o = h / math.pow(10, i).toLong % 10
        ('0' + ((d + o) % 10)).toChar
      }.mkString
    }
    val masked = rows.map(r => (r._4.substring(9), mask(r._4)))
    val byNum = masked.groupBy(_._1).view.mapValues(_.head._2).toMap
    val distinctAfter = byNum.values.toSet.size.toLong
    assert(byNum.values.forall(_.matches("^Customer#[0-9]{9}$")))
    // banding is FLOOR division (uniform $500 bands incl. negatives)
    val groups = rows.groupBy(r => (r._2, r._3, Math.floorDiv(r._5, 50000L))).view
      .mapValues(_.length.toLong).values.toSeq
    val row = graft.etl.Masking.anonymizeAudit(spark, sfDir).collect().head
    assert(row.getLong(0) == rows.length.toLong)
    assert(row.getLong(1) == byNum.size.toLong)
    assert(row.getLong(2) == distinctAfter)
    assert(row.getLong(3) == byNum.size - distinctAfter)
    assert(row.getLong(4) == 0L)
    assert(row.getLong(5) == groups.size.toLong)
    assert(row.getLong(6) == groups.min)
    assert(row.getLong(7) == groups.count(_ < 5).toLong)
    assert(row.getLong(8) == groups.filter(_ < 5).sum)
    assert(row.getLong(9) == groups.filter(_ < 5).sum * 1000 / rows.length)
  }
}
