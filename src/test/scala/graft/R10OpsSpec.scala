package graft

import graft.model.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-10 keys (sk16, e33, e34, k13,
  * p21, v34) — each oracle-checked for values at sf0.01 by the driver;
  * these specs pin the PROPERTIES the oracle can't see: union =
  * rebuild (sk16), interval partition laws (e33), diff-vs-snapshot
  * consistency (e34), merge = recompute (k13), selection semantics
  * (p21), and convergence to the true eigenvector (v34). */
class R10OpsSpec extends GraftSpec {

  test("sk16: company quantiles off the MERGED per-store cells honor " +
    "the bin-width guarantee vs an exact company recompute") {
    val bins = 64
    val cents = graft.etl.StoreDaily.rollupDec(spark, sfDir)
      .select(((col("gross_dec") - col("disc_dec")) * 100).cast("long").as("c"))
      .collect().map(_.getAs[Long]("c")).sorted
    val n = cents.length
    val width = (cents.last - cents.head + 1) / bins + 1
    val r = graft.analytics.Sketches.mergedQuantiles(spark, sfDir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_rows") === n.toLong)
    for ((colName, rank) <- Seq(
        "p50_est_cents" -> ((n + 1) / 2),
        "p90_est_cents" -> ((9 * n + 9) / 10),
        "p99_est_cents" -> ((99 * n + 99) / 100))) {
      val exact = cents(rank - 1)
      val est = r.head.getAs[Long](colName)
      assert(est <= exact && exact - est <= width,
        s"$colName: est $est vs exact $exact (width $width)")
    }
  }

  test("e33: SCD2 intervals partition each user's timeline exactly") {
    val iv = graft.streaming.EventsBatch.scd2Intervals(spark, sfDir).cache()
    try {
      // exactly one open version per user, and it is the last version
      val open = iv.filter(col("is_current"))
      assert(open.count() === iv.select("user_id").distinct().count())
      val lastV = iv.groupBy("user_id").agg(max("version").as("maxv"))
      assert(open.join(lastV, "user_id")
        .filter(col("version") =!= col("maxv")).count() === 0)
      // versions are consecutive 1..max (count == max per user)
      assert(iv.groupBy("user_id")
        .agg(count(lit(1)).as("n"), max("version").as("maxv"))
        .filter(col("n") =!= col("maxv")).count() === 0)
      // event conservation: interval n_events sum == user's event count
      val fromEvents = Tables.events(spark, sfDir)
        .groupBy("user_id").agg(count(lit(1)).as("n_raw"))
      assert(iv.groupBy("user_id").agg(sum("n_events").as("n_iv"))
        .join(fromEvents, "user_id")
        .filter(col("n_iv") =!= col("n_raw")).count() === 0)
      // contiguity: valid_to equals the NEXT version's valid_from
      val nxt = iv.select(col("user_id"), (col("version") - 1).as("version"),
        col("valid_from_us").as("next_from"))
      assert(iv.join(nxt, Seq("user_id", "version"))
        .filter(col("valid_to_us") =!= col("next_from")).count() === 0)
      // adjacent versions never share a state (else they'd be one run)
      val prev = iv.select(col("user_id"), (col("version") + 1).as("version"),
        col("state").as("prev_state"))
      assert(iv.join(prev, Seq("user_id", "version"))
        .filter(col("state") === col("prev_state")).count() === 0)
    } finally iv.unpersist()
  }

  test("e34: one-scan CDC diff matches two independent ranked snapshots") {
    val t1 = "2024-01-15"; val t2 = "2024-01-25"
    def snapshot(cut: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, sfDir)
        .filter(col("ts") < lit(cut).cast("timestamp"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
    }
    val a = snapshot(t1).withColumnRenamed("event_id", "aid")
      .withColumnRenamed("event_type", "astate")
    val b = snapshot(t2).withColumnRenamed("event_id", "bid")
      .withColumnRenamed("event_type", "bstate")
    val expect = b.join(a, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("aid").isNull, "insert")
          .when(col("aid") === col("bid"), "noop")
          .when(col("astate") === col("bstate"), "touch")
          .otherwise("update").as("expect"))
    val got = graft.streaming.EventsBatch.stateCdc(spark, sfDir, t1, t2)
    assert(got.count() === expect.count())
    assert(got.join(expect, "user_id")
      .filter(col("change") =!= col("expect")).count() === 0)
    // classes are drawn from the closed vocabulary and the diff is nonempty
    assert(got.count() > 0)
    assert(got.filter(!col("change")
      .isin("insert", "noop", "touch", "update")).count() === 0)
  }

  test("k13: algebraic-partial merge is row-identical to a from-scratch " +
    "rollup, and `restated` flags exactly the touched grain keys") {
    val mod = 10; val res = 7
    val got = graft.etl.Restatement.lateRestatement(spark, sfDir, mod, res).cache()
    try {
      val sales = Tables.sales(spark, sfDir)
      val full = sales.groupBy("store_id", "sale_date")
        .agg(sum("line_total").cast("double").as("e_gross"),
          sum("discount_amount").cast("double").as("e_disc"),
          count(lit(1)).as("e_txn"), sum("quantity").as("e_items"))
      assert(got.count() === full.count())
      assert(got.join(full, Seq("store_id", "sale_date"))
        .filter(col("gross") =!= col("e_gross") || col("disc") =!= col("e_disc")
          || col("txn") =!= col("e_txn") || col("items") =!= col("e_items"))
        .count() === 0, "merged partials must equal the recompute bit-for-bit")
      val touched = sales.filter(pmod(col("l_orderkey"), lit(mod)) === res)
        .select("store_id", "sale_date").distinct()
      assert(got.filter(col("restated")).count() === touched.count())
      assert(got.filter(col("restated")).join(touched,
        Seq("store_id", "sale_date"), "left_anti").count() === 0)
    } finally got.unpersist()
  }

  test("k14: merged KMV partials equal the from-scratch sketch per grain, " +
    "and small grains are exact counts") {
    val k = 64; val P = 1000003L
    val scratch = Tables.sales(spark, sfDir)
      .select("store_id", "sale_date", "sku").collect()
      .map(r => ((r.getAs[String]("store_id"), r.getAs[String]("sale_date")),
        (r.getAs[Long]("sku") * 131L + 911L) % P))
      .groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(_._2).distinct.sorted.take(k) }
    val got = graft.etl.Restatement.kmvRestatement(spark, sfDir).collect()
    assert(got.length === scratch.size)
    got.foreach { r =>
      val g = (r.getAs[String]("store_id"), r.getAs[String]("sale_date"))
      val mins = scratch(g)
      assert(r.getAs[Long]("sk_size") === mins.length.toLong)
      val expEst = if (mins.length < k) mins.length.toLong
        else (k - 1).toLong * P / mins(k - 1)
      assert(r.getAs[Long]("kmv_est") === expEst, s"grain $g")
      // the exact regime: below k distinct hashes the sketch IS the count
      if (mins.length < k) assert(r.getAs[Long]("kmv_est") === mins.length.toLong)
    }
  }

  test("p21: DSIR keeps the exact quota, ranks by weight, and " +
    "over-represents the target domain") {
    val sel = graft.text.CorpusPrep.dsirSelect(spark, sfDir).cache()
    try {
      val nDocs = Tables.documents(spark, sfDir).count()
      assert(sel.count() === nDocs * 25 / 100)
      // rank order IS weight order (desc, doc_id asc tie-break)
      val rows = sel.orderBy("rank").collect()
      rows.sliding(2).foreach { case Array(x, y) =>
        val wx = x.getAs[Long]("dsir_milli_bits")
        val wy = y.getAs[Long]("dsir_milli_bits")
        assert(wx > wy || (wx == wy &&
          x.getAs[Long]("doc_id") < y.getAs[Long]("doc_id")))
      }
      // the whole point: target-lang share among selected > corpus share
      val corpusShare = Tables.documents(spark, sfDir)
        .filter(col("lang") === "en").count().toDouble / nDocs
      val selShare = sel.filter(col("lang") === "en").count().toDouble / rows.length
      assert(selShare > corpusShare,
        s"selected en-share $selShare must exceed corpus $corpusShare")
    } finally sel.unpersist()
  }

  test("e35: CUPED readout matches a driver-side recompute of θ and the " +
    "adjusted means, and the per-arm variance identity holds") {
    val cutoffUs = java.time.LocalDate.parse("2024-01-10")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us") < cutoffUs,
        math.floor(r.getAs[Double]("value") * 1000.0).toLong))
      .groupBy(_._1).map { case (uid, rows) =>
        val arm = if ((uid % 1000000007L) * 2654435761L % 1000L < 500L) "A" else "B"
        (uid, arm,
          rows.filter(_._2).map(_._3).sum / 1000.0,   // x: pre
          rows.filterNot(_._2).map(_._3).sum / 1000.0) // y: post
      }.toSeq
    val n = byUser.size.toDouble
    val mx = byUser.map(_._3).sum / n
    val my = byUser.map(_._4).sum / n
    val varx = byUser.map(u => (u._3 - mx) * (u._3 - mx)).sum / n
    val cov = byUser.map(u => (u._3 - mx) * (u._4 - my)).sum / n
    val theta = cov / varx
    val got = graft.streaming.EventsBatch.cupedReadout(spark, sfDir)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(got.keySet === Set("A", "B"))
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-6 * math.abs(theta))
      val arm = r.getAs[String]("arm")
      val us = byUser.filter(_._2 == arm)
      val an = us.size.toDouble
      assert(r.getAs[Long]("n_users") === us.size.toLong)
      val amy = us.map(_._4).sum / an
      val amx = us.map(_._3).sum / an
      val expAdj = amy - theta * (amx - mx)
      assert(math.abs(r.getAs[Double]("mean_y_cuped") - expAdj) < 1e-6,
        s"arm $arm adjusted mean")
      // identity: var_y_cuped = var_y − 2θcov_a + θ²varx_a on the arm
      val avary = us.map(u => (u._4 - amy) * (u._4 - amy)).sum / an
      val avarx = us.map(u => (u._3 - amx) * (u._3 - amx)).sum / an
      val acov = us.map(u => (u._3 - amx) * (u._4 - amy)).sum / an
      val expVar = avary - 2 * theta * acov + theta * theta * avarx
      assert(math.abs(r.getAs[Double]("var_y_cuped") - expVar) <
        1e-6 * math.max(1.0, math.abs(expVar)), s"arm $arm adjusted variance")
    }
  }

  test("t30: Gopher repeated-n-gram char fractions match an in-process " +
    "string recompute, longest-gram tie-break included") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = graft.text.TextAnalysis.gopherRepetition(spark, sfDir).collect()
    assert(got.length === docs.size)
    got.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val nChars = text.length.toLong
      def topMilli(n: Int): Option[Long] =
        if (ws.length < n) None else {
          val counts = ws.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).toSeq
            .map { case (g, o) => (o.size.toLong, g.length.toLong) }
          val (cnt, len) = counts.max // (cnt, len) lexicographic = the engine's packed max
          Some(cnt * len * 1000L / nChars)
        }
      def dupMilli(n: Int): Option[Long] =
        if (ws.length < n) None else {
          val counts = ws.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(o => (o.size.toLong, o.head.length.toLong))
          Some(counts.filter(_._1 >= 2).map(p => p._1 * p._2).sum * 1000L / nChars)
        }
      assert(Option(r.getAs[Long]("top2_milli")) === topMilli(2))
      assert(Option(r.getAs[Long]("top3_milli")) === topMilli(3))
      assert(Option(r.getAs[Long]("top4_milli")) === topMilli(4))
      assert(Option(r.getAs[Long]("dup5_milli")) === dupMilli(5))
      val keep = topMilli(2).getOrElse(0L) < 200 && topMilli(3).getOrElse(0L) < 180 &&
        topMilli(4).getOrElse(0L) < 160 && dupMilli(5).getOrElse(0L) < 150
      assert(r.getAs[Boolean]("gopher_keep") === keep)
    }
  }

  test("v35: JL readout matches an in-process recompute of the hashed " +
    "sign matrix, projection, and pair ratios") {
    val k = 16
    val x = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1000.0).toLong).toArray)
      .toMap
    val d = x.values.head.length
    def sign(j: Long, kk: Long): Long = {
      val m = (j * k + kk) % 1000000007L * 2654435761L % 1000000007L % 6L
      if (m == 0L) 1L else if (m == 1L) -1L else 0L
    }
    def proj(v: Array[Long]): Array[Long] =
      Array.tabulate(k)(kk =>
        (0 until d).map(j => sign(j, kk) * v(j)).sum)
    def ratios(st: Int): Seq[Long] =
      x.keys.toSeq.sorted.flatMap { id =>
        x.get(id + st).map { b =>
          val a = x(id)
          val dorig = (0 until d).map(j => { val t = a(j) - b(j); t * t }).sum
          val pa = proj(a); val pb = proj(b)
          val dproj = (0 until k).map(j => { val t = pa(j) - pb(j); t * t }).sum
          (dorig, dproj)
        }
      }.filter(_._1 > 0L)
        .map { case (o, p) =>
          (BigInt(p) * 3000 / (BigInt(k) * BigInt(o))).toLong }
    val got = graft.vector.RandomProjection.jlEval(spark, sfDir)
      .collect().map(r => r.getAs[Int]("stride") -> r).toMap
    for (st <- Seq(1, 37)) {
      val rs = ratios(st)
      val r = got(st)
      assert(r.getAs[Long]("n_pairs") === rs.size.toLong)
      assert(r.getAs[Long]("mean_ratio_milli") === rs.sum / rs.size)
      assert(r.getAs[Long]("min_ratio_milli") === rs.min)
      assert(r.getAs[Long]("max_ratio_milli") === rs.max)
      assert(r.getAs[Long]("within_25pct_milli") ===
        rs.count(v => v >= 750 && v <= 1250).toLong * 1000 / rs.size)
    }
  }

  test("er1: Fellegi–Sunter linkage matches a full in-process recompute " +
    "(corruption, blocking, m/u, milli-bit weights, decisions)") {
    case class P(key: Long, name: String, brand: String, tpe: String, size: Int)
    val parts = Tables.part(spark, sfDir)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size").collect()
      .map(r => P(r.getAs[Long](0), r.getAs[String](1), r.getAs[String](2),
        r.getAs[String](3), r.getAs[Int](4)))
    def dirty(p: P): P = {
      val pos = (p.key % 1000000007L * 2654435761L % p.name.length).toInt
      P(p.key, p.name.substring(0, pos) + p.name.substring(pos + 1),
        p.brand, if (p.key % 4 == 0) "UNKNOWN" else p.tpe, p.size)
    }
    val ds = parts.map(dirty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def agree(c: P, d: P) =
      (lev(c.name, d.name) <= 2, c.brand == d.brand, c.tpe == d.tpe)
    def rate(pairs: Seq[(P, P)], f: ((Boolean, Boolean, Boolean)) => Boolean) = {
      val r = pairs.count(p => f(agree(p._1, p._2))).toLong * 1000 / pairs.size
      math.max(1L, math.min(999L, r))
    }
    val truePairs = parts.map(c => c -> ds.find(_.key == c.key).get).toSeq
    val offPairs = parts.flatMap(c => ds.find(_.key == c.key + 1).map(c -> _)).toSeq
    def mlog2(x: Long): Long = {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val p = 1L << b
      b * 1000L + (x - p) * 1000L / p
    }
    val fields: Seq[((Boolean, Boolean, Boolean)) => Boolean] =
      Seq(_._1, _._2, _._3)
    val ws = fields.map { f =>
      val (m, u) = (rate(truePairs, f), rate(offPairs, f))
      (mlog2(m) - mlog2(u), mlog2(1000 - m) - mlog2(1000 - u))
    }
    val cands = (for {
      c <- parts; d <- ds
      if c.name.length - d.name.length >= 0 &&
        c.name.length - d.name.length <= 2 &&
        ((c.brand == d.brand && c.size == d.size) ||
          (c.tpe == d.tpe && c.size == d.size))
    } yield (c, d)).distinct
    val decided = cands.map { case (c, d) =>
      val a = agree(c, d)
      val score = fields.zip(ws).map { case (f, (wa, wd)) =>
        if (f(a)) wa else wd }.sum
      val dec = if (score >= 2000L) "link"
        else if (score <= 0L) "non_link" else "possible"
      (dec, c.key == d.key)
    }
    val exp = decided.groupBy(_._1).map { case (dec, xs) =>
      dec -> (xs.size.toLong, xs.count(_._2).toLong) }
    val got = graft.analytics.Linkage.fsLinkage(spark, sfDir).collect()
      .map(r => r.getAs[String]("decision") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"))).toMap
    assert(got === exp)
  }

  test("v34: the fixed-point chain tracks the same-iteration-count " +
    "double-precision trajectory (|cos| > 0.99) under the sign convention") {
    // NOTE the contract: v34 is 4 ROUNDS of power iteration, not the
    // converged eigenvector — on this near-isotropic fixture
    // (λ2/λ1 ≈ 0.93) even 30 double rounds sit at cos ≈ 0.95 to the
    // true component, so the spec pins what the operator actually
    // promises: milli-quantization + 1e4 rescaling must not bend the
    // trajectory away from exact arithmetic over the same 4 rounds.
    val comp = graft.vector.Pca.leadingComponent(spark, sfDir)
      .orderBy("pos").collect().map(_.getAs[Long]("component_e4").toDouble)
    val d = comp.length
    assert(d === 64)
    // sign convention: first nonzero component positive
    assert(comp.find(_ != 0.0).forall(_ > 0.0))
    // reference: the SAME 4 rounds from the same uniform start, in
    // exact double arithmetic on the same milli-quantized inputs
    val x = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(f => math.floor(f.toDouble * 1000.0)).toArray)
    val n = x.length
    val mu = Array.tabulate(d)(j => {
      val s = x.map(_(j)).sum; (s - (s % n)) / n // truncating div on milli sums
    })
    val xc = x.map(r => Array.tabulate(d)(j => r(j) - mu(j)))
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 4) {
      val s = xc.map(r => r.zip(v).map { case (a, b) => a * b }.sum)
      val w = Array.tabulate(d)(j => xc.zip(s).map { case (r, si) => r(j) * si }.sum)
      val norm = math.sqrt(w.map(a => a * a).sum)
      v = w.map(_ / norm)
    }
    val dot = comp.zip(v).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(comp.map(a => a * a).sum) * math.sqrt(v.map(a => a * a).sum))
    assert(cos > 0.99, s"cosine to the 4-round double trajectory was $cos")
  }
}
