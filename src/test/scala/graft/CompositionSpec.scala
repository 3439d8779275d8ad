package graft

import graft.analytics.Profile
import graft.dedup.Dedup
import graft.streaming.EventsBatch
import graft.text.{CorpusFilter, TextAnalysis}
import org.apache.spark.sql.functions._

/** Cross-operator consistency for the round-2 composition queries. */
class CompositionSpec extends GraftSpec {

  test("e6: funnel stages are monotone (purchase => click => view)") {
    val f = EventsBatch.funnel(spark, sfDir)
    assert(f.filter(col("reached_click") && !col("reached_view")).count() === 0)
    assert(f.filter(col("reached_purchase") && !col("reached_click")).count() === 0)
    // stage gaps are strictly positive when present
    assert(f.filter(col("view_to_click_us") <= 0).count() === 0)
    assert(f.filter(col("click_to_purchase_us") <= 0).count() === 0)
  }

  test("t6: normalization never grows text; prefix is lowercase") {
    val n = TextAnalysis.normalizeText(spark, sfDir)
    assert(n.filter(col("n_chars_after") > col("n_chars_before")).count() === 0)
    assert(n.filter(col("normalized_prefix") =!= lower(col("normalized_prefix"))).count() === 0)
  }

  test("t7: repetition fractions bounded; bigram count is words-1 per doc") {
    val r = TextAnalysis.repetition(spark, sfDir)
    assert(r.count() > 0)
    assert(r.filter(col("dup_word_frac") < 0 || col("dup_word_frac") >= 1).count() === 0)
    assert(r.filter(col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).count() === 0)
    // duplicates kept in the bigram stream: every doc has exactly words-1 bigrams
    assert(r.filter(col("n_bigrams") =!= col("n_words") - 1).count() === 0)
  }

  test("t7: documents with fewer than 2 tokens yield zero bigrams, null frac") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, "two words"), (3L, "a a a"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionOf(docs).orderBy("doc_id").collect()
    assert(r.length === 3)
    val solo = r(0) // 1 token: no bigrams, zero-filled counts, null fraction
    assert(solo.getLong(1) === 1L && solo.getLong(4) === 0L && solo.getLong(5) === 0L)
    assert(solo.isNullAt(6))
    val aa = r(2) // "a a a": 2 bigrams, both "a a"
    assert(aa.getLong(4) === 2L && aa.getLong(5) === 2L && aa.getDouble(6) === 1.0)
  }

  test("t13: surprisal matches an exact single-process recomputation") {
    // The portable integer floor-log2 AND the top-K vocabulary cap with
    // the OOV max-bits charge are the load-bearing tricks — recompute the
    // whole capped score in plain Scala (Long.numberOfLeadingZeros, no
    // SQL, no floats until the final division) and require exact
    // agreement.
    val texts = graft.text.Corpus.docs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val counts = texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val kept = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextAnalysis.lmVocabCap).toMap
    assert(kept.size < counts.size, "fixture must exercise the OOV path")
    val oov = 63L - java.lang.Long.numberOfLeadingZeros(total)
    def bits(w: String): Long = kept.get(w)
      .map(c => 63L - java.lang.Long.numberOfLeadingZeros(total / c))
      .getOrElse(oov)
    val got = TextAnalysis.lmSurprisal(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === texts.size)
    got.foreach { case (id, nTok, sumBits, bpt) =>
      val ws = texts(id)
      val expSum = ws.map(bits).sum
      assert(nTok === ws.size.toLong, s"doc $id n_tokens")
      assert(sumBits === expSum, s"doc $id sum_bits")
      assert(bpt === expSum.toDouble / ws.size.toDouble, s"doc $id bits_per_token")
    }
  }

  test("t13: fit relation is cap-bounded; huge cap reproduces full vocab") {
    // The 100 TB claim: the broadcast fit is AT MOST cap rows. And the
    // cap only prunes — with a cap >= vocabulary size nothing is OOV,
    // so the fit is exactly the full-vocab relation.
    val fit = TextAnalysis.lmBits(spark, sfDir).collect()
    assert(fit.length <= TextAnalysis.lmVocabCap, "fit exceeds the cap")
    val vocabSize = graft.text.Corpus.docsTok(spark, sfDir)
      .select(explode(col("words")).as("w")).distinct().count()
    val full = TextAnalysis.lmBits(spark, sfDir, vocabCap = Int.MaxValue).collect()
    assert(full.length === vocabSize, "uncapped fit must cover the vocabulary")
    val fitMap = fit.map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullMap = full.map(r => r.getString(0) -> r.getLong(1)).toMap
    fitMap.foreach { case (w, b) =>
      assert(fullMap(w) === b, s"cap changed in-vocab bits for '$w'")
    }
  }

  test("t13: common-word docs score below rare-word docs") {
    // Construct the two extremes from the fitted vocabulary itself: the
    // most frequent word and the OOV bucket bound every doc's score.
    val t = TextAnalysis.lmSurprisal(spark, sfDir).cache()
    try {
      val toks = graft.text.Corpus.docsTok(spark, sfDir)
        .select(explode(col("words")).as("w")).groupBy("w").count()
      val maxCnt = toks.agg(max("count")).head.getLong(0)
      val totalToks = toks.agg(sum("count")).head.getLong(0)
      def bitsOf(c: Long) = 63L - java.lang.Long.numberOfLeadingZeros(totalToks / c)
      val lo = bitsOf(maxCnt).toDouble
      val hi = bitsOf(1L).toDouble // the OOV charge: bits of a count-1 word
      assert(t.filter(col("bits_per_token") < lo || col("bits_per_token") > hi)
        .count() === 0, s"bits_per_token outside [$lo, $hi]")
    } finally t.unpersist()
  }

  test("t14: bigram surprisal matches an exact single-process recomputation") {
    val texts = graft.text.Corpus.docs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val bigrams = texts.values.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prevTotals = bigrams.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val totalBg = bigrams.values.sum
    val kept = bigrams.toSeq.sortBy { case ((p, c), n) => (-n, p, c) }
      .take(TextAnalysis.lmBigramCap).map(_._1).toSet
    assert(kept.size < bigrams.size, "fixture must exercise the bigram OOV path")
    val oov = 63L - java.lang.Long.numberOfLeadingZeros(totalBg)
    def bits(b: (String, String)): Long =
      if (kept(b)) 63L - java.lang.Long.numberOfLeadingZeros(prevTotals(b._1) / bigrams(b))
      else oov
    val got = TextAnalysis.bigramSurprisal(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === texts.count(_._2.size >= 2))
    got.foreach { case (id, nBg, sumBits, bpb) =>
      val bs = texts(id).zip(texts(id).drop(1))
      val expSum = bs.map(bits).sum
      assert(nBg === bs.size.toLong, s"doc $id n_bigrams")
      assert(sumBits === expSum, s"doc $id sum_bits")
      assert(bpb === expSum.toDouble / bs.size.toDouble, s"doc $id bits_per_bigram")
    }
  }

  test("t15: integer BM25 matches an exact single-process recomputation") {
    // the full quantized pipeline — df cap, interpolated-log2 idf_milli,
    // saturating tf_milli, integer contributions — recomputed in plain
    // Scala longs and required to agree exactly, top-k and all
    val texts = graft.text.Corpus.docs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val n = texts.size.toLong
    val t = texts.values.map(_.size.toLong).sum
    val df = texts.values.map(_.distinct).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val kept = df.filter { case (_, d) => d * 100 <= 78 * n }.keySet
    assert(kept.nonEmpty && kept.size < df.size, "df cap must bind")
    def idfMilli(d: Long): Long = {
      val q = n * 1024 / d
      val b = 63 - java.lang.Long.numberOfLeadingZeros(q)
      val p = 1L << b
      (b - 10) * 1000 + (q - p) * 1000 / p
    }
    def tfMilli(tf: Long, dl: Long): Long =
      22000 * tf / (10 * tf + 3 + 9 * dl * n / t)
    def contrib(doc: Seq[String], word: String): Long = {
      val tf = doc.count(_ == word).toLong
      idfMilli(df(word)) * tfMilli(tf, doc.size.toLong)
    }
    val got = TextAnalysis.bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    (0L until 3L).foreach { qid =>
      val qTerms = texts(qid).distinct.filter(kept)
      val scored = texts.keys.filter(_ != qid).map { d =>
        val shared = qTerms.filter(texts(d).contains)
        (d, shared.map(w => contrib(texts(d), w)).sum, shared.size.toLong)
      }.filter(_._3 > 0).toSeq
      val top = scored.sortBy { case (d, s, _) => (-s, d) }.take(5)
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      assert(mine.length === top.length, s"query $qid row count")
      mine.zip(top).zipWithIndex.foreach { case (((_, rk, d, s, nt), (ed, es, ent)), i) =>
        assert(rk === i + 1L)
        assert(d === ed, s"query $qid rank $rk doc")
        assert(s === es, s"query $qid rank $rk score")
        assert(nt === ent, s"query $qid rank $rk n_terms")
      }
    }
  }

  test("recall family threads nQueries into BOTH sides (truth and approx)") {
    // regression: a half-threaded nQueries computed approx for queries
    // 0..n-1 but truth for 0..9, yielding phantom zero-recall rows
    import graft.vector.Similarity
    val qr = Similarity.quantizedRecall(spark, sfDir, nQueries = 3)
      .select("query_id").collect().map(_.getLong(0)).toSet
    assert(qr === Set(0L, 1L, 2L), s"quantizedRecall query set: $qr")
    val pr = Similarity.pqRecall(spark, sfDir, nQueries = 3)
      .select("query_id").collect().map(_.getLong(0)).toSet
    assert(pr === Set(0L, 1L, 2L), s"pqRecall query set: $pr")
    val ar = Similarity.annRecall(spark, sfDir, nQueries = 3)
    assert(ar.select("query_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
    // and shrinking the query set must not manufacture zero-recall rows:
    // each query's recall matches the default-run value for that query
    val dflt = Similarity.pqRecall(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    Similarity.pqRecall(spark, sfDir, nQueries = 3)
      .collect().foreach { r =>
        assert(r.getDouble(3) === dflt(r.getLong(0)),
          s"query ${r.getLong(0)} recall changed with the query-set size")
      }
  }

  test("v15: norm augmentation reduces MIPS to cosine (rank identity)") {
    // Shrivastava-Li: with x' = [x, sqrt(M^2 - |x|^2)] and q' = [q, 0],
    // cos(q', x') = q.x / (|q| M) — monotone in the inner product — so
    // cosine ranking of augmented vectors must reproduce v15's MIPS
    // ranking exactly (same tie-break: equal dots stay equal cosines).
    // (The fixture's embeddings have near-uniform norms, so MIPS and
    // cosine neighbor SETS happen to coincide here — the semantics
    // differ whenever norms spread; the reduction identity below is
    // the substantive claim.)
    import graft.vector.Similarity
    val embs = graft.model.Tables.embeddings(spark, sfDir).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val m2 = embs.map { case (_, x) => dot(x, x) }.max
    val aug = embs.map { case (id, x) =>
      id -> (x :+ math.sqrt(math.max(0.0, m2 - dot(x, x)))) }.toMap
    val mips = Similarity.mipsTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(mips.nonEmpty)
    mips.groupBy(_._1).foreach { case (qid, rows) =>
      val qAug = embs.toMap.apply(qid) :+ 0.0
      val cosRank = embs.collect { case (id, _) if id != qid =>
        val xA = aug(id)
        (id, dot(qAug, xA) / math.sqrt(dot(qAug, qAug) * dot(xA, xA)))
      }.sortBy { case (id, c) => (-c, id) }.take(rows.length).map(_._1)
      val mipsRank = rows.sortBy(_._2).map(_._3)
      assert(mipsRank.toSeq === cosRank.toSeq,
        s"query $qid: augmented-cosine order must equal MIPS order")
    }
  }

  test("v16: pre-filter search = exact search on the restricted corpus, k always filled") {
    import graft.vector.Similarity
    val embs = graft.model.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(_.toDouble)))
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val res = Similarity.filteredTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(res.nonEmpty)
    val byId = embs.map(e => e._1 -> e).toMap
    res.groupBy(_._1).foreach { case (qid, rows) =>
      val (_, qLabel, qEmb) = byId(qid)
      // every returned neighbor wears the query's label
      assert(rows.forall(_._2 == qLabel))
      // k is filled (the under-fill post-filtering suffers cannot happen
      // when the class holds >= k candidates)
      val classSize = embs.count(e => e._2 == qLabel && e._1 != qid)
      assert(rows.length === math.min(5, classSize))
      // order identical to an in-process exact search over the class
      val expect = embs.collect { case (id, l, x) if l == qLabel && id != qid =>
        (id, dot(qEmb, x) / math.sqrt(dot(qEmb, qEmb) * dot(x, x)))
      }.sortBy { case (id, c) => (-c, id) }.take(rows.length).map(_._1)
      assert(rows.sortBy(_._3).map(_._4).toSeq === expect.toSeq,
        s"query $qid: filtered top-k must equal exact search within label $qLabel")
    }
  }

  test("v17: MIPS-LSH = in-process bucketed dot ranking; augmentation precondition holds") {
    import graft.vector.Similarity
    val embs = graft.model.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // precondition for "the MIPS index IS v2's bucket table": every
    // hyperplane dim (1-based 1,5,..,29) is inside the raw vector, so the
    // appended augmentation coordinate (dim d+1) can never flip a bucket bit
    assert(embs.head._2.length > 29)
    def bucket(x: Array[Float]): Long =
      (0 until 8).map(i => if (x(i * 4) > 0f) 1L << i else 0L).sum
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    val res = Similarity.mipsAnnRecall(spark, sfDir).collect()
    assert(res.nonEmpty)
    // recompute recall in-process from first principles
    val truth = Similarity.mipsTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    res.foreach { r =>
      val qid = r.getLong(0)
      val (_, qEmb) = embs.find(_._1 == qid).get
      val approx = embs
        .filter { case (id, x) => id != qid && bucket(x) == bucket(qEmb) }
        .map { case (id, x) => (id, dot(qEmb, x)) }
        .sortBy { case (id, d) => (-d, id) }.take(5).map(_._1).toSet
      val hits = truth(qid).count(approx.contains)
      assert(r.getAs[Long]("n_truth") === truth(qid).size)
      assert(r.getAs[Long]("n_hits") === hits,
        s"query $qid: recall hits must match in-process bucketed-dot ranking")
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("v14: with a corpus-wide candidate budget, two-stage IS exact search") {
    // the limit-case identity that proves stage 2 is a true exact rerank:
    // when the prefilter keeps everything, the composition must reproduce
    // v1's brute-force top-k bit-for-bit
    import graft.vector.Similarity
    val n = graft.model.Tables.embeddings(spark, sfDir).count().toInt
    val full = Similarity.twoStageRetrieval(spark, sfDir, nCand = n)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val truth = Similarity.cosineTopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    assert(full.sortBy(t => (t._1, t._2)).toSeq === truth.sortBy(t => (t._1, t._2)).toSeq,
      "uncapped two-stage must equal brute-force exactly")
    // and the default budget returns well-formed per-query top-k
    val ts = Similarity.twoStageRetrieval(spark, sfDir)
    assert(ts.count() === 50)
    assert(ts.filter(col("cosine") < -1 || col("cosine") > 1).count() === 0)
  }

  test("x7: shard manifest accounts for every kept doc and token exactly") {
    import graft.text.CorpusFilter
    val m = CorpusFilter.shardManifest(spark, sfDir).cache()
    try {
      val kept = CorpusFilter.corpusBuild(spark, sfDir).filter(col("kept"))
        .agg(count(lit(1)).as("d"), sum("n_tokens").as("t")).head
      val tot = m.agg(sum("n_docs"), sum("n_tokens")).head
      assert(tot.getLong(0) === kept.getLong(0), "manifest doc count")
      assert(tot.getLong(1) === kept.getLong(1), "manifest token count")
      // ranges and window counts are internally coherent per shard
      assert(m.filter(col("first_doc") > col("last_doc")).count() === 0)
      assert(m.filter(col("n_windows") < 1 ||
        col("n_windows") > col("n_tokens") / 512 + 1).count() === 0)
    } finally m.unpersist()
  }

  test("p13: sample is deterministic, nested by rate, independent of split") {
    import graft.text.CorpusPrep
    def ids(pm: Int) = CorpusPrep.sampleDocs(spark, sfDir, pm)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s100 = ids(100)
    assert(s100.nonEmpty && ids(100) === s100, "re-run must select identically")
    assert(ids(50).subsetOf(s100), "halving the rate must nest the sample")
    assert(ids(1000).size === graft.model.Tables.documents(spark, sfDir).count())
    // uncorrelated with p7's split: the sample covers all three splits
    val splits = CorpusPrep.sampleDocs(spark, sfDir, 200)
      .select(CorpusPrep.splitOf(col("doc_id"))).distinct().count()
    assert(splits === 3, "sample must straddle train/val/test")
  }

  test("t19: spectrum matches an exact single-process recomputation; conserves vocab and mass") {
    import graft.text.{Corpus, TextAnalysis}
    val words = Corpus.docsTok(spark, sfDir).select("words").collect()
      .flatMap(_.getSeq[String](0))
    val occ = words.groupBy(identity).map(_._2.size.toLong)
    def bucketOf(c: Long): Long =
      if (c <= 8) c else 1L << (63 - java.lang.Long.numberOfLeadingZeros(c))
    val expect = occ.groupBy(bucketOf).map { case (b, cs) =>
      b -> (cs.size.toLong, cs.sum)
    }
    val res = TextAnalysis.freqSpectrum(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (nWords, mass) = expect(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_words") === nWords)
      assert(r.getAs[Long]("mass") === mass)
    }
    // conservation: spectrum partitions the vocabulary and the corpus
    assert(res.map(_.getAs[Long]("n_words")).sum === occ.size.toLong)
    assert(res.map(_.getAs[Long]("mass")).sum === words.length.toLong)
  }

  test("t16: diversity matches an exact single-process recomputation") {
    import graft.text.{Corpus, TextAnalysis}
    val docs = Corpus.docsTok(spark, sfDir)
      .select("lang", "source", "words").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getSeq[String](2)))
    val expect = docs.groupBy(_._1).map { case (key, rows) =>
      val words = rows.flatMap(_._2)
      val occ = words.groupBy(identity).map(_._2.size)
      val (tokens, types, hapax) =
        (words.size.toLong, occ.size.toLong, occ.count(_ == 1).toLong)
      key -> (tokens, types, hapax, types * 1000 / tokens, hapax * 1000 / types)
    }
    val res = TextAnalysis.lexicalDiversity(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (tokens, types, hapax, ttr, hx) =
        expect((r.getString(0), r.getString(1)))
      assert(r.getAs[Long]("n_tokens") === tokens)
      assert(r.getAs[Long]("n_types") === types)
      assert(r.getAs[Long]("n_hapax") === hapax)
      assert(r.getAs[Long]("ttr_milli") === ttr)
      assert(r.getAs[Long]("hapax_milli") === hx)
      // ordering sanity: hapax <= types <= tokens
      assert(hapax <= types && types <= tokens)
    }
  }

  test("t17: confusion matrix totals per label; diagonal is the recall") {
    val m = TextAnalysis.langConfusion(spark, sfDir).cache()
    try {
      // per-label cells sum to the label total; shares sum to one
      val bad = m.groupBy("lang_labeled")
        .agg(sum("n_docs").as("s"), max("label_total").as("t"),
          sum("label_share").as("sh"))
        .filter(col("s") =!= col("t") || abs(col("sh") - 1.0) > 1e-9)
      assert(bad.count() === 0)
      // every labeled doc is in exactly one cell
      val total = m.agg(sum("n_docs")).head.getLong(0)
      assert(total === graft.model.Tables.documents(spark, sfDir).count())
    } finally m.unpersist()
  }

  test("d17: containment is the asymmetric ratio, bounded by its algebra") {
    val c = graft.dedup.Dedup.containmentPairs(spark, sfDir).cache()
    try {
      assert(c.count() > 0)
      // containment = n_common/size_contained in [0.8, 1]; jaccard can
      // never exceed containment (union >= contained size); the integer
      // filter and the float column must agree
      assert(c.filter(col("containment") < 0.8 - 1e-12 ||
        col("containment") > 1.0).count() === 0)
      assert(c.filter(col("jaccard") > col("containment")).count() === 0)
      assert(c.filter(col("n_common") > col("size_contained")).count() === 0)
      // exact duplicates are contained both ways: every (a CONTAINED-IN b)
      // with containment 1.0 and equal sizes has its mirror row
      val full = c.filter(col("containment") === 1.0 &&
        col("size_contained") === col("size_container"))
        .select("contained_doc", "container_doc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      full.foreach { case (a, b) =>
        assert(full.contains((b, a)), s"missing mirror orientation ($b, $a)")
      }
    } finally c.unpersist()
  }

  test("a29: running totals end at each store's grand total; MTD resets") {
    val rt = graft.analytics.Kpis.runningTotals(spark, sfDir).cache()
    try {
      // final running_sales per store == the store's total day_sales
      val last = rt.groupBy("store_id")
        .agg(max("running_sales").as("final_run"), sum("day_sales").as("tot"))
      assert(last.filter(abs(col("final_run") - col("tot")) > 1e-6).count() === 0)
      // MTD never exceeds the running total and restarts <= day_sales on
      // the first day of each month
      assert(rt.filter(col("mtd_sales") > col("running_sales") + lit(1e-9))
        .count() === 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("store_id"), substring(col("sale_date"), 1, 7))
        .orderBy("sale_date")
      val first = rt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      assert(first.filter(col("mtd_sales") =!= col("day_sales")).count() === 0,
        "MTD must reset to the day's sales at each month start")
    } finally rt.unpersist()
  }

  test("d19: shared spans match an exact in-process recomputation over d17 pairs") {
    import graft.text.Corpus
    val pairs = Dedup.containmentPairs(spark, sfDir)
      .select("contained_doc", "container_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tok = Corpus.docsTok(spark, sfDir).select("doc_id", "words").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    def shingleStream(id: Long): Seq[String] = {
      val ws = tok(id)
      if (ws.length < 3) Seq.empty
      else ws.sliding(3).map(_.mkString(" ")).toSeq
    }
    val expect = pairs.map { case (a, b) =>
      val bSet = shingleStream(b).toSet
      val hits = shingleStream(a).map(bSet.contains)
      // collapse to run lengths
      val runs = hits.foldLeft(List.empty[Long]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1L :: acc
        case (acc, false) if acc.nonEmpty && acc.head == 0 => acc
        case (acc, false) => 0L :: acc
      }.filter(_ > 0)
      (a, b) -> (runs.sum, runs.length.toLong, runs.max)
    }.toMap
    val res = Dedup.sharedSpans(spark, sfDir).collect()
    // every d17 verdict pair has >= 1 shared shingle: the relation is total
    assert(res.length === pairs.length)
    res.foreach { r =>
      val (nm, nr, lr) = expect((r.getAs[Long]("contained_doc"),
        r.getAs[Long]("container_doc")))
      assert(r.getAs[Long]("n_matched") === nm)
      assert(r.getAs[Long]("n_runs") === nr)
      assert(r.getAs[Long]("longest_run") === lr)
      assert(r.getAs[Long]("longest_span_tokens") === lr + 2)
      assert(r.getAs[Boolean]("flagged") === (lr + 2 >= 13))
    }
  }

  test("k2: skew profile matches an exact in-process recomputation") {
    import graft.model.Tables
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    val cols = Map(
      "l_orderkey" -> li.map(_.getAs[Long]("l_orderkey")),
      "l_partkey" -> li.map(_.getAs[Long]("l_partkey")),
      "l_suppkey" -> li.map(_.getAs[Long]("l_suppkey")))
    val res = Profile.skewProfile(spark, sfDir).collect()
    assert(res.length === 3)
    res.foreach { r =>
      val vals = cols(r.getAs[String]("key_col"))
      val counts = vals.groupBy(identity).map(_._2.length.toLong)
      val (n, k, mx) = (vals.length.toLong, counts.size.toLong, counts.max)
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_keys") === k)
      assert(r.getAs[Long]("max_count") === mx)
      assert(r.getAs[Long]("mean_milli") === n * 1000 / k)
      assert(r.getAs[Long]("skew_ratio_milli") === mx * k * 1000 / n)
      assert(r.getAs[Long]("salt_hint") === (mx * k + n - 1) / n)
      // the max key can never be lighter than the mean key
      assert(r.getAs[Long]("skew_ratio_milli") >= 1000)
      assert(r.getAs[Long]("salt_hint") >= 1)
    }
  }

  test("k3: column profile matches exact per-column recomputation") {
    import graft.model.Tables
    val ev = Tables.events(spark, sfDir).collect()
    val res = Profile.columnProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(res.size === 6)
    val n = ev.length.toLong
    res.values.foreach(r => assert(r.getAs[Long]("n_rows") === n))
    // spot-exact on three representative columns
    val uids = ev.map(_.getAs[Long]("user_id"))
    assert(res("user_id").getAs[Long]("n_distinct") === uids.distinct.length.toLong)
    assert(res("user_id").getAs[String]("min_repr") === uids.min.toString)
    assert(res("user_id").getAs[String]("max_repr") === uids.max.toString)
    val types = ev.map(_.getAs[String]("event_type"))
    assert(res("event_type").getAs[Long]("n_distinct") === types.distinct.length.toLong)
    assert(res("event_type").getAs[String]("min_repr") === types.min)
    assert(res("event_type").getAs[String]("max_repr") === types.max)
    val vals = ev.map(r => BigDecimal(r.getAs[Double]("value")).setScale(2))
    assert(res("value").getAs[Long]("n_distinct") === vals.distinct.length.toLong)
    assert(res("value").getAs[String]("min_repr") === vals.min.toString)
    // no nulls in the fixture; the profile must agree
    res.values.foreach(r => assert(r.getAs[Long]("n_null") === 0L))
    // event_id is the primary key: distinct count must equal rows
    assert(res("event_id").getAs[Long]("n_distinct") === n)
  }

  test("e12: snapshot matches an exact in-process latest-version fold") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val raw = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000 +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000 % 1000))
    val expect = raw.groupBy(_._1).map { case (uid, rows) =>
      val last = rows.maxBy(r => (r._5, r._2))
      uid -> (last._2, last._3, last._4, last._5,
        rows.map(_._5).min, rows.length.toLong)
    }
    val res = EventsBatch.latestState(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (eid, typ, v, lastUs, firstUs, n) = expect(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("last_event_id") === eid)
      assert(r.getAs[String]("last_type") === typ)
      assert(r.getAs[Double]("last_value") === v)
      assert(r.getAs[Long]("last_ts_us") === lastUs)
      assert(r.getAs[Long]("first_ts_us") === firstUs)
      assert(r.getAs[Long]("n_versions") === n)
      assert(firstUs <= lastUs)
    }
    // conservation: version counts partition the log
    assert(res.map(_.getAs[Long]("n_versions")).sum === raw.length.toLong)
  }

  test("e11: latency stats reproduce an in-process nearest-rank computation") {
    import graft.streaming.EventsBatch
    val base = EventsBatch.funnel(spark, sfDir).collect()
    def stats(us: Array[Long]): (Long, Long, Long, Long, Long, Long) = {
      val s = us.sorted
      val n = s.length.toLong
      def atRank(r: Long) = s((r - 1).toInt)
      (n, s.head, s.last, s.sum, atRank((n + 1) / 2), atRank((9 * n + 9) / 10))
    }
    val expect = Map(
      "view_to_click" -> stats(base.flatMap(r =>
        Option(r.getAs[java.lang.Long]("view_to_click_us")).map(_.toLong))),
      "click_to_purchase" -> stats(base.flatMap(r =>
        Option(r.getAs[java.lang.Long]("click_to_purchase_us")).map(_.toLong))))
    val res = EventsBatch.funnelLatency(spark, sfDir).collect()
    assert(res.length === 2, "both stage transitions must appear")
    res.foreach { r =>
      val (n, mn, mx, tot, p50, p90) = expect(r.getAs[String]("stage"))
      assert(r.getAs[Long]("n_conversions") === n)
      assert(r.getAs[Long]("min_us") === mn)
      assert(r.getAs[Long]("max_us") === mx)
      assert(r.getAs[Long]("total_us") === tot)
      assert(r.getAs[Long]("p50_us") === p50)
      assert(r.getAs[Long]("p90_us") === p90)
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
    }
  }

  test("e10: hourly anomaly severities agree with the deviation rubric") {
    val a = graft.streaming.EventsBatch.hourlyAnomalies(spark, sfDir).cache()
    try {
      assert(a.count() > 0)
      assert(a.filter(col("hist_hours") < 3 || col("hist_hours") > 24)
        .count() === 0)
      val wrong = a.filter(
        (abs(col("deviation_pct")) > 50 && col("severity") =!= "critical") ||
        (abs(col("deviation_pct")) > 25 && abs(col("deviation_pct")) <= 50 &&
          col("severity") =!= "warning") ||
        (abs(col("deviation_pct")) <= 25 && col("severity") =!= "info"))
      assert(wrong.count() === 0, "severity must follow a11's thresholds")
    } finally a.unpersist()
  }

  test("x6: anomalies export is a11 row-for-row with consistent formatting") {
    val x = graft.export.Flatten.exportAnomalies(spark, sfDir).cache()
    try {
      val a = graft.analytics.History.anomalies(spark, sfDir)
      assert(x.count() === a.count(), "one export row per anomaly")
      // title leads with the Initcap severity; description embeds the
      // floored absolute deviation bucket of the same row
      assert(x.filter(!col("title").startsWith(initcap(col("severity"))))
        .count() === 0)
      assert(x.filter(!col("description").contains(
        concat(lit("~"), floor(abs(col("deviation_percent"))).cast("long"),
          lit("%")))).count() === 0)
      // numeric passthroughs agree with the a11 silver (x derives from a:
      // project a to fresh names to avoid self-join attribute ambiguity)
      val a2 = a.select(col("sale_date").as("a_date"),
        col("store_id").as("a_store"), col("today_sales").as("a_sales"),
        col("deviation_pct").as("a_dev"))
      val j = x.join(a2,
        col("date") === col("a_date") && col("store_id") === col("a_store"))
      assert(j.filter(col("metric_value") =!= col("a_sales") ||
        col("deviation_percent") =!= col("a_dev")).count() === 0)
    } finally x.unpersist()
  }

  test("x5: corpus report covers every doc once; columns agree with parents") {
    val r = graft.export.Flatten.exportCorpusReport(spark, sfDir).cache()
    try {
      val docs = graft.text.Corpus.docs(spark, sfDir)
      assert(r.count() === docs.count())
      assert(r.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
      val q = TextAnalysis.qualityScore(spark, sfDir)
        .select(col("doc_id"), col("quality_score").as("q_parent"))
      assert(r.join(q, "doc_id")
        .filter(col("quality_score") =!= col("q_parent")).count() === 0)
      val d = Dedup.dedupVerdict(spark, sfDir)
        .select(col("doc_id"), col("action").as("a_parent"))
      assert(r.join(d, "doc_id")
        .filter(col("action") =!= col("a_parent")).count() === 0)
    } finally r.unpersist()
  }

  test("e7: retention matrix — offset 0 is complete, cells never exceed cohort") {
    val m = EventsBatch.retention(spark, sfDir).cache()
    try {
      assert(m.count() > 0)
      assert(m.filter(col("week_offset") < 0).count() === 0)
      assert(m.filter(col("active_users") > col("cohort_size")).count() === 0)
      val zero = m.filter(col("week_offset") === 0)
      assert(zero.filter(col("retention") =!= 1.0).count() === 0,
        "every user is active in their own cohort week")
    } finally m.unpersist()
  }

  test("d8: hamming pairs are ordered, within bound, consistent with d3 signatures") {
    val p = Dedup.simhashPairs(spark, sfDir)
    assert(p.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(p.filter(col("hamming") > 8 || col("hamming") < 0).count() === 0)
  }

  test("c1: kept docs pass every individual gate; losers trace to a reason") {
    val c = CorpusFilter.corpusFilter(spark, sfDir).cache()
    try {
      assert(c.count() > 0)
      val kept = c.filter(col("kept"))
      assert(kept.filter(col("quality_score") < 50 || col("is_exact_dup") ||
        col("is_near_dup_loser")).count() === 0)
      val dropped = c.filter(!col("kept"))
      assert(dropped.filter(col("quality_score") >= 50 && !col("is_exact_dup") &&
        !col("is_near_dup_loser")).count() === 0)
    } finally c.unpersist()
  }

  test("r2: recommendation ranks are dense, priority-ordered; high count consistent") {
    import org.apache.spark.sql.expressions.Window
    val r = graft.analytics.Recommendations.recommendations(spark, sfDir).cache()
    try {
      assert(r.count() > 0)
      // rec_rank is 1..n per date and follows priority_rank order
      val w = Window.partitionBy(col("sale_date")).orderBy(col("rec_rank"))
      val seq = r.withColumn("prev_rank", lag(col("rec_rank"), 1).over(w))
        .withColumn("prev_prio", lag(col("priority_rank"), 1).over(w))
      assert(seq.filter(col("prev_rank").isNull && col("rec_rank") =!= 1).count() === 0)
      assert(seq.filter(col("rec_rank") =!= col("prev_rank") + 1
        && col("prev_rank").isNotNull).count() === 0)
      assert(seq.filter(col("priority_rank") < col("prev_prio")).count() === 0)
      // high_priority_count matches the actual high rows of its date
      val highs = r.groupBy(col("sale_date"))
        .agg(sum(when(col("priority") === "high", 1).otherwise(0)).as("n_high"),
          max(col("high_priority_count")).as("claimed"),
          min(col("high_priority_count")).as("claimed_min"))
      assert(highs.filter(col("n_high") =!= col("claimed")
        || col("claimed") =!= col("claimed_min")).count() === 0)
      // the operations rule matches the a11 relation it derives from
      val opsDates = r.filter(col("category") === "operations")
        .select(col("sale_date")).distinct()
      val anomalyDates = graft.analytics.History.anomalies(spark, sfDir)
        .filter(col("deviation_pct") < -25).select(col("sale_date")).distinct()
      assert(opsDates.exceptAll(anomalyDates).count() === 0)
      assert(anomalyDates.exceptAll(opsDates).count() === 0)
    } finally r.unpersist()
  }

  test("h1: hybrid results are lexical candidates reranked by cosine") {
    import graft.vector.Similarity
    val h = Similarity.hybridSearch(spark, sfDir).cache()
    try {
      assert(h.count() > 0)
      assert(h.filter(col("cosine") < -1.0 || col("cosine") > 1.0).count() === 0)
      assert(h.filter(col("n_common_words") < 3).count() === 0)
      assert(h.filter(col("query_id") === col("doc_id")).count() === 0)
      // ranks are dense from 1 and ordered by cosine descending per query
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("rank"))
      val seq = h.withColumn("prev_rank", lag(col("rank"), 1).over(w))
        .withColumn("prev_cos", lag(col("cosine"), 1).over(w))
      assert(seq.filter(col("prev_rank").isNull && col("rank") =!= 1).count() === 0)
      assert(seq.filter(col("prev_rank").isNotNull &&
        col("rank") =!= col("prev_rank") + 1).count() === 0)
      assert(seq.filter(col("prev_cos").isNotNull &&
        col("cosine") > col("prev_cos")).count() === 0)
      // word-overlap counts are real UNDER THE DF CAP: recompute every
      // returned pair's overlap over the kept (df-capped) terms only —
      // stopwords above the cap must carry no lexical evidence
      val docsW = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), array_distinct(split(col("text"), "\\s+")).as("ws"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val nDocs = docsW.size
      val dfMap = docsW.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val kept = dfMap.collect {
        case (w, df) if df * 100 <= Similarity.defaultMaxDfPct * nDocs => w
      }.toSet
      assert(kept.nonEmpty && kept.size < dfMap.size,
        "fixture must have both kept and capped terms")
      h.collect().foreach { r =>
        val expected = (docsW(r.getLong(0)) & docsW(r.getLong(2)) & kept).size.toLong
        assert(r.getLong(3) === expected,
          s"pair (${r.getLong(0)}, ${r.getLong(2)}): n_common_words must be " +
            "the overlap over df-kept terms only")
      }
    } finally h.unpersist()
  }

  test("h1: df cap bounds the candidate stage on a stopword-heavy corpus") {
    // With the cap forced to 0% every term is a stopword -> the lexical
    // stage generates NO candidates at all (the all-pairs degeneracy is
    // structurally impossible, not just unlikely); the default cap must
    // still leave the fixture result non-empty so the key stays
    // oracle-exercised.
    import graft.vector.Similarity
    assert(Similarity.hybridSearch(spark, sfDir, maxDfPct = 0).count() === 0)
    assert(Similarity.hybridSearch(spark, sfDir).count() > 0,
      "default cap must keep the fixture result non-empty")
  }

  test("t12: chunks tile every document — dense indices, exact tail coverage") {
    val c = TextAnalysis.chunk(spark, sfDir).cache()
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n"))
      // dense chunk indices starting at 0; start = idx * stride
      val per = c.groupBy("doc_id").agg(count(lit(1)).as("k"),
        max("chunk_idx").as("mx"), min("chunk_idx").as("mn"),
        max(col("start_tok") + col("n_tokens_chunk")).as("covered"))
        .join(docs, "doc_id")
      assert(per.filter(col("mn") =!= 0L || col("mx") =!= col("k") - 1).count() === 0)
      assert(per.count() === docs.count(), "every doc chunked")
      // the last chunk always ends exactly at the document's last token
      assert(per.filter(col("covered") =!= col("n")).count() === 0)
      assert(c.filter(col("start_tok") =!= col("chunk_idx") * 48).count() === 0)
      assert(c.filter(col("n_tokens_chunk") > 64 || col("n_tokens_chunk") < 1).count() === 0)
      // a non-final chunk is cut at min(window, n - start)
      val nonLast = c.join(per.select(col("doc_id"), col("mx"), col("n")), "doc_id")
        .filter(col("chunk_idx") < col("mx"))
      assert(nonLast.filter(col("n_tokens_chunk") =!=
        least(lit(64L), col("n") - col("start_tok"))).count() === 0)
      // chunk_text really carries n_tokens_chunk tokens
      assert(c.filter(size(split(col("chunk_text"), " ")).cast("long")
        =!= col("n_tokens_chunk")).count() === 0)
    } finally c.unpersist()
  }

  test("t11: histogram partitions the corpus; shares sum to one") {
    val h = TextAnalysis.lengthHistogram(spark, sfDir).collect()
    val edges = Set(0L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L)
    assert(h.map(_.getLong(0)).forall(edges.contains))
    assert(h.map(_.getLong(0)).distinct.length === h.length)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(h.map(_.getLong(1)).sum === docs.count())
    val tokens = docs.select(size(split(col("text"), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(h.map(_.getLong(2)).sum === tokens)
    assert(math.abs(h.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    // every bucket's token mass is within [lo*n_docs, hi*n_docs)
    val hi = Map(0L -> 16L, 16L -> 32L, 32L -> 64L, 64L -> 128L,
      128L -> 256L, 256L -> 512L, 512L -> 1024L, 1024L -> Long.MaxValue)
    h.foreach { r =>
      val (lo, n, tok) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(tok >= lo * n, s"bucket $lo mass below bound")
      if (hi(lo) != Long.MaxValue) assert(tok < hi(lo) * n, s"bucket $lo mass above bound")
    }
  }

  test("e8: as-of join picks the latest view at-or-before each purchase") {
    import spark.implicits._
    val ts = (us: Long) => new java.sql.Timestamp(us / 1000) // micros → ms fixture
    val events = Seq(
      // u1: view@10, view@20, purchase@20 (inclusive tie → 20), purchase@30 (→ 20)
      ("v1", "u1", ts(10000000L), "view"),
      ("v2", "u1", ts(20000000L), "view"),
      ("p1", "u1", ts(20000000L), "purchase"),
      ("p2", "u1", ts(30000000L), "purchase"),
      // u2: purchase with NO prior view (view comes after) → -1 sentinels
      ("p3", "u2", ts(40000000L), "purchase"),
      ("v3", "u2", ts(50000000L), "view"),
      // clicks are ignored entirely
      ("c1", "u1", ts(25000000L), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventsBatch.asOfAttributionOf(events)
      .orderBy("event_id").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("p1", "p2", "p3"))
    val byId = r.map(x => x.getString(0) -> (x.getLong(3), x.getLong(4))).toMap
    assert(byId("p1") === ((20000000L, 0L)), "equal-ts view matches (inclusive bound)")
    assert(byId("p2") === ((20000000L, 10000000L)), "latest prior view wins")
    assert(byId("p3") === ((-1L, -1L)), "no prior view → -1 sentinels")
  }

  test("e8: every purchase attributed once; latency non-negative on sf data") {
    val a = EventsBatch.asOfAttribution(spark, sfDir).cache()
    try {
      val purchases = graft.model.Tables.events(spark, sfDir)
        .filter(col("event_type") === "purchase").count()
      assert(a.count() === purchases)
      assert(a.select(countDistinct(col("event_id"))).head.getLong(0) === purchases)
      assert(a.filter(col("view_us") =!= -1L && col("latency_us") < 0).count() === 0)
      assert(a.filter(col("view_us") === -1L && col("latency_us") =!= -1L).count() === 0)
    } finally a.unpersist()
  }

  test("a26: lossy rollup never exceeds exact; bias is the difference") {
    val b = graft.etl.ProductDaily.rollupBias(spark, sfDir)
    assert(b.filter(col("lossy_revenue") > col("exact_revenue")).count() === 0)
    assert(b.filter(abs(col("underreported") -
      (col("exact_revenue") - col("lossy_revenue"))) > 1e-6).count() === 0)
  }

  test("e13: growth accounting matches an exact in-process decomposition " +
    "and the churn identity") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val raw = Tables.events(spark, sfDir).select("user_id", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
      .distinct
    val byUser = raw.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2).sortBy(_.toEpochDay)
    }
    val statuses = byUser.toSeq.flatMap { case (_, days) =>
      days.zipWithIndex.map { case (d, i) =>
        val st =
          if (i == 0) "new"
          else if (d.toEpochDay - days(i - 1).toEpochDay == 1) "retained"
          else "resurrected"
        (d.format(fmt), st)
      }
    }
    val expect = statuses.groupBy(_._1).map { case (d, rs) =>
      d -> (rs.length.toLong,
        rs.count(_._2 == "new").toLong,
        rs.count(_._2 == "retained").toLong,
        rs.count(_._2 == "resurrected").toLong)
    }
    val res = EventsBatch.growthAccounting(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (act, nw, ret, rsr) = expect(r.getAs[String]("event_date"))
      assert(r.getAs[Long]("n_active") === act)
      assert(r.getAs[Long]("n_new") === nw)
      assert(r.getAs[Long]("n_retained") === ret)
      assert(r.getAs[Long]("n_resurrected") === rsr)
      // activity partitions into the three classes
      assert(act === nw + ret + rsr)
    }
    // every user is new exactly once
    assert(res.map(_.getAs[Long]("n_new")).sum === byUser.size.toLong)
    // churn identity against the previous adjacent day
    val byDate = res.sortBy(_.getAs[String]("event_date"))
    byDate.sliding(2).foreach {
      case Array(prev, cur) =>
        val adjacent = java.time.LocalDate.parse(cur.getAs[String]("event_date"))
          .toEpochDay - java.time.LocalDate.parse(
            prev.getAs[String]("event_date")).toEpochDay == 1
        if (adjacent)
          assert(cur.getAs[Long]("n_churned") ===
            prev.getAs[Long]("n_active") - cur.getAs[Long]("n_retained"))
        else assert(cur.isNullAt(cur.fieldIndex("n_churned")))
      case _ =>
    }
    assert(byDate.head.isNullAt(byDate.head.fieldIndex("n_churned")))
  }

  test("e14: transition matrix matches in-process bigram counts; " +
    "rows and probabilities conserve") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val raw = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[java.sql.Timestamp]("ts").getTime,
          r.getAs[java.sql.Timestamp]("ts").getNanos,
          r.getAs[Long]("event_id")),
        r.getAs[String]("event_type")))
    val bigrams = raw.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(_._2).map(_._3)
      seq.zip(seq.drop(1))
    }
    val expect = bigrams.groupBy(identity).map { case (p, rs) => p -> rs.length.toLong }
    val res = EventsBatch.eventTransitions(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val key = (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
      assert(expect(key) === r.getAs[Long]("n_trans"))
    }
    // one transition per consecutive pair: Σ n_trans = Σ_users (n_u − 1)
    val users = raw.groupBy(_._1)
    assert(res.map(_.getAs[Long]("n_trans")).sum ===
      users.map(_._2.length.toLong - 1).sum)
    // each from-row's probabilities sum to 1 (exact rationals in double)
    res.groupBy(_.getAs[String]("from_type")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("p_trans")).sum - 1.0) < 1e-9)
    }
  }

  test("e15: rolling series equals an in-process trailing-window " +
    "recomputation over the full day spine") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val active = Tables.events(spark, sfDir).select("user_id", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate.toEpochDay))
      .distinct
    val (lo, hi) = (active.map(_._2).min, active.map(_._2).max)
    val expect = (lo to hi).map { w =>
      java.time.LocalDate.ofEpochDay(w).format(fmt) ->
        active.filter(a => a._2 >= w - 6 && a._2 <= w).map(_._1).distinct.length.toLong
    }.toMap
    val res = EventsBatch.rollingDistinct(spark, sfDir).collect()
    // every calendar day in [lo, hi] appears exactly once
    assert(res.length === (hi - lo + 1).toInt)
    res.foreach { r =>
      assert(r.getAs[Long]("n_active_7d") ===
        expect(r.getAs[String]("window_day")))
    }
  }

  test("a30: OLS fit matches an exact-moment in-process recomputation " +
    "bit-for-bit; R^2 bounded") {
    import graft.analytics.Trends
    import graft.etl.StoreDaily
    val sd = StoreDaily.rollupDec(spark, sfDir)
      .select("store_id", "sale_date", "gross_dec", "disc_dec").collect()
      .map { r =>
        (r.getAs[String]("store_id"),
          java.time.LocalDate.parse(r.getAs[String]("sale_date")).toEpochDay,
          (r.getAs[java.math.BigDecimal]("gross_dec").subtract(
            r.getAs[java.math.BigDecimal]("disc_dec"))).setScale(2))
      }
    val expect = sd.groupBy(_._1).map { case (store, rows) =>
      val minD = rows.map(_._2).min
      val xs = rows.map(r => BigDecimal(r._2 - minD))
      // integer cents, mirroring the operator's scale-0 moment discipline
      val ys = rows.map(r => BigDecimal(r._3) * 100)
      val n = rows.length
      val (sx, sxx, mx) = (xs.sum, xs.map(x => x * x).sum, xs.map(_.toLong).max)
      val (syC, sxyC, syyC) =
        (ys.sum, xs.zip(ys).map { case (x, y) => x * y }.sum,
          ys.map(y => y * y).sum)
      val (sy, sxy, syy) =
        (syC.toDouble / 100.0, sxyC.toDouble / 100.0, syyC.toDouble / 10000.0)
      val nD = n.toDouble
      val varx = sxx.toDouble - sx.toDouble * sx.toDouble / nD
      val covxy = sxy - sx.toDouble * sy / nD
      val vary = syy - sy * sy / nD
      val slope = if (varx == 0.0) None else Some(covxy / varx)
      val intercept = slope.map(s => sy / nD - s * (sx.toDouble / nD))
      val r2 = if (varx == 0.0 || vary == 0.0) None
        else Some(covxy * covxy / (varx * vary))
      val forecast = slope.map(s => s * (mx + 1).toDouble + intercept.get)
      store -> (n.toLong, slope, intercept, r2, forecast)
    }
    val res = Trends.salesTrendOls(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (n, slope, intercept, r2, forecast) = expect(r.getAs[String]("store_id"))
      assert(r.getAs[Long]("n_days") === n)
      def cmp(col: String, want: Option[Double]): Unit = want match {
        case Some(v) => assert(r.getAs[Double](col) === v, col)
        case None => assert(r.isNullAt(r.fieldIndex(col)), col)
      }
      cmp("slope", slope); cmp("intercept", intercept)
      cmp("r2", r2); cmp("forecast_next", forecast)
      r2.foreach(v => assert(v >= 0.0 && v <= 1.0 + 1e-9))
    }
  }

  test("e16: medians are exact nearest-rank picks; outliers are exactly " +
    "the > 3*MAD set") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val daily = Tables.events(spark, sfDir).select("ts", "event_type").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").toLocalDateTime
        .toLocalDate.format(fmt), r.getAs[String]("event_type")))
      .groupBy(identity).map { case ((d, t), rs) => (t, d, rs.length.toLong) }
      .toSeq
    def nearestRank(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.length + 1) / 2) - 1)
    }
    val med = daily.groupBy(_._1).map { case (t, rs) =>
      t -> nearestRank(rs.map(_._3))
    }
    val mad = daily.groupBy(_._1).map { case (t, rs) =>
      t -> nearestRank(rs.map(r => math.abs(r._3 - med(t))))
    }
    val res = EventsBatch.madOutliers(spark, sfDir).collect()
    assert(res.length === daily.length)
    res.foreach { r =>
      val t = r.getAs[String]("event_type")
      val dev = math.abs(r.getAs[Long]("n_events") - med(t))
      assert(r.getAs[Long]("med") === med(t))
      assert(r.getAs[Long]("mad") === mad(t))
      assert(r.getAs[Long]("abs_dev") === dev)
      assert(r.getAs[Boolean]("is_outlier") === (dev > 3 * mad(t)))
    }
  }

  test("x9: growth export joins its two green parents 1:1; stickiness " +
    "is DAU over trailing-7d AU, in (0, 1]") {
    import graft.export.Flatten
    import graft.streaming.EventsBatch
    val res = Flatten.exportGrowth(spark, sfDir).collect()
    val e13 = EventsBatch.growthAccounting(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_date") -> r.getAs[Long]("n_active")).toMap
    val e15 = EventsBatch.rollingDistinct(spark, sfDir).collect()
      .map(r => r.getAs[String]("window_day") -> r.getAs[Long]("n_active_7d")).toMap
    assert(res.length === e13.size)
    res.foreach { r =>
      val d = r.getAs[String]("date")
      assert(r.getAs[Long]("n_active") === e13(d))
      assert(r.getAs[Long]("n_active_7d") === e15(d))
      val stick = r.getAs[Double]("stickiness")
      assert(stick === e13(d).toDouble / e15(d).toDouble)
      // a day's actives are a subset of the window ending that day
      assert(stick > 0.0 && stick <= 1.0)
    }
  }

  test("a31: pair counts, lift and confidence recompute exactly from " +
    "in-process baskets; top-50 is the count-ranked prefix") {
    import graft.analytics.Kpis
    import graft.model.Tables
    val baskets = Tables.sales(spark, sfDir)
      .select("l_orderkey", "sku").distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("sku")))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val itemN = baskets.groupBy(_._2).map { case (s, rs) => s -> rs.length.toLong }
    val pairN = baskets.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val skus = rows.map(_._2).sorted
      for (i <- skus.indices; j <- i + 1 until skus.length)
        yield (skus(i), skus(j))
    }.groupBy(identity).map { case (p, rs) => p -> rs.length.toLong }
    val top = pairN.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(50)
    val res = Kpis.basketAffinity(spark, sfDir).collect()
    assert(res.length === top.length)
    res.zip(top).foreach { case (r, ((a, b), n)) =>
      assert(r.getAs[Long]("sku_a") === a)
      assert(r.getAs[Long]("sku_b") === b)
      assert(r.getAs[Long]("pair_n") === n)
      assert(r.getAs[Long]("n_a") === itemN(a))
      assert(r.getAs[Long]("n_b") === itemN(b))
      assert(r.getAs[Long]("n_orders") === nOrders)
      assert(n <= math.min(itemN(a), itemN(b)))
      assert(r.getAs[Double]("lift") ===
        (n * nOrders).toDouble / (itemN(a) * itemN(b)).toDouble)
      assert(r.getAs[Double]("conf_a_to_b") === n.toDouble / itemN(a).toDouble)
    }
  }

  test("v22: predictions are the majority label of the exact top-k, ties " +
    "to the smallest label") {
    import graft.vector.Similarity
    val labels = graft.model.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong).toMap
    val topk = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
    val expect = topk.groupBy(_._1).map { case (q, rs) =>
      val votes = rs.map(r => labels(r._2)).groupBy(identity)
        .map { case (l, vs) => l -> vs.length.toLong }
      val (pred, n) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      q -> (pred, n, labels(q))
    }
    val res = Similarity.knnClassify(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (pred, n, truth) = expect(r.getAs[Long]("query_id"))
      assert(r.getAs[Long]("pred_label") === pred)
      assert(r.getAs[Long]("n_votes") === n)
      assert(r.getAs[Long]("true_label") === truth)
      assert(r.getAs[Boolean]("is_correct") === (pred == truth))
    }
  }

  test("e17: burst runs recompute exactly from per-user gap sequences; " +
    "flags follow the documented rule") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val raw = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000 +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000 % 1000,
        r.getAs[Long]("event_id")))
    val expect = raw.groupBy(_._1).map { case (u, rows) =>
      val us = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = us.zip(us.drop(1)).map { case (a, b) => b - a }
      val runs = {
        val flags = gaps.map(_ < 1000000L)
        val out = collection.mutable.ArrayBuffer[Long]()
        var cur = 0L
        flags.foreach { f =>
          if (f) cur += 1
          else { if (cur > 0) out += cur; cur = 0 }
        }
        if (cur > 0) out += cur
        out.toSeq
      }
      u -> (gaps.length.toLong, gaps.min, runs.length.toLong,
        if (runs.isEmpty) 0L else runs.max, runs.sum)
    }
    val res = EventsBatch.burstDetection(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val (nGaps, minGap, nRuns, longest, pairs) = expect(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_gaps") === nGaps)
      assert(r.getAs[Long]("min_gap_us") === minGap)
      assert(r.getAs[Long]("n_runs") === nRuns)
      assert(r.getAs[Long]("longest_run") === longest)
      assert(r.getAs[Long]("n_burst_pairs") === pairs)
      assert(r.getAs[Boolean]("is_suspect") ===
        (longest >= 5L || pairs * 2 > nGaps))
    }
  }

  test("k5: correlations match exact-moment in-process recomputation " +
    "bit-for-bit; all within [-1, 1]; price tracks quantity") {
    import graft.analytics.Profile
    import graft.model.Tables
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map { r =>
        (r.getAs[Double]("l_quantity").toLong,
          (BigDecimal(r.getAs[Double]("l_discount"))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong,
          (BigDecimal(r.getAs[Double]("l_extendedprice"))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt)
      }
    val n = rows.length.toDouble
    def corr(xs: Array[BigInt], ys: Array[BigInt]): Double = {
      def s(v: Iterator[BigInt]) = v.sum
      val (sx, sy) = (s(xs.iterator), s(ys.iterator))
      val sxx = s(xs.iterator.map(x => x * x))
      val syy = s(ys.iterator.map(y => y * y))
      val sxy = s(xs.zip(ys).iterator.map { case (x, y) => x * y })
      val varx = sxx.toDouble - sx.toDouble * sx.toDouble / n
      val vary = syy.toDouble - sy.toDouble * sy.toDouble / n
      val covxy = sxy.toDouble - sx.toDouble * sy.toDouble / n
      covxy / math.sqrt(varx * vary)
    }
    val q = rows.map(r => BigInt(r._1))
    val dd = rows.map(r => BigInt(r._2))
    val p = rows.map(_._3)
    val expect = Map(
      "quantity_discount" -> corr(q, dd),
      "quantity_price" -> corr(q, p),
      "discount_price" -> corr(dd, p))
    val res = Profile.corrMatrix(spark, sfDir).collect()
    assert(res.length === 3)
    res.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(r.getAs[Long]("n") === rows.length.toLong)
      assert(c === expect(r.getAs[String]("pair")))
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("a32: cumulative shares recompute exactly; flag flips once at " +
    "the 80% crossing") {
    import graft.analytics.Trends
    import graft.etl.StoreDaily
    val net = StoreDaily.rollupDec(spark, sfDir)
      .select("store_id", "gross_dec", "disc_dec").collect()
      .map(r => r.getAs[String]("store_id") ->
        (BigDecimal(r.getAs[java.math.BigDecimal]("gross_dec")) -
          BigDecimal(r.getAs[java.math.BigDecimal]("disc_dec"))))
      .groupBy(_._1).map { case (s, rs) =>
        s -> (rs.map(_._2).sum * 100).toBigInt
      }
    val total = net.values.sum
    val ranked = net.toSeq.sortBy { case (s, c) => (-c, s) }
    val cums = ranked.scanLeft(BigInt(0))(_ + _._2).drop(1)
    val res = Trends.paretoStores(spark, sfDir).collect()
    assert(res.length === ranked.length)
    res.zip(ranked.zip(cums)).foreach { case (r, ((store, c), cum)) =>
      assert(r.getAs[String]("store_id") === store)
      assert(r.getAs[Double]("net_revenue") === c.toDouble / 100.0)
      assert(r.getAs[Double]("revenue_share") === c.toDouble / total.toDouble)
      assert(r.getAs[Double]("cum_share") === cum.toDouble / total.toDouble)
      assert(r.getAs[Boolean]("cum_reached_80") === (cum * 5 >= total * 4))
    }
    // the flag is monotone: false* then true*
    val flags = res.map(_.getAs[Boolean]("cum_reached_80"))
    assert(flags.dropWhile(!_).forall(identity))
    assert(flags.last)
  }

  test("e18: lateness buckets recompute from an in-process arrival " +
    "running max; bucket mass covers the stream") {
    import graft.streaming.EventsBatch
    import graft.model.Tables
    val rows = Tables.events(spark, sfDir).select("event_id", "ts").collect()
      .map(r => (r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000 +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000 % 1000))
      .sortBy(_._1)
    var hwm = Long.MinValue
    val lates = rows.map { case (_, us) =>
      hwm = math.max(hwm, us)
      hwm - us
    }
    val expect = lates.map { l =>
      if (l == 0L) -1L else 63L - java.lang.Long.numberOfLeadingZeros(l)
    }.groupBy(identity).map { case (b, ls) => b -> ls.length.toLong }
    val res = EventsBatch.latenessAudit(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      assert(r.getAs[Long]("n_events") === expect(r.getAs[Long]("bucket")))
      assert(r.getAs[Long]("min_late_us") <= r.getAs[Long]("max_late_us"))
    }
    assert(res.map(_.getAs[Long]("n_events")).sum === rows.length.toLong)

    // the synthetic log arrives in order (all on-time); drive the late
    // paths with a deterministic out-of-order fixture
    import spark.implicits._
    val fixture = (1L to 200L).map { id =>
      // every 7th event arrives well behind the high-water mark (delays
      // span ~1 ms .. ~500 s, far past the 1 s inter-event step)
      val base = id * 1000000L
      val us =
        if (id % 7 == 0) base - ((1L << (id % 20).toInt) * 1000L + 3) else base
      (id, us)
    }
    val fdf = fixture.toDF("event_id", "us")
    var fh = Long.MinValue
    val flates = fixture.sortBy(_._1).map { case (_, us) =>
      fh = math.max(fh, us); fh - us
    }
    val fexpect = flates.map { l =>
      if (l == 0L) -1L else 63L - java.lang.Long.numberOfLeadingZeros(l)
    }.groupBy(identity).map { case (b, ls) => b -> ls.length.toLong }
    val fres = EventsBatch.latenessAuditOf(fdf).collect()
    assert(fres.length === fexpect.size)
    assert(fres.length > 3, "fixture must exercise multiple late buckets")
    fres.foreach { r =>
      assert(r.getAs[Long]("n_events") === fexpect(r.getAs[Long]("bucket")))
    }

    // the block-decomposed running max is bit-identical at ANY block
    // size: blockBits=2/4 split the 200-id fixture into 50/13 blocks
    // (carry-in crosses many boundaries), 40 leaves one block (the
    // degenerate single-window regime)
    for (bits <- Seq(2, 4, 40)) {
      val bres = EventsBatch.latenessAuditOf(fdf, blockBits = bits)
        .collect()
      assert(bres.length === fexpect.size, s"blockBits=$bits row count")
      bres.foreach { r =>
        assert(r.getAs[Long]("n_events") === fexpect(r.getAs[Long]("bucket")),
          s"blockBits=$bits bucket ${r.getAs[Long]("bucket")}")
      }
    }
  }

  test("t22: corrections match an in-process SymSpell replay; clean " +
    "entities resolve to themselves at distance 0") {
    import graft.text.TextAnalysis
    val docs = graft.text.Corpus.docsTok(spark, sfDir)
      .select("doc_id", "words").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("words"))
    val vocab = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, rs) => w -> rs.length.toLong }
    def dirtyOf(id: Long, w: String): String =
      if (id % 3 == 0 && w.length > 2) {
        val p = (id % w.length).toInt
        w.substring(0, p) + w.substring(p + 1)
      } else w
    def dels(s: String): Set[String] =
      (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))
        .toSet + s
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocabKeys = vocab.keys.flatMap(w => dels(w).map(_ -> w))
      .groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).toSet }
    def bestOf(entity: String): Option[(String, Int)] = {
      val cands = dels(entity).flatMap(k => vocabKeys.getOrElse(k, Set.empty))
        .map(w => (w, lev(entity, w))).filter(_._2 <= 1)
      if (cands.isEmpty) None
      else Some {
        val b = cands.minBy { case (w, d) => (d, -vocab(w), w) }
        (b._1, b._2)
      }
    }
    val res = TextAnalysis.spellCorrect(spark, sfDir).collect()
    assert(res.length === docs.length)
    res.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val entity = dirtyOf(id, docs.toMap.apply(id).head)
      assert(r.getAs[String]("entity") === entity)
      bestOf(entity) match {
        case Some((w, d)) =>
          assert(r.getAs[String]("corrected") === w)
          assert(r.getAs[Long]("distance") === d.toLong)
          assert(r.getAs[Boolean]("matched"))
        case None =>
          assert(r.getAs[String]("corrected") === entity)
          assert(r.getAs[Long]("distance") === -1L)
          assert(!r.getAs[Boolean]("matched"))
      }
      // a clean entity is a vocabulary word: identity at distance 0
      if (entity == docs.toMap.apply(id).head) {
        assert(r.getAs[Long]("distance") === 0L)
        assert(r.getAs[String]("corrected") === entity)
      }
    }
    // synthetic typos exist and get corrected at distance 1
    assert(res.exists(_.getAs[Long]("distance") === 1L))
  }

  test("a33: rollup subtotals conserve at every level; row counts " +
    "partition into cells + store subtotals + the grand total") {
    import graft.analytics.Kpis
    val res = Kpis.rollupCube(spark, sfDir).collect()
    val cells = res.filter(r => r.getAs[String]("store_level") != "ALL" &&
      r.getAs[String]("month_level") != "ALL")
    val storeSub = res.filter(r => r.getAs[String]("store_level") != "ALL" &&
      r.getAs[String]("month_level") == "ALL")
      .map(r => r.getAs[String]("store_level") ->
        (r.getAs[Double]("total_sales"), r.getAs[Long]("n_tx"),
          r.getAs[Long]("n_cells"))).toMap
    val grand = res.filter(r => r.getAs[String]("store_level") == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getAs[String]("month_level") === "ALL")
    assert(res.length === cells.length + storeSub.size + 1)
    // integer conservation (exact): tx and cell counts roll up exactly
    cells.groupBy(_.getAs[String]("store_level")).foreach { case (s, rs) =>
      val (_, nTx, nCells) = storeSub(s)
      assert(rs.map(_.getAs[Long]("n_tx")).sum === nTx)
      assert(rs.map(_.getAs[Long]("n_cells")).sum === nCells)
    }
    assert(storeSub.values.map(_._2).sum === grand.head.getAs[Long]("n_tx"))
    // money conserves to the cent (doubles are exact-decimal casts)
    def cents(d: Double) = math.round(d * 100)
    cells.groupBy(_.getAs[String]("store_level")).foreach { case (s, rs) =>
      assert(rs.map(r => cents(r.getAs[Double]("total_sales"))).sum ===
        cents(storeSub(s)._1))
    }
  }

  test("v26: cell audit conserves the corpus; scan fraction bounded below " +
    "by the uniform ideal") {
    import graft.vector.Similarity
    import graft.model.Tables
    val nCells = 8
    val rows = Similarity.cellBalance(spark, sfDir, nCells).collect()
    val corpus = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum === corpus)
    rows.foreach { r =>
      assert(r.getAs[Long]("share_milli") >= 0 &&
        r.getAs[Long]("share_milli") <= 1000)
      assert(r.getAs[Long]("dev_from_uniform_milli") >= -1000)
    }
    // expected scan fraction minimized by the uniform layout: >= 1/nCells
    val scan = rows.head.getAs[Long]("expected_scan_milli")
    assert(rows.forall(_.getAs[Long]("expected_scan_milli") == scan))
    assert(scan >= 1000L / nCells - 1 && scan <= 1000L)
    // exact recomputation of the scalar from the per-cell counts
    val ns = rows.map(_.getAs[Long]("n_vectors"))
    assert(scan === ns.map(n => n * n).sum * 1000 / (corpus * corpus))
  }

  test("v27: full-dimension row certifies recall exactly 1000; milli " +
    "shares reproduce from hit counts") {
    import graft.vector.Similarity
    val rows = Similarity.dimTruncationRecall(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("dim"))
    assert(rows.map(_.getAs[Long]("dim")).toSeq === Seq(8L, 16L, 32L, 64L))
    val full = rows.last
    assert(full.getAs[Long]("recall_milli") === 1000L,
      "the d=max row scores the truth against itself and must be exact")
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_milli") >= 0 &&
        r.getAs[Long]("recall_milli") <= 1000)
      // k=5 x nQueries=10: the milli share is exactly hits*1000 div 50
      assert(r.getAs[Long]("recall_milli") === r.getAs[Long]("n_hits") * 1000 / 50)
    }
  }

  test("d23: template passages reproduce from an in-process " +
    "positioned-shingle run-collapse") {
    import graft.text.Corpus
    val docs = Corpus.docsTok(spark, sfDir)
      .select(col("doc_id"), col("words")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val positioned = docs.flatMap { case (id, ws) =>
      if (ws.length >= 3)
        (1 to ws.length - 2).map(p => (id, p, ws.slice(p - 1, p + 2).mkString(" ")))
      else Seq.empty
    }
    val freq = positioned.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 5).keySet
    val passages = docs.flatMap { case (id, ws) =>
      val fpos = positioned.filter(t => t._1 == id && freq(t._3)).map(_._2).sorted
      // maximal consecutive runs
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (start, len)
      fpos.foreach { p =>
        runs.lastOption match {
          case Some((s, l)) if s + l == p => runs(runs.length - 1) = (s, l + 1)
          case _ => runs += ((p, 1))
        }
      }
      runs.filter(_._2 >= 2).map { case (s, l) =>
        (id, ws.slice(s - 1, s + l + 1).mkString(" "), l + 2)
      }
    }
    val expected = passages.groupBy(p => (p._2, p._3)).collect {
      case ((text, span), occ) if occ.map(_._1).distinct.size >= 2 =>
        (text, span.toLong, occ.map(_._1).distinct.size.toLong,
          occ.size.toLong, occ.map(_._1).min)
    }.toSeq.sortBy(t => (-t._3, t._1)).take(20)
    val got = Dedup.templatePassages(spark, sfDir).collect()
      .map(r => (r.getAs[String]("passage"), r.getAs[Long]("span_tokens"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("example_doc"))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("e22: windowed funnel is contained in e6's unbounded funnel; gaps " +
    "respect the window bound") {
    val unbounded = EventsBatch.funnel(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Boolean]("reached_click"), r.getAs[Boolean]("reached_purchase")))
      .toMap
    val windowUs = 1800000000L
    val rows = EventsBatch.windowedFunnel(spark, sfDir, windowUs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uClick, uPurchase) = unbounded(r.getAs[Long]("user_id"))
      // a windowed conversion implies the unbounded one
      if (r.getAs[Boolean]("reached_click")) assert(uClick)
      if (r.getAs[Boolean]("reached_purchase")) assert(uPurchase)
      // surviving gaps are positive and within the window
      if (!r.isNullAt(r.fieldIndex("view_to_click_us"))) {
        val g = r.getAs[Long]("view_to_click_us")
        assert(g > 0 && g <= windowUs)
      }
      if (!r.isNullAt(r.fieldIndex("click_to_purchase_us"))) {
        val g = r.getAs[Long]("click_to_purchase_us")
        assert(g > 0 && g <= windowUs)
      }
    }
    // the window bound actually bites somewhere (else the key is e6)
    val windowedConv = rows.count(_.getAs[Boolean]("reached_purchase"))
    val unboundedConv = unbounded.values.count(_._2)
    assert(windowedConv <= unboundedConv)
  }

  test("t26: domain surprisal conserves tokens, flags the reference, and " +
    "reproduces from an in-process scoring pass") {
    import graft.text.{Corpus, TextAnalysis}
    val ref = "src0"
    // in-process: fit capped LM on the reference source, score all
    val docs = Corpus.docsTok(spark, sfDir)
      .select(col("lang"), col("source"), col("doc_id"), col("words"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getSeq[String](3)))
    val fitTokens = docs.filter(_._2 == ref).flatMap(_._4)
    val total = fitTokens.length.toLong
    val oov = 63L - java.lang.Long.numberOfLeadingZeros(total)
    val lm = fitTokens.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(TextAnalysis.lmVocabCap)
      .map { case (w, c) =>
        w -> (63L - java.lang.Long.numberOfLeadingZeros(total / c)) }.toMap
    val expected = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val toks = ds.flatMap(_._4)
      val bits = toks.map(w => lm.getOrElse(w, oov)).sum
      k -> ((ds.map(_._3).distinct.length.toLong, toks.length.toLong, bits))
    }
    val got = TextAnalysis.domainSurprisal(spark, sfDir).collect()
    assert(got.length === expected.size)
    var tokenSum = 0L
    got.foreach { r =>
      val (nd, nt, sb) = expected((r.getAs[String]("lang"), r.getAs[String]("source")))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("n_tokens") === nt)
      assert(r.getAs[Long]("sum_bits") === sb)
      assert(r.getAs[Double]("bits_per_token") === sb.toDouble / nt.toDouble)
      assert(r.getAs[Boolean]("is_reference") === (r.getAs[String]("source") == ref))
      tokenSum += nt
    }
    assert(tokenSum === docs.map(_._4.length.toLong).sum)
  }

  test("p17: budget selection keeps whole levels above the line, fills the " +
    "boundary by hash, and never overshoots on full levels") {
    import graft.text.CorpusPrep
    val rows = CorpusPrep.budgetSelect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, docs) =>
      val total = docs.map(_.getAs[Long]("n_tokens")).sum
      val budget = total * 500 / 1000
      // per-level verdicts re-derive from the level masses
      val levels = docs.groupBy(_.getAs[Long]("quality_score")).map {
        case (q, ds) => q -> ds.map(_.getAs[Long]("n_tokens")).sum
      }
      var cum = 0L
      levels.toSeq.sortBy(-_._1).foreach { case (q, mass) =>
        val expected =
          if (cum + mass <= budget) "full"
          else if (cum >= budget) "drop"
          else "partial"
        docs.filter(_.getAs[Long]("quality_score") == q).foreach { d =>
          assert(d.getAs[String]("level_verdict") === expected)
          val kept = d.getAs[Boolean]("kept")
          expected match {
            case "full" => assert(kept)
            case "drop" => assert(!kept)
            case _ =>
              val fill = (budget - cum) * 1000000 / mass
              assert(kept === (d.getAs[Long]("budget_bucket") < fill))
          }
        }
        cum += mass
      }
      // full levels alone never exceed the budget
      val fullTokens = docs.filter(_.getAs[String]("level_verdict") == "full")
        .map(_.getAs[Long]("n_tokens")).sum
      assert(fullTokens <= budget)
    }
    // the boundary fill is exercised somewhere in the corpus
    assert(rows.exists(_.getAs[String]("level_verdict") == "partial"))
  }

  test("v28: donor rows equal v6's ivf eval; trained path is deterministic " +
    "across invocations") {
    import graft.vector.Similarity
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("method"), r.getAs[Long]("query_id"),
        r.getAs[Long]("n_truth"), r.getAs[Long]("n_hits"),
        r.getAs[Double]("recall"))
    val a = Similarity.trainedRecall(spark, sfDir).collect().map(key).toSeq
    val b = Similarity.trainedRecall(spark, sfDir).collect().map(key).toSeq
    assert(a === b, "trained path must be bit-deterministic across runs")
    val donor = a.filter(_._1 == "donor")
      .map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1)
    val v6ivf = Similarity.annRecall(spark, sfDir).collect()
      .filter(_.getAs[String]("method") == "ivf")
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_truth"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).sortBy(_._1).toSeq
    assert(donor === v6ivf,
      "the donor configuration is v6's shipped index — evals must agree")
  }

  test("a35: RFM scores and segments re-derive from the raw per-customer " +
    "aggregates") {
    import graft.analytics.Kpis
    import graft.model.Tables
    val rows = Kpis.customerRfm(spark, sfDir).collect()
    assert(rows.length ===
      Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
    rows.foreach { r =>
      val rec = r.getAs[Long]("recency_days")
      val f = r.getAs[Long]("frequency")
      val m = r.getAs[Long]("monetary_cents")
      val rs = if (rec <= 90) 4L else if (rec <= 180) 3L else if (rec <= 365) 2L else 1L
      val fs = if (f >= 12) 4L else if (f >= 10) 3L else if (f >= 8) 2L else 1L
      val ms = if (m >= 300000000L) 4L else if (m >= 240000000L) 3L
        else if (m >= 180000000L) 2L else 1L
      assert(r.getAs[Long]("r_score") === rs)
      assert(r.getAs[Long]("f_score") === fs)
      assert(r.getAs[Long]("m_score") === ms)
      assert(r.getAs[Long]("rfm") === rs * 100 + fs * 10 + ms)
      val seg =
        if (rs == 4 && fs >= 3 && ms >= 3) "champion"
        else if (fs >= 3) "loyal"
        else if (ms >= 3) "big_spender"
        else if (rs <= 2 && fs >= 2) "at_risk"
        else if (rs == 1) "dormant"
        else "casual"
      assert(r.getAs[String]("segment") === seg)
      assert(rec >= 0 && f > 0 && m > 0)
    }
  }

  test("h2: RRF fusion reproduces from the two parent rankings") {
    import graft.vector.Similarity
    val lex = TextAnalysis.bm25(spark, sfDir, 3, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("rank")).toMap
    val sem = Similarity.cosineTopK(spark, sfDir, 10, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank").toLong).toMap
    val expected = (lex.keySet ++ sem.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq.map { k =>
          val score = lex.get(k).map(r => 60000L / (60 + r)).getOrElse(0L) +
            sem.get(k).map(r => 60000L / (60 + r)).getOrElse(0L)
          (q, k._2, score)
        }.sortBy(t => (-t._3, t._2)).zipWithIndex
          .filter(_._2 < 5)
          .map { case ((qq, d, s), i) => (qq, i + 1L) -> ((d, s)) }
    }
    val got = Similarity.rrfFusion(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (d, s) = expected(
        (r.getAs[Long]("query_id"), r.getAs[Long]("fused_rank")))
      assert(r.getAs[Long]("doc") === d)
      assert(r.getAs[Long]("rrf_milli") === s)
      // surviving parent ranks surface unchanged
      val k = (r.getAs[Long]("query_id"), d)
      assert(Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long]) === lex.get(k))
      assert(Option(r.getAs[Any]("sem_rank")).map(_.asInstanceOf[Long]) === sem.get(k))
    }
  }

  test("sk11: every mask width is one-sided; FPR reproduces from counts; " +
    "the widest mask agrees with sk8's ledger") {
    import graft.analytics.Sketches
    val rows = Sketches.bloomSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("m_bits"))
    assert(rows.map(_.getAs[Long]("m_bits")).toSeq ===
      Seq(4096L, 8192L, 16384L, 32768L, 65536L))
    rows.foreach { r =>
      // a Bloom filter never drops a true match
      assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_true_match"))
      assert(r.getAs[Long]("n_false_pos") ===
        r.getAs[Long]("n_pass") - r.getAs[Long]("n_true_match"))
      assert(r.getAs[Long]("fpr_milli") ===
        r.getAs[Long]("n_false_pos") * 1000 /
          (r.getAs[Long]("n_probe") - r.getAs[Long]("n_true_match")))
    }
    // 16x more bits cannot hurt at these populations
    assert(rows.head.getAs[Long]("fpr_milli") >=
      rows.last.getAs[Long]("fpr_milli"))
    // the driver-side fold is bit-identical to a from-scratch build at
    // every width (the nesting property the one-pass sweep rests on)
    import org.apache.spark.sql.functions.col
    val build = graft.model.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("h")).distinct()
    val wide = Sketches.bloomMaskOf(build, 65536L)
    Seq(4096L, 8192L, 16384L, 32768L).foreach { m =>
      assert(Sketches.foldMask(wide, m)
        .sameElements(Sketches.bloomMaskOf(build, m)), s"width $m")
    }
    // the m=65536 row IS sk8's configuration: totals must agree
    val sk8 = Sketches.bloomPrune(spark, sfDir).collect()
    val widest = rows.last
    assert(widest.getAs[Long]("n_probe") ===
      sk8.map(_.getAs[Long]("n_probe")).sum)
    assert(widest.getAs[Long]("n_pass") ===
      sk8.map(_.getAs[Long]("n_bloom_pass")).sum)
    assert(widest.getAs[Long]("n_true_match") ===
      sk8.map(_.getAs[Long]("n_true_match")).sum)
    assert(widest.getAs[Long]("n_false_pos") ===
      sk8.map(_.getAs[Long]("n_false_pos")).sum)
  }

  test("x10: table-health card agrees with k9 and the raw table counts") {
    import graft.model.Tables
    val card = graft.export.Flatten.exportTableHealth(spark, sfDir)
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
    assert(card.size === 7)
    assert(card("lineitem").getAs[Long]("n_rows") ===
      Tables.lineitem(spark, sfDir).count())
    assert(card("region").getAs[Long]("n_rows") ===
      Tables.region(spark, sfDir).count())
    assert(card("lineitem").getAs[Long]("n_fk_edges") === 3L)
    Seq("part", "region", "supplier").foreach { t =>
      assert(card(t).getAs[String]("health") === "no_fk")
      assert(card(t).getAs[Long]("n_fk_edges") === 0L)
    }
    val audits = Profile.fkIntegrity(spark, sfDir).collect()
    val cleanByChild = audits.groupBy(_.getAs[String]("edge_name").split("_")(0))
    cleanByChild.foreach { case (child, edges) =>
      val expected =
        if (edges.forall(_.getAs[String]("verdict") == "ok")) "ok"
        else "violations"
      assert(card(child).getAs[String]("health") === expected)
    }
  }

  test("t24: Good-Turing table reproduces from an in-process shingle count; " +
    "GT identities hold") {
    import graft.text.{Corpus, TextAnalysis}
    // in-process shingle multiset counts from the same tokenization
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Corpus.docsTok(spark, sfDir).select(col("words")).collect().foreach { r =>
      val ws = r.getSeq[String](0)
      if (ws.length >= 3)
        ws.sliding(3).foreach(s =>
          counts.updateWith(s.mkString(" "))(c => Some(c.getOrElse(0L) + 1)))
    }
    val nR = counts.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val total = counts.values.sum
    val p0 = nR.getOrElse(1L, 0L) * 1000 / total
    val rows = TextAnalysis.goodTuring(spark, sfDir).collect()
    rows.foreach { r =>
      val rr = r.getAs[Long]("r")
      assert(r.getAs[Long]("n_r") === nR(rr))
      assert(r.getAs[Long]("n_r_next") === nR(rr + 1))
      assert(r.getAs[Long]("r_star_milli") ===
        (rr + 1) * nR(rr + 1) * 1000 / nR(rr))
      assert(r.getAs[Long]("discount_milli") ===
        (rr + 1) * nR(rr + 1) * 1000 / (nR(rr) * rr))
      assert(r.getAs[Long]("unseen_mass_milli") === p0)
    }
    // every r with both N_r and N_{r+1} observed in 1..7 appears
    val expected = (1L to 7L).filter(r => nR.contains(r) && nR.contains(r + 1))
    assert(rows.map(_.getAs[Long]("r")).toSeq.sorted === expected)
  }

  test("t25: Zipf fit reproduces from an in-process spectrum suffix-sum OLS") {
    import graft.text.{Corpus, TextAnalysis}
    val byLang = scala.collection.mutable.Map.empty[(String, String), Long]
    Corpus.docsTok(spark, sfDir).select(col("lang"), col("words")).collect()
      .foreach { r =>
        val lang = r.getString(0); val ws = r.getSeq[String](1)
        if (ws.length >= 3)
          ws.sliding(3).foreach(s =>
            byLang.updateWith((lang, s.mkString(" ")))(c => Some(c.getOrElse(0L) + 1)))
      }
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val expected = byLang.groupBy(_._1._1).map { case (lang, m) =>
      val spec = m.values.groupBy(c => if (c <= 8) c else 1L << flog2(c))
        .map { case (b, xs) => b -> xs.size.toLong }
      val pts = spec.keys.toSeq.sorted.map { b =>
        val rank = spec.filter(_._1 >= b).values.sum
        (flog2(b), flog2(rank))
      }
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      lang -> (n, slope, (sy.toDouble - slope * sx.toDouble) / n.toDouble)
    }
    val got = TextAnalysis.zipfSlope(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, slope, icept) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_points") === n)
      assert(r.getAs[Double]("slope") === slope)
      assert(r.getAs[Double]("intercept") === icept)
    }
  }

  test("e20: daily session stats reproduce an exact in-process recomputation") {
    import graft.model.Tables
    // rebuild the sessions single-process from the raw events, then the
    // nearest-rank quantiles, and compare every output cell
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var sid = 0L
      var prev = Long.MinValue
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)] // (sid, us)
      sorted.foreach { case (_, _, us) =>
        if (prev == Long.MinValue || us / 1000000 - prev / 1000000 > 1800) sid += 1
        buf += ((user, sid, us))
        prev = us
      }
      buf.groupBy(t => (t._1, t._2)).map { case ((u, s), es) =>
        val uss = es.map(_._3)
        (u, s, es.size.toLong, (uss.max - uss.min) / 1000000,
          java.time.Instant.ofEpochSecond(uss.min / 1000000)
            .toString.substring(0, 10))
      }
    }
    def nearestRank(xs: Seq[Long], num: Int, den: Int): Long = {
      val n = xs.size
      xs.sorted.apply(((num.toLong * n + num) / den - 1).toInt)
    }
    val expected = sessions.groupBy(_._5).map { case (d, ss) =>
      val evCounts = ss.sortBy(s => (s._3, s._1, s._2)).map(_._3)
      val durs = ss.sortBy(s => (s._4, s._1, s._2)).map(_._4)
      d -> (ss.size.toLong, ss.map(_._1).distinct.size.toLong, ss.map(_._3).sum,
        ss.count(_._3 == 1).toLong * 1000 / ss.size,
        nearestRank(evCounts, 1, 2), nearestRank(evCounts, 9, 10),
        nearestRank(durs, 1, 2), nearestRank(durs, 9, 10))
    }
    val got = EventsBatch.sessionStats(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nS, nU, nE, bounce, p50e, p90e, p50d, p90d) =
        expected(r.getAs[String]("d"))
      assert(r.getAs[Long]("n_sessions") === nS)
      assert(r.getAs[Long]("n_users") === nU)
      assert(r.getAs[Long]("n_events") === nE)
      assert(r.getAs[Long]("bounce_milli") === bounce)
      assert(r.getAs[Long]("p50_events") === p50e)
      assert(r.getAs[Long]("p90_events") === p90e)
      assert(r.getAs[Long]("p50_duration_sec") === p50d)
      assert(r.getAs[Long]("p90_duration_sec") === p90d)
      assert(p50e <= p90e && p50d <= p90d)
    }
  }

  test("e21: power-user curve conserves users; cumulative column is the " +
    "suffix sum and starts at the full user base") {
    import graft.model.Tables
    val rows = EventsBatch.powerUserCurve(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("active_days"))
    val totalUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === totalUsers)
    // users_at_least(d) = sum of n_users over buckets >= d
    rows.zipWithIndex.foreach { case (r, i) =>
      val suffix = rows.drop(i).map(_.getAs[Long]("n_users")).sum
      assert(r.getAs[Long]("users_at_least") === suffix)
      assert(r.getAs[Long]("share_milli") ===
        r.getAs[Long]("n_users") * 1000 / totalUsers)
    }
    assert(rows.head.getAs[Long]("users_at_least") === totalUsers)
  }

  test("k9: TPC-H testdata is referentially intact; injected orphans and " +
    "null FKs are counted exactly") {
    import spark.implicits._
    val audit = Profile.fkIntegrity(spark, sfDir).collect()
    assert(audit.length === 6)
    audit.foreach(r => assert(r.getAs[String]("verdict") === "ok",
      s"${r.getAs[String]("edge_name")} unexpectedly has orphans"))
    // fixture: 2 orphan keys (one with 2 rows), 3 null-FK rows
    val child = Seq(
      (1L, "a"), (1L, "b"), (2L, "c"), (99L, "d"), (98L, "e"), (98L, "f"))
      .toDF("fk", "payload")
      .unionByName(Seq(("x"), ("y"), ("z")).toDF("payload")
        .withColumn("fk", lit(null).cast("long"))
        .select(col("fk"), col("payload")))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.fkEdge("t", child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("child_rows") === 9L)
    assert(r.getAs[Long]("null_fk_rows") === 3L)
    assert(r.getAs[Long]("orphan_keys") === 2L)
    assert(r.getAs[Long]("orphan_rows") === 3L)
    assert(r.getAs[String]("verdict") === "violations")
  }
}
