package graft

import org.apache.spark.sql.functions._

/** Exactness anchor for the t20 BPE trainer: an in-process reference
  * implementation of the same BATCHED training rule (frequency-weighted
  * adjacent-pair counts over the word dictionary; top-W candidates by
  * (count DESC, pair ASC); keep iff symbol-disjoint from every
  * higher-ranked candidate; greedy left-to-right non-overlapping
  * application) must reproduce the distributed merge table exactly —
  * plus the two batching contracts: equality with one-merge-per-round
  * training on a conflict-free fixture, and a conflict fixture proving
  * the compatibility rule defers overlapping pairs. */
class BpeSpec extends GraftSpec {

  private def applyMergeRef(syms: Vector[String], l: String,
                            r: String): Vector[String] = {
    val acc = Vector.newBuilder[String]
    var last: Option[String] = None
    syms.foreach { s =>
      if (last.contains(l) && s == r) { last = Some(l + r) }
      else { last.foreach(acc += _); last = Some(s) }
    }
    last.foreach(acc += _)
    acc.result()
  }

  private def pairCounts(dict: Map[Vector[String], Long])
      : Map[(String, String), Long] = {
    val counts = collection.mutable.Map[(String, String), Long]()
    dict.foreach { case (syms, f) =>
      syms.zip(syms.drop(1)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + f
      }
    }
    counts.toMap
  }

  private def toDict(words: Map[String, Long]): Map[Vector[String], Long] =
    words.toSeq.map { case (w, f) => w.toVector.map(_.toString) -> f }
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }

  /** The batched reference trainer — mirrors Bpe.train exactly. */
  private def referenceTrain(words: Map[String, Long], rounds: Int,
                             window: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var dict = toDict(words)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var grank = 0L
    for (_ <- 1 to rounds) {
      val counts = pairCounts(dict)
      if (counts.nonEmpty) {
        val cands = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.take(window)
        val kept = graft.text.Bpe.keepCompatible(cands)
        kept.foreach { case ((l, r), c) =>
          grank += 1
          out += ((grank, l, r, l + r, c))
        }
        kept.foreach { case ((l, r), _) =>
          dict = dict.toSeq
            .map { case (syms, f) => applyMergeRef(syms, l, r) -> f }
            .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }
        }
      }
    }
    out.result()
  }

  /** The pre-r11 one-merge-per-round trainer, kept as the equivalence
    * baseline for the conflict-free fixture. */
  private def sequentialTrain(words: Map[String, Long], nMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var dict = toDict(words)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = pairCounts(dict)
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank.toLong, l, r, l + r, c))
        dict = dict.toSeq
          .map { case (syms, f) => applyMergeRef(syms, l, r) -> f }
          .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }
      }
    }
    out.result()
  }

  test("t20: distributed merge table equals the in-process reference " +
    "trainer; best-pair counts are non-increasing") {
    val words = graft.text.Corpus.docsTok(spark, sfDir)
      .select(explode(col("words")).as("word"))
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (w, rs) => w -> rs.length.toLong }
    val want = referenceTrain(words, graft.text.Bpe.Rounds,
      graft.text.Bpe.BatchWindow)
    val got = graft.text.Bpe.train(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // batched BPE property: WITHIN a round counts are non-increasing
    // (kept pairs follow candidate rank), and each round's HEAD count
    // never exceeds the previous round's head (a created pair's count
    // is bounded by its parent merge's count). The interleaved global
    // sequence is NOT monotone — that is expected for batches.
    val byRound = want.map(_._5).foldLeft(Seq(Seq.empty[Long])) {
      (acc, c) =>
        if (acc.last.isEmpty || acc.last.last >= c) acc.init :+ (acc.last :+ c)
        else acc :+ Seq(c)
    }
    byRound.map(_.head).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "round-head counts must not increase")
      case _ =>
    }
    // merged symbol is the concatenation, ranks are 1..n
    got.foreach { case (_, l, r, m, _) => assert(m === l + r) }
    assert(got.map(_._1) === (1L to got.length).toSeq)
  }

  test("batching equals one-merge-per-round training on a conflict-free " +
    "fixture, and the compatibility rule defers overlapping pairs") {
    // conflict-free: four 2-letter words over disjoint alphabets with
    // strictly separated counts — every round's candidates are mutually
    // symbol-disjoint and merging creates no new pairs
    val free = Map("ab" -> 100L, "cd" -> 90L, "ef" -> 80L, "gh" -> 70L)
    val batched = referenceTrain(free, rounds = 4, window = 4)
    val sequential = sequentialTrain(free, nMerges = 4)
    assert(batched === sequential,
      "conflict-free batches must reproduce sequential training exactly")
    assert(batched.map(_._4) === Seq("ab", "cd", "ef", "gh"))
    // conflict: 'abc' makes (a,b) and (b,c) share symbol b. A batcher
    // without the rule would emit (b,c) with its stale count even
    // though merging (a,b) destroys every (b,c) occurrence.
    val clash = Map("abc" -> 10L)
    val got = referenceTrain(clash, rounds = 2, window = 4)
    assert(got.map(m => (m._2, m._3)) === Seq(("a", "b"), ("ab", "c")),
      "(b,c) must be deferred, then vanish after (a,b) merges")
    // and the engine agrees end-to-end on the same fixture
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_clash").toString
    try {
      Seq.tabulate(10)(i => (i.toLong, "abc", "test"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val eng = graft.text.Bpe.train(spark, tmp, rounds = 2, window = 4)
        .collect().map(r => (r.getAs[String]("left"),
          r.getAs[String]("right"))).toSeq
      assert(eng === Seq(("a", "b"), ("ab", "c")))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("t21: encoded token counts equal an in-process replay of the " +
    "merge table; merges only ever shrink words") {
    import org.apache.spark.sql.functions.col
    val merges = graft.text.Bpe.train(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val acc = Vector.newBuilder[String]
      var last: Option[String] = None
      syms.foreach { s =>
        if (last.contains(l) && s == r) { last = Some(l + r) }
        else { last.foreach(acc += _); last = Some(s) }
      }
      last.foreach(acc += _)
      acc.result()
    }
    def encodeWord(w: String): Vector[String] =
      merges.foldLeft(w.toVector.map(_.toString)) { case (s, (l, r)) =>
        applyMerge(s, l, r)
      }
    val docs = graft.text.Corpus.docsTok(spark, sfDir)
      .select(col("doc_id"), col("words")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("words"))
    val res = graft.text.Bpe.encode(spark, sfDir).collect()
    assert(res.length === docs.length)
    val byId = docs.toMap
    res.foreach { r =>
      val words = byId(r.getAs[Long]("doc_id"))
      val nBpe = words.map(w => encodeWord(w).length.toLong).sum
      assert(r.getAs[Long]("n_words") === words.length.toLong)
      assert(r.getAs[Long]("n_bpe_tokens") === nBpe)
      assert(r.getAs[Double]("tokens_per_word") ===
        nBpe.toDouble / words.length.toDouble)
      // merging never grows a word; at most chars-per-word tokens
      assert(nBpe <= words.map(_.length.toLong).sum)
      assert(nBpe >= words.length.toLong)
    }
  }

  test("merge exhaustion: the trainer early-stops and the SQL twins carry " +
    "the dictionary through empty rounds instead of zeroing it") {
    import spark.implicits._
    // a corpus whose dictionary exhausts after ONE merge: the only word
    // is "ab", so round 1 merges (a,b) and round 2 finds no pairs
    val tmp = java.nio.file.Files.createTempDirectory("bpe_exhaust").toString
    try {
      Seq((0L, "ab ab", "test"), (1L, "ab", "test"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = graft.text.Bpe.train(spark, tmp, rounds = 4).collect()
      assert(got.length === 1, "exhausted trainer must stop after its one merge")
      assert(got(0).getAs[String]("merged") === "ab")
      assert(got(0).getAs[Long]("pair_count") === 3L)
      // encode over the exhausted table still works: every word is one token
      val enc = graft.text.Bpe.encode(spark, tmp, rounds = 4).collect()
      assert(enc.map(_.getAs[Long]("n_bpe_tokens")).toSeq === Seq(2L, 1L))
      // the DuckDB twins must survive exhaustion the same way: an absent
      // k-th kept merge COALESCEs its replace patterns to the
      // chr(1)/chr(2) sentinels (never present in the delimited string),
      // so empty rounds carry the dictionary through unchanged instead
      // of zeroing it
      val sql = graft.text.Bpe.trainSql()
      assert(sql.contains("FROM kept1 WHERE ki = 1"))
      assert(sql.contains(s"FROM kept${graft.text.Bpe.Rounds} WHERE ki = " +
        graft.text.Bpe.BatchWindow))
      assert(sql.contains("chr(1)") && sql.contains("chr(2)"))
      assert(sql.contains("NOT EXISTS"), "the compatibility filter is the " +
        "batching contract — it must be in the oracle too")
      assert(graft.text.Bpe.encodeSql()
        .contains(s"FROM dict${graft.text.Bpe.Rounds}"))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
