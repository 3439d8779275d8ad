package graft

import org.apache.spark.sql.functions._

/** Exactness anchor for the t20 BPE trainer: an in-process reference
  * implementation of the same training rule (frequency-weighted
  * adjacent-pair counts over the word dictionary; best pair by
  * (count DESC, pair ASC); greedy left-to-right non-overlapping
  * application) must reproduce the distributed merge table exactly. */
class BpeSpec extends GraftSpec {

  private def referenceTrain(words: Map[String, Long], nMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var dict: Map[Vector[String], Long] = words.toSeq
      .map { case (w, f) => w.toVector.map(_.toString) -> f }
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = collection.mutable.Map[(String, String), Long]()
      dict.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank.toLong, l, r, l + r, c))
        dict = dict.toSeq.map { case (syms, f) =>
          val acc = Vector.newBuilder[String]
          var last: Option[String] = None
          syms.foreach { s =>
            if (last.contains(l) && s == r) { last = Some(l + r) }
            else { last.foreach(acc += _); last = Some(s) }
          }
          last.foreach(acc += _)
          acc.result() -> f
        }.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }
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
    val want = referenceTrain(words, 8)
    val got = graft.text.Bpe.train(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got === want)
    // classic BPE property: the chosen pair's count never increases
    got.map(_._5).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "best-pair counts must be non-increasing")
      case _ =>
    }
    // merged symbol is the concatenation, ranks are 1..n
    got.foreach { case (_, l, r, m, _) => assert(m === l + r) }
    assert(got.map(_._1) === (1L to got.length).toSeq)
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
      val got = graft.text.Bpe.train(spark, tmp, nMerges = 8).collect()
      assert(got.length === 1, "exhausted trainer must stop after its one merge")
      assert(got(0).getAs[String]("merged") === "ab")
      assert(got(0).getAs[Long]("pair_count") === 3L)
      // encode over the exhausted table still works: every word is one token
      val enc = graft.text.Bpe.encode(spark, tmp, nMerges = 8).collect()
      assert(enc.map(_.getAs[Long]("n_bpe_tokens")).toSeq === Seq(2L, 1L))
      // the DuckDB twins must survive exhaustion the same way: each round's
      // dictionary LEFT-JOINs the possibly-empty best pair with a COALESCE
      // fallback (a CROSS JOIN would zero every post-exhaustion round —
      // silent total data loss in trainSql AND encodeSql)
      val sql = graft.text.Bpe.trainSql(8)
      assert(sql.contains("LEFT JOIN best1 b ON TRUE"))
      assert(sql.contains("LEFT JOIN best8 b ON TRUE"))
      assert(sql.contains("COALESCE(replace("))
      assert(!sql.contains("CROSS JOIN best"))
      assert(graft.text.Bpe.encodeSql(8).contains("LEFT JOIN best8 b ON TRUE"))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
