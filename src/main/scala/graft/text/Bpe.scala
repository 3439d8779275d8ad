package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t20: distributed BYTE-PAIR-ENCODING merge-rule training — the
  * tokenizer-fitting step of an LLM data pipeline, run the way every
  * production trainer runs it (HuggingFace tokenizers, SentencePiece
  * BPE mode): NOT over the corpus, but over the WORD-FREQUENCY
  * DICTIONARY — one row per distinct word with its corpus count. The
  * corpus is touched exactly once (the word-count aggregate,
  * map-side-combinable); every training iteration after that is a job
  * over the vocabulary-sized dictionary, bounded by Heaps' law, not by
  * corpus bytes. At 100 TB the dictionary fits comfortably where the
  * corpus never would — this separation IS the scalable shape.
  *
  * Per iteration: (1) adjacent-symbol pair counts, frequency-weighted
  * — an explode + hash agg over the dictionary; (2) the best pair by
  * (count DESC, pair ASC — a deterministic total order, so retries and
  * partitionings agree) via TakeOrdered(1), never a global sort;
  * (3) the merge applied to every word's symbol sequence as a single
  * left-to-right fold (`aggregate` HOF: last symbol == left ∧ current
  * == right → replace last with merged, else append — greedy
  * non-overlapping, the BPE rule). The fold is codegen-free but
  * narrow: no shuffle, and each iteration's dictionary is cached so
  * lineage stays one step deep.
  *
  * Rows-only at the correctness gate: iterative merge application
  * needs a per-merge rewrite loop no single SQL expression expresses
  * (DuckDB's list_reduce cannot build lists); [[graft.BpeSpec]]
  * recomputes the whole trainer in-process and asserts the merge
  * table matches exactly. */
object Bpe {

  /** Split a word into single-character symbols. */
  private def charsCol(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** One left-to-right non-overlapping merge pass of (left, right) →
    * left||right over a symbol array — the BPE apply rule as a fold. */
  private def mergeCol(symbols: Column, left: String, right: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(left) && s === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
          .otherwise(concat(acc, array(s))))

  /** The learned merge table: (merge_rank, left, right, merged,
    * pair_count) for `nMerges` iterations. */
  def train(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    import spark.implicits._
    // the dictionary is vocabulary-sized: coalesce to a few partitions so
    // the 8 iteration jobs schedule a handful of real tasks instead of
    // 32 near-empty ones (pure overhead at this relation size)
    var dict = Corpus.docsTok(spark, dir)
      .select(explode(col("words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(charsCol(col("word")).as("symbols"), col("freq"))
      .coalesce(4)
      .cache()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to nMerges if !exhausted) {
      val pairs = dict
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("symbols"), lit(1), size(col("symbols")) - 1).as("l"),
            slice(col("symbols"), lit(2), size(col("symbols")) - 1).as("r"))
          ).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("freq")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, c) = (best(0).getAs[String]("left"),
          best(0).getAs[String]("right"), best(0).getAs[Long]("pair_count"))
        merges += ((rank.toLong, l, r, l + r, c))
        val next = dict
          .select(mergeCol(col("symbols"), l, r).as("symbols"), col("freq"))
          .cache()
        next.count() // materialize before unpersisting the parent
        dict.unpersist()
        dict = next
      } else exhausted = true // no pairs left: stop submitting empty jobs
    }
    dict.unpersist()
    merges.result()
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** t21: BPE ENCODE — the learned merge table applied to the corpus:
    * per document, every word's character sequence is rewritten by the
    * `nMerges` rules IN RANK ORDER (the BPE apply semantics), and the
    * resulting token count is emitted next to the whitespace count —
    * the fertility / compression statistic a tokenizer change is
    * judged by. The merge table is tiny (k rows, collected once) and
    * UNROLLS into k nested fold expressions over each word: the encode
    * is a pure NARROW MAP at parquet-scan speed — train once (t20),
    * encode 100 TB with zero shuffles, the exact production split.
    * Rows-only like t20 (the per-merge rewrite loop has no SQL form);
    * [[graft.BpeSpec]] replays an in-process encoder over the same
    * merge table and the counts match exactly. */
  def encode(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    val merges = train(spark, dir, nMerges).collect()
      .sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    def encodedWord(w: Column): Column =
      merges.foldLeft(charsCol(w)) { case (acc, (l, r)) => mergeCol(acc, l, r) }
    Corpus.docsTok(spark, dir)
      .select(col("doc_id"), size(col("words")).cast("long").as("n_words"),
        aggregate(col("words"), lit(0L),
          (acc, w) => acc + size(encodedWord(w)).cast("long"))
          .as("n_bpe_tokens"))
      .withColumn("tokens_per_word",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
      .orderBy("doc_id")
  }
}
