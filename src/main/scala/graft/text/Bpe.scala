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
  * ORACLE TWIN (r8): the trainer IS expressible in DuckDB once the
  * fixed iteration count is UNROLLED (8 rounds of CTEs) and the
  * symbol list is represented as a DOUBLE-DELIMITED STRING:
  * `||s1||s2||...||`. One global `replace(s, '|l||r|', '|lr|')` is
  * then exactly the greedy left-to-right non-overlapping BPE merge
  * fold: each match consumes ONE `|` from each side, leaving the
  * other for the neighboring symbol, so consecutive merge sites chain
  * (`||a||a||a||a||` → `||aa||aa||`) while the surviving outer bars
  * anchor both symbol boundaries (no prefix/suffix false matches —
  * `|b||c|` cannot match inside `||ab||c||`). The representation
  * assumes `|` never occurs inside a token (whitespace-split corpus
  * text; holds for the synthetic corpus and is asserted nowhere
  * cheaper than the oracle compare itself, which would hash-diverge).
  * [[graft.BpeSpec]] additionally recomputes the whole trainer
  * in-process and asserts the merge table matches exactly. */
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
    * Oracle-checked since r8 via [[encodeSql]] (the unrolled trainer's
    * final dictionary carries each word's token count); [[graft.BpeSpec]]
    * additionally replays an in-process encoder over the same merge
    * table and the counts match exactly. */
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

  /** One unrolled training round for the DuckDB twins: adjacent-pair
    * counts over the delimited dictionary, the (count DESC, left, right)
    * argmax, and the merge applied via the double-delimiter replace
    * (see the object scaladoc for the equivalence argument). The split
    * array `a` is ['', s1, ..., sn, ''], so pairs live at indices
    * 2..len-2 against their successors. */
  private def roundCteSql(i: Int): String = {
    val prev = s"dict${i - 1}"
    s""",
       |pc$i AS (
       |  SELECT a[i] AS l, a[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS c
       |  FROM (SELECT string_split(s, '||') AS a, freq FROM $prev) t,
       |       unnest(range(2, len(a) - 1)) AS u(i)
       |  GROUP BY 1, 2),
       |best$i AS (
       |  SELECT l, r, c FROM pc$i ORDER BY c DESC, l ASC, r ASC LIMIT 1),
       |dict$i AS (
       |  SELECT d.word,
       |    COALESCE(replace(d.s, '|' || b.l || '||' || b.r || '|',
       |      '|' || b.l || b.r || '|'), d.s) AS s, d.freq
       |  FROM $prev d LEFT JOIN best$i b ON TRUE)""".stripMargin
  }

  private def dictCtesSql(nMerges: Int): String =
    s"""WITH wf AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(${Corpus.wordsSqlExpr}) AS word FROM documents)
       |  GROUP BY 1),
       |dict0 AS (
       |  SELECT word,
       |    '||' || array_to_string(string_split(word, ''), '||') || '||' AS s,
       |    freq
       |  FROM wf)""".stripMargin +
      (1 to nMerges).map(roundCteSql).mkString

  /** DuckDB twin of [[train]] — the 8 iterations unrolled as CTE
    * rounds. Exhaustion-safe like the Scala trainer: when pair counts
    * run out before `nMerges`, `best_i` is empty, the LEFT JOIN +
    * COALESCE in `dict_i` carries the dictionary through unchanged,
    * and the empty `best_i` simply contributes no merge row — matching
    * the trainer's early stop (a CROSS JOIN here would instead zero
    * every later round's dictionary: total silent data loss). */
  def trainSql(nMerges: Int = 8): String =
    dictCtesSql(nMerges) + "\nSELECT * FROM (\n" +
      (1 to nMerges).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS merge_rank, l AS "left", r AS "right", l || r AS merged, c AS pair_count FROM best$i""")
        .mkString("\nUNION ALL\n") +
      "\n) ORDER BY merge_rank"

  /** DuckDB twin of [[encode]]: the trained per-word symbol strings
    * (dict`nMerges`) ARE the encoded words — token count per word is
    * its delimiter count, and documents re-aggregate the word relation. */
  def encodeSql(nMerges: Int = 8): String =
    dictCtesSql(nMerges) +
      s""",
         |wtok AS (
         |  SELECT word, CAST(len(string_split(s, '||')) - 2 AS BIGINT) AS ntok
         |  FROM dict$nMerges),
         |docw AS (
         |  SELECT doc_id, unnest(${Corpus.wordsSqlExpr}) AS word FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(ntok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tokens_per_word
         |FROM docw JOIN wtok USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
