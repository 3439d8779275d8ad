package graft

import graft.streaming.{DeltaDoc, StreamingDelta}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateless stream-static twin of batch d29: same verdicts under
  * any micro-batch split, duplicate (not conflicting) rows under
  * re-delivery. */
class StreamingDeltaSpec extends GraftSpec {

  test("streaming delta classification replays bit-identical to batch " +
      "d29 across uneven micro-batch splits, including re-delivery") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = graft.dedup.Dedup.incrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4))).toSeq
    val delta = graft.text.Corpus.docs(spark, sfDir)
      .filter(col("doc_id") % 10 >= graft.dedup.Dedup.SnapshotMod)
      .select(col("doc_id"), col("text"), col("source")).as[DeltaDoc]
      .collect().sortBy(_.doc_id)
    assert(delta.nonEmpty)
    val snapTexts = graft.dedup.Dedup.snapshotTexts(spark, sfDir)
    val bandIdx = graft.dedup.Dedup.snapshotBandIndex(spark, sfDir)
    val dict = graft.dedup.Dedup.shingleDictMap(spark, sfDir)
    val input = MemoryStream[DeltaDoc]
    val q = StreamingDelta.classify(input.toDS(), snapTexts, bandIdx, dict)
      .writeStream.outputMode("append").format("memory")
      .queryName("delta_cls").start()
    try {
      val (b1, rest) = delta.splitAt(7)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      // third batch includes a RE-DELIVERY of three batch-1 docs
      input.addData((b3 ++ b1.take(3)).toIndexedSeq)
      q.processAllAvailable()
      val all = spark.table("delta_cls").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
          r.getString(4)))
      // re-delivered docs re-emit IDENTICAL rows (idempotent verdicts)
      assert(all.length === delta.length + 3)
      assert(all.distinct.sortBy(_._1).toSeq === batch)
    } finally q.stop()
  }

  test("stream tokenizer keeps the leading empty token on " +
      "leading-whitespace docs, matching batch split() semantics") {
    // the r11 ADVICE parity gap: batch split(text, "\\s+") (and DuckDB
    // string_split_regex) keep a leading "" token, so a doc with
    // leading whitespace shingles as ("", w1, w2)… — the stream probe
    // must not trim it away or its band keys shift off the batch path's
    val t = "  alpha beta gamma delta"
    val batchTokens = t.split("\\s+").toSeq
    assert(batchTokens.head === "")
    // the probe path uses the same expression — assert by construction:
    // sliding-3 shingles over the untrimmed split
    val shingles = batchTokens.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSeq
    assert(shingles.head === " alpha beta")
  }

  test("stream tokenizer keeps the trailing empty token on " +
      "trailing-whitespace docs, matching Spark split limit=-1") {
    // mirror image of the leading-whitespace gap: Spark SQL split (limit
    // -1) and DuckDB string_split_regex KEEP trailing empty tokens, while
    // Java's default String.split drops them — the probe must use
    // split("\\s+", -1) or a trailing-whitespace doc misses its final
    // (w_{n-1}, w_n, "") shingle
    val t = "alpha beta gamma delta  "
    val streamTokens = t.split("\\s+", -1).toSeq
    assert(streamTokens.last === "")
    assert(t.split("\\s+").toSeq.last === "delta") // the buggy default
    val shingles = streamTokens.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSeq
    assert(shingles.last === "gamma delta ")
  }
}
