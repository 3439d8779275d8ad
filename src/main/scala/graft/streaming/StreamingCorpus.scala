package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the training-data corpus operators (SURVEY.md §2.9
  * extensions): documents arrive as a stream and are deduplicated and
  * quality-gated incrementally, instead of re-running the batch d1/t2/c1
  * pass over the whole corpus per delivery — the shape a continuously-fed
  * 100 TB training-data lake actually needs.
  *
  * Scale posture is the whole point of the design choices here:
  *  - dedup state is BOUNDED by the watermark horizon
  *    (`dropDuplicatesWithinWatermark`), not corpus-sized: streaming
  *    `dropDuplicates` keeps every key ever seen and dies at 100 TB;
  *    within-horizon identity + a periodic batch d1 reconciliation pass
  *    (cheap, it's one hash agg) is the standard two-tier contract.
  *  - the identity key is a 64-bit `xxhash64` of the t6-normalized text,
  *    not the text itself — state entries are 8 bytes, not document-sized,
  *    and it is exactly the key batch d1 groups on at scale
  *    (dedup/Dedup.scala d1 scaladoc).
  *  - the quality gate is the t2 rubric column unchanged — a stateless,
  *    codegen'd per-row expression runs identically under `readStream`,
  *    so batch and streaming verdicts agree bit-for-bit (asserted in
  *    StreamingCorpusSpec).
  */
object StreamingCorpus {

  /** Content-identity key: xxhash64 over normalized text. Shared by both
    * the streaming dedup state and any batch reconciliation join. */
  def contentHashCol = xxhash64(TextAnalysis.normalizedCol)

  /** Streaming exact dedup: first arrival per content hash wins (the
    * reference's "first upload wins" idempotency, write-metrics:104,
    * generalized to content identity like batch d1); duplicates arriving
    * within `delay` of the watermark are dropped. Emits rows immediately
    * (dedup is a stateful filter, not a blocking aggregation), evicts
    * state once the watermark passes an entry's event time.
    *
    * Input: streaming DataFrame with (doc_id, ts timestamp, text). */
  def dedupWithinWatermark(docs: DataFrame, delay: String = "30 minutes"): DataFrame =
    docs
      .withColumn("content_hash", contentHashCol)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming quality gate: t2's rubric as a stateless filter — docs
    * scoring below `minScore` are dropped at arrival time, before they
    * ever land in the lake (c1's quality verdict moved to the ingest
    * edge). No state, no shuffle: runs at scan speed. */
  def qualityGate(docs: DataFrame, minScore: Long = 50L): DataFrame =
    docs
      .withColumn("quality_score", TextAnalysis.qualityScoreCol)
      .filter(col("quality_score") >= minScore)

  /** The composed streaming corpus-ingest pipeline: quality gate, then
    * watermark-bounded exact dedup — the streaming twin of batch c1's
    * (quality + exact-dup) verdicts, as one incremental flow. Gate first:
    * rejected docs never enter dedup state. */
  def corpusIngest(docs: DataFrame, minScore: Long = 50L,
                   delay: String = "30 minutes"): DataFrame =
    dedupWithinWatermark(qualityGate(docs, minScore), delay)
}
