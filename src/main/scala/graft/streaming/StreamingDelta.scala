package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One document arriving on the corpus ingest stream (d29's delta). */
case class DeltaDoc(doc_id: Long, text: String, source: String)

/** d29's incremental dedup as a LIVE ingest stream — the arrival-time
  * form: every micro-batch of new documents is classified against the
  * deduped snapshot the moment it lands, instead of waiting for the
  * nightly batch pass.
  *
  * Unlike the 17 stateful twins, this one is deliberately STATELESS:
  * the verdict is a pure function of (document, snapshot index), so
  *  - re-delivery is idempotent (same doc → same verdict, no counter
  *    moves, no state store involved), and
  *  - the replay contract is trivial-by-construction: any micro-batch
  *    split of the delta yields bit-identical rows to batch d29
  *    (StreamingDeltaSpec certifies it anyway).
  * The streaming surfaces exercised are the two PROBE paths:
  *  - exact: a STREAM-STATIC left outer join of the stream against the
  *    snapshot's distinct-text relation (Spark plans the static side as
  *    an ordinary batch subtree inside each micro-batch), and
  *  - near: a broadcast point-lookup of each doc's 4 LSH band keys in
  *    the snapshot band index ([[Dedup.bandKeysOf]] bit-parity with the
  *    batch relational path). At 100 TB the band index lives in a
  *    shared KV/state store and this lookup is the same point probe;
  *    the broadcast Set is the single-JVM stand-in for that seam.
  */
object StreamingDelta {

  /** Classify a delta stream against the snapshot indexes. `snapTexts`
    * must be a STATIC (batch) DataFrame with one `text` column;
    * `bandIndex` / `dict` are [[Dedup.snapshotBandIndex]] /
    * [[Dedup.shingleDictMap]]. Append-mode safe: no aggregation, no
    * watermark, one output row per arriving doc. */
  def classify(stream: Dataset[DeltaDoc], snapTexts: DataFrame,
               bandIndex: Set[Long], dict: Map[String, Long]): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bIdx = spark.sparkContext.broadcast(bandIndex)
    val bDict = spark.sparkContext.broadcast(dict)
    val probed = stream.map { d =>
      // same shingle rule as Corpus.docShingles: whitespace tokens,
      // word 3-grams, per-doc distinct; unknown shingles (impossible
      // for in-corpus docs, possible for true out-of-corpus arrivals)
      // simply contribute no sid — novel-leaning, the safe direction.
      // NO .trim: the batch side's split(text, "\\s+") keeps a leading
      // empty token on leading-whitespace docs (as does DuckDB's
      // string_split_regex), so trimming only here would shift the
      // stream's shingles off the batch path's on exactly those docs.
      // limit=-1: Spark SQL split (and DuckDB) also KEEP trailing empty
      // tokens, which Java's default split drops — a trailing-whitespace
      // doc must shingle identically on both paths.
      val sids = d.text.split("\\s+", -1).toSeq.sliding(3)
        .filter(_.size == 3).map(_.mkString(" "))
        .toSet[String].flatMap(s => bDict.value.get(s))
      val near = Dedup.bandKeysOf(sids).exists(bIdx.value.contains)
      (d.doc_id, d.text, d.source, near)
    }.toDF("doc_id", "text", "source", "near_dup")
    probed
      .join(snapTexts.withColumn("exact_hit", lit(true)), Seq("text"),
        "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("exact_hit"), lit(false)).as("exact_dup"),
        col("near_dup"),
        when(coalesce(col("exact_hit"), lit(false)), lit("exact"))
          .when(col("near_dup"), lit("near"))
          .otherwise(lit("novel")).as("verdict"))
  }
}
