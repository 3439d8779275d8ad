package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document arriving on the ingest stream (the smp1/smp3 draw
  * domain: stratum key + the draw identity). */
case class DocArrival(doc_id: Long, lang: String, source: String,
                      n_chars: Long)

/** One row of a stratum's CURRENT sample snapshot. `n_seen` is the
  * stratum's monotone arrival counter — consumers (and the replay spec)
  * pick the max-`n_seen` emission per stratum as the live sample. */
case class SampleSnapshot(lang: String, source: String, n_seen: Long,
                          doc_id: Long, n_chars: Long, draw_rank: Long)

/** Bounded per-stratum reservoir state: the budget hash-smallest docs,
  * kept as parallel columns (flat arrays encode through the state store
  * without nested-tuple codegen). Sorted by (rank, doc_id). */
case class ReservoirState(nSeen: Long, ranks: Array[Long], ids: Array[Long],
                          chars: Array[Long])

/** The smp1/smp3 DRAW as a LIVE streaming operator: each stratum
  * maintains its `budget` hash-smallest documents as the corpus streams
  * in, so the curated sample is always current instead of recomputed
  * nightly. This is exactly the mergeability SamplingSpec certifies for
  * the batch key — the k smallest of a union are found among the k
  * smallest of each part — lowered onto a per-stratum state cell: each
  * micro-batch merges its arrivals into the bounded reservoir and the
  * result is INDEPENDENT of how arrivals split across batches.
  * Re-delivery is idempotent (set union on doc_id; a doc re-arriving
  * neither moves nor duplicates — the draw is a pure function of
  * doc_id).
  *
  * The apportionment step stays a READ-TIME broadcast (batch smp1's
  * alloc join): quotas depend on ALL strata's current sizes, so they
  * are applied when the sample is consumed, not baked into per-stratum
  * state. The reservoir holds the full `budget` prefix per stratum —
  * any alloc vector with n_alloc <= budget can be served from it.
  *
  * Scale posture: state is <= budget (rank, doc_id, n_chars) triples
  * per stratum — bounded by the mixture dimension, not the corpus;
  * strata hash-partition the state store; each batch's merge is
  * O(arrivals log budget). Emission is the updated stratum's snapshot
  * (update semantics — at most budget rows per touched stratum per
  * batch). */
object StatefulSampler {

  /** The smp1 draw rank (Sampling.hrank's integer formula). */
  def hrank(docId: Long): Long =
    ((docId % 1000000007L) * 2654435761L) % 999999937L

  def sample(ds: Dataset[DocArrival], budget: Int = 150): Dataset[SampleSnapshot] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(d => (d.lang, d.source))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: (String, String), rows: Iterator[DocArrival],
         state: GroupState[ReservoirState]) =>
          val prev = state.getOption
            .getOrElse(ReservoirState(0L, Array.empty, Array.empty, Array.empty))
          var nSeen = prev.nSeen
          val merged = scala.collection.mutable.TreeMap.empty[(Long, Long), Long]
          prev.ranks.indices.foreach { i =>
            merged((prev.ranks(i), prev.ids(i))) = prev.chars(i)
          }
          rows.foreach { d =>
            nSeen += 1
            val k = (hrank(d.doc_id), d.doc_id)
            if (!merged.contains(k)) {
              merged(k) = d.n_chars
              if (merged.size > budget) merged.remove(merged.lastKey)
            }
          }
          val kept = merged.toArray
          state.update(ReservoirState(nSeen,
            kept.map(_._1._1), kept.map(_._1._2), kept.map(_._2)))
          kept.iterator.zipWithIndex.map { case (((_, id), nc), i) =>
            SampleSnapshot(key._1, key._2, nSeen, id, nc, i + 1L)
          }
      }
  }
}
