package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event arrival for burst tracking, timestamp lowered to integer
  * microseconds (the e6/e8/e17 comparison domain). */
case class PulseEvent(user_id: Long, us: Long, event_id: Long)

/** The carried per-user burst state: O(1) regardless of stream length.
  * `curRun` is the length of the burst-pair run currently open (0 when
  * the last gap was ≥ the threshold). */
case class BurstState(lastUs: Long, lastId: Long, nGaps: Long,
                      minGapUs: Long, nRuns: Long, longestRun: Long,
                      nBurstPairs: Long, curRun: Long)

/** An emitted per-user snapshot — same columns and values as a row of
  * the batch e17 relation ([[EventsBatch.burstDetection]]). */
case class BurstSnapshot(user_id: Long, n_gaps: Long, min_gap_us: Long,
                         n_runs: Long, longest_run: Long,
                         n_burst_pairs: Long, is_suspect: Boolean)

/** The e17 burst detector as a LIVE streaming operator: each user's
  * rapid-fire statistics update the moment an event arrives, instead
  * of in a nightly batch — the trust-and-safety gate wants the flag
  * DURING the burst, not after it. The batch plan derives runs with a
  * lag + run-collapse window; the stream carries (last timestamp,
  * open-run length) in a per-user state cell and maintains every
  * aggregate incrementally — O(1) state per user, the
  * [[StatefulAttribution]] lowering.
  *
  * Faithfulness: rows within a micro-batch are processed in (us,
  * event_id) order — the batch window's sort — so a batch replay over
  * any micro-batch split is bit-identical (StatefulStreamingSpec).
  * Cross-batch, per-user in-order arrival is assumed (the
  * StatefulAnomalies assumption). Snapshots emit in update mode; the
  * latest row per user is the live e17 relation. */
object StatefulBursts {

  def detect(ds: Dataset[PulseEvent], gapUs: Long = 1000000L,
             runFlag: Int = 5): Dataset[BurstSnapshot] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[PulseEvent], state: GroupState[BurstState]) =>
          var s = state.getOption.getOrElse(
            BurstState(Long.MinValue, Long.MinValue, 0L, Long.MaxValue,
              0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            if (s.lastUs != Long.MinValue) {
              val gap = r.us - s.lastUs
              val burst = gap < gapUs
              val curRun = if (burst) s.curRun + 1 else 0L
              s = BurstState(r.us, r.event_id,
                s.nGaps + 1, math.min(s.minGapUs, gap),
                s.nRuns + (if (burst && s.curRun == 0L) 1L else 0L),
                math.max(s.longestRun, curRun),
                s.nBurstPairs + (if (burst) 1L else 0L),
                curRun)
            } else s = s.copy(lastUs = r.us, lastId = r.event_id)
          }
          state.update(s)
          if (s.nGaps == 0L) Iterator.empty
          else Iterator(BurstSnapshot(user, s.nGaps, s.minGapUs, s.nRuns,
            s.longestRun, s.nBurstPairs,
            s.longestRun >= runFlag.toLong || s.nBurstPairs * 2 > s.nGaps))
      }
  }
}
