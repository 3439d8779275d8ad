package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (event_type, hour) count arriving on the stream — the unit e2's
  * watermarked hourly aggregate emits at window close. `hour_idx` is the
  * type's observed-hour sequence number (dense in arrival order). */
case class HourlyCount(event_type: String, hour_idx: Int,
                       window_start: String, n_events: Long)

/** An emitted verdict — the same shape (and bit-identical values) as the
  * batch [[EventsBatch.hourlyAnomalies]] relation's columns. */
case class HourlyAnomalyEvent(window_start: String, event_type: String,
                              n_events: Long, hist_hours: Long,
                              hist_avg: Double, deviation_pct: Double,
                              severity: String)

/** Per-type carried state: the trailing OBSERVED hours that can still
  * serve a future hour's baseline — never more than `HistHours` entries. */
case class HourlyHistoryState(entries: List[(Int, Long)])

/** e10's live twin — the a11/StatefulAnomalies pattern applied to the
  * event stream: per-type trailing-24-OBSERVED-hour average, deviation of
  * the arriving hour vs that average, a11's severity rubric, emitted
  * incrementally as hourly counts arrive.
  *
  * Baseline parity with batch e10 is BY CONSTRUCTION OF THE FRAME: the
  * batch side uses `ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING` over the
  * observed hour sequence (not calendar hours), so the state here is
  * count-bounded — the most recent 24 observed entries — NOT range-
  * evicted by hour_idx: over a gap, both sides still see the same 24
  * rows. The average is an exact integer sum with ONE double division,
  * the same operation order as the batch column (spec asserts
  * bit-identical replay).
  *
  * Scale posture: state is ≤ 24 (hour, long) pairs per event type —
  * bounded by the window width; types hash-partition the state store.
  * In-order arrival per type is assumed (hour windows close in order
  * under a watermark); a re-delivered hour overwrites its entry and is
  * not re-analyzed, like the daily twin. */
object StatefulHourlyAnomalies {

  private val HistHours = 24
  private val MinHist = 3

  def detect(ds: Dataset[HourlyCount]): Dataset[HourlyAnomalyEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[HourlyCount],
         state: GroupState[HourlyHistoryState]) =>
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
          val out = List.newBuilder[HourlyAnomalyEvent]
          rows.toSeq.sortBy(_.hour_idx).foreach { r =>
            // baseline = the up-to-24 most recent observed hours strictly
            // before this one (the batch ROWS frame, not a time range)
            val hist = entries.filter(_._1 < r.hour_idx)
              .sortBy(-_._1).take(HistHours)
            val alreadyAnalyzed = entries.exists(_._1 == r.hour_idx)
            if (!alreadyAnalyzed && hist.size >= MinHist) {
              val histAvg = hist.map(_._2).sum.toDouble / hist.size.toDouble
              val dev = (r.n_events.toDouble - histAvg) / histAvg * 100
              val sev =
                if (math.abs(dev) > 50) "critical"
                else if (math.abs(dev) > 25) "warning"
                else "info"
              out += HourlyAnomalyEvent(r.window_start, tpe, r.n_events,
                hist.size.toLong, histAvg, dev, sev)
            }
            entries = (r.hour_idx, r.n_events) :: entries.filter(_._1 != r.hour_idx)
            entries = entries.sortBy(-_._1).take(HistHours + 1)
          }
          state.update(HourlyHistoryState(entries))
          out.result().iterator
      }
  }
}
