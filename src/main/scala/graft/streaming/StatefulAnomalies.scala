package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (store, day) summary row arriving on the stream — the unit the
  * reference's upload-processor hands to its analysis branch. `gross` is
  * the exact decimal day total (BigDecimal keeps the arithmetic exact
  * until the final double conversions, matching the batch plan's
  * decimal-sum-then-cast order). */
case class DailySummary(store_id: String, day_idx: Int, sale_date: String,
                        gross: BigDecimal)

/** An emitted anomaly verdict — the same shape (and bit-identical values)
  * as the batch [[graft.analytics.History.anomalies]] relation. */
case class AnomalyEvent(store_id: String, sale_date: String,
                        today_sales: Double, hist_avg_sales: Double,
                        deviation_pct: Double, severity: String)

/** Per-store carried state: the trailing days that can still serve a
  * future day's 7-day window — never more than 7 entries per store. */
case class HistoryState(entries: List[(Int, BigDecimal)])

/** The reference's detect-anomalies path as a LIVE streaming operator
  * (reference: backend/functions/detect-anomalies/lambda_function.py:
  * 30,65-135,214-219,268-271,339-362): per-store trailing-7-day average,
  * deviation of today vs that average, severity rubric (>50 critical,
  * >25 warning, else info), emitted incrementally as daily summaries
  * arrive — `flatMapGroupsWithState` carrying a bounded history cell per
  * store across micro-batches.
  *
  * Faithfulness notes:
  *  - Values are bit-identical to the batch A11 relation (asserted in
  *    StatefulStreamingSpec): exact decimal sums, then the same
  *    double-division/multiplication order as the batch plan.
  *  - Requires at least 3 history days and a positive average, like the
  *    reference (detect-anomalies:339-362).
  *  - In-order arrival per store is assumed, as in the reference: its
  *    files arrive day by day, a late re-upload overwrites the summary
  *    but never re-triggers analysis for dates already analyzed
  *    (write-metrics:104; SURVEY.md §2.7 "late file for an old date").
  *    A re-DELIVERED day is tolerated: state entries are keyed by
  *    day_idx, so a duplicate summary overwrites its prior entry rather
  *    than double-counting it in later windows — and a day already in
  *    state is NOT re-analyzed (no duplicate AnomalyEvent in the
  *    append-mode sink; the corrected total still feeds later windows).
  *
  * Scale posture: state is ≤ 7 (day, decimal) pairs per store — bounded
  * by the window width, not the stream length; stores hash-partition the
  * state store, so 10⁶ stores is 10⁶ tiny cells spread over executors.
  * GroupStateTimeout.NoTimeout because the store dimension is finite;
  * swap in ProcessingTimeTimeout to retire stores that stop reporting. */
object StatefulAnomalies {

  private val HistDays = 7
  private val MinHistDays = 3

  def detect(ds: Dataset[DailySummary]): Dataset[AnomalyEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.store_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (store: String, rows: Iterator[DailySummary], state: GroupState[HistoryState]) =>
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
          val out = List.newBuilder[AnomalyEvent]
          // a micro-batch may carry several days for one store — process
          // them in day order so each sees exactly its preceding window
          rows.toSeq.sortBy(_.day_idx).foreach { r =>
            val hist = entries.filter(e =>
              e._1 >= r.day_idx - HistDays && e._1 <= r.day_idx - 1)
            // a day already in state was already analyzed — a re-delivery
            // must overwrite the state entry (below) but never emit a
            // second AnomalyEvent into the append sink (write-metrics:104
            // overwrite semantics; eviction keeps this check sufficient:
            // a day old enough to have left state has also lost its
            // window, so it cannot re-qualify either way)
            val alreadyAnalyzed = entries.exists(_._1 == r.day_idx)
            if (!alreadyAnalyzed && hist.size >= MinHistDays) {
              val histAvg = hist.map(_._2).sum.toDouble / hist.size
              if (histAvg > 0) {
                val today = r.gross.toDouble
                val dev = (today - histAvg) / histAvg * 100
                val sev =
                  if (math.abs(dev) > 50) "critical"
                  else if (math.abs(dev) > 25) "warning"
                  else "info"
                out += AnomalyEvent(store, r.sale_date, today, histAvg, dev, sev)
              }
            }
            // keyed by day_idx: a re-delivered (store, day) summary
            // OVERWRITES its previous entry instead of double-counting —
            // the reference's put_item overwrite semantics
            // (write-metrics:104). Evict relative to the NEWEST day in
            // state (not r.day_idx): a re-delivered old day must not
            // resurrect entries the newest day can no longer see, keeping
            // the ≤ HistDays bound strict.
            entries = (r.day_idx, r.gross) :: entries.filter(_._1 != r.day_idx)
            val newest = entries.iterator.map(_._1).max
            entries = entries.filter(_._1 > newest - HistDays)
          }
          state.update(HistoryState(entries))
          out.result().iterator
      }
  }
}
