package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** [[StatefulAnomalies]] re-expressed on Spark 4's arbitrary-state v2
  * API (`transformWithState` + `StatefulProcessor`) — the modern
  * replacement for `flatMapGroupsWithState`, and a deliberate TWIN so
  * the two APIs' semantics can be asserted identical (same emissions,
  * same state bound, bit-parity with batch a11 —
  * StatefulStreamingSpec).
  *
  * What the v2 API buys at scale, made concrete here:
  *  - State is a keyed `MapState[day_idx → cents]` instead of v1's
  *    single `GroupState` blob: a re-delivered day is a POINT
  *    overwrite (`updateValue`) and eviction a POINT delete
  *    (`removeKey`) in the state store, not a whole-cell
  *    deserialize-modify-rewrite — at 10⁶ stores × 7 entries the
  *    RocksDB write amplification drops by the cell width.
  *  - Day totals are stored as exact CENTS (8-byte long, money is
  *    scale-2 by construction): the trailing-window average
  *    reconstructs the identical BigDecimal sum, so emitted doubles
  *    are bit-equal to v1's and to the batch plan's.
  *  - `TimeMode.None` + `TTLConfig.NONE` mirror v1's NoTimeout
  *    posture (finite store dimension); a production retirement
  *    policy is one `TTLConfig(Duration)` away — declarative, where
  *    v1 needed hand-rolled timeout plumbing.
  * Requires the RocksDB state store provider (the only provider the
  * v2 operator supports). */
object StatefulAnomaliesTws {

  private val HistDays = 7
  private val MinHistDays = 3

  class AnomaliesProcessor
      extends StatefulProcessor[String, DailySummary, AnomalyEvent] {

    @transient private var hist: MapState[Int, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getMapState[Int, Long](
        "hist", Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(store: String, rows: Iterator[DailySummary],
                                 timerValues: TimerValues): Iterator[AnomalyEvent] = {
      val out = List.newBuilder[AnomalyEvent]
      // a micro-batch may carry several days for one store — process
      // them in day order so each sees exactly its preceding window
      rows.toSeq.sortBy(_.day_idx).foreach { r =>
        val entries = hist.iterator().toList
        val window = entries.filter(e =>
          e._1 >= r.day_idx - HistDays && e._1 <= r.day_idx - 1)
        // a day already in state was analyzed — a re-delivery overwrites
        // its entry below but never emits a second append-mode event
        // (same write-metrics:104 overwrite semantics as v1)
        val alreadyAnalyzed = hist.containsKey(r.day_idx)
        if (!alreadyAnalyzed && window.size >= MinHistDays) {
          // cents-sum → BigDecimal(sum, 2) is the SAME exact rational as
          // v1's BigDecimal fold, so the double division matches bit-for-bit
          val histAvg = BigDecimal(java.math.BigDecimal.valueOf(
            window.iterator.map(_._2).sum, 2)).toDouble / window.size
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
        // point overwrite, then evict strictly relative to the NEWEST day
        // in state (v1's rule: a re-delivered old day must not resurrect
        // entries the newest day can no longer see)
        hist.updateValue(r.day_idx, r.gross.bigDecimal.movePointRight(2).longValueExact())
        val allDays = (r.day_idx :: entries.map(_._1)).distinct
        val newest = allDays.max
        // r.day_idx is scanned too: a re-delivered day older than the
        // whole window evicts itself, exactly as v1's list filter does
        allDays.iterator.filter(_ <= newest - HistDays)
          .foreach(hist.removeKey)
      }
      out.result().iterator
    }
  }

  def detect(ds: Dataset[DailySummary]): Dataset[AnomalyEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.store_id)
      .transformWithState(new AnomaliesProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
