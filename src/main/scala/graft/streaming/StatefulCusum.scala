package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One finalized daily count arriving at the changepoint monitor —
  * e23's input row. In production this comes from the watermarked
  * daily-count window aggregation (StreamingWindowSpec's shape): the
  * count is immutable once the watermark passes, so the CUSUM layer
  * sees each (type, day) exactly once, in day order per type. */
case class DailyCount(event_type: String, d: String, n_events: Long)

/** Carried per-type state: the two one-sided CUSUM accumulators —
  * exactly the pair the textbook recursion keeps, nothing else. This
  * is the form the batch closed-form (e23's prefix-min identity)
  * deliberately avoids materializing; the stream keeps it because two
  * longs per key is the cheapest possible state. */
case class CusumState(sPos: Long, sNeg: Long)

/** One emitted verdict row — bit-compatible with batch e23's schema. */
case class CusumRow(event_type: String, d: String, n_events: Long,
                    mu_milli: Long, cusum_pos_milli: Long,
                    cusum_neg_milli: Long, is_alarm: Boolean)

/** e23's CUSUM changepoint monitor as a LIVE stream: per event type,
  * the textbook recursion S⁺ = max(0, S⁺ + (x − μ)),
  * S⁻ = max(0, S⁻ − (x − μ)) over finalized daily counts, emitting one
  * verdict row per (type, day) in append mode. The reference mean μ is
  * a FIT-OFFLINE literal map (the StreamingDrift/LM-gate contract —
  * a live fit would make early verdicts depend on arrival order);
  * state per key is two longs, bounded forever. Replaying the same
  * days through any micro-batch split reproduces batch e23
  * bit-for-bit with the same μ (StatefulStreamingSpec asserts it) —
  * the closed form and the recursion are the same function, computed
  * batch-wide there and incrementally here. */
object StatefulCusum {

  def cusum(ds: Dataset[DailyCount], muMilliByType: Map[String, Long],
            hDays: Long = 2L): Dataset[CusumRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[DailyCount], state: GroupState[CusumState]) =>
          val mu = muMilliByType.getOrElse(tpe, 0L)
          var s = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumRow]
          rows.toSeq.sortBy(_.d).foreach { r =>
            val x = r.n_events * 1000L - mu
            s = CusumState(math.max(0L, s.sPos + x), math.max(0L, s.sNeg - x))
            out += CusumRow(tpe, r.d, r.n_events, mu, s.sPos, s.sNeg,
              math.max(s.sPos, s.sNeg) > mu * hDays)
          }
          state.update(s)
          out.iterator
      }
  }
}
