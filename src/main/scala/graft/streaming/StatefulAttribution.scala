package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One view/purchase event on the stream, timestamps already lowered to
  * integer microseconds (the engine-exact comparison domain e6/e8 use). */
case class TouchEvent(event_id: Long, user_id: Long, us: Long, kind: Int) {
  def isView: Boolean = kind == 0
}

/** An emitted attribution — same shape and values as a row of the batch
  * e8 relation ([[EventsBatch.asOfAttribution]]). */
case class AttributionEvent(event_id: Long, user_id: Long, purchase_us: Long,
                            view_us: Long, latency_us: Long)

/** The e8 as-of join as a LIVE streaming operator: last-touch attribution
  * emitted the moment each purchase arrives, not at end of day. Where the
  * batch plan carries the running MAX(view ts) in a window over the
  * sorted union, the stream carries it in a per-user state cell across
  * micro-batches — the same lowering, window state made explicit.
  *
  * Faithfulness: rows within a micro-batch are processed in (us, kind)
  * order — views before purchases at equal timestamps — exactly the
  * batch window's sort, so a batch replay of the same events is
  * bit-identical (asserted in StatefulStreamingSpec). Cross-batch,
  * per-user in-order arrival is assumed (the StatefulAnomalies
  * assumption); a re-delivered view is idempotent because the state
  * only ever takes the max.
  *
  * Scale posture: state is ONE long per user — bounded by the user
  * dimension, not the stream length; users hash-partition the state
  * store. GroupStateTimeout.NoTimeout mirrors the finite-dimension
  * argument of [[StatefulAnomalies]]; swap in event-time timeout to
  * retire users whose attribution window (e.g. 30 days) has passed. */
object StatefulAttribution {

  def attribute(ds: Dataset[TouchEvent]): Dataset[AttributionEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TouchEvent], state: GroupState[Long]) =>
          // Long.MinValue = "never seen a view" (never a valid unix_micros)
          var lastView = state.getOption.getOrElse(Long.MinValue)
          val out = List.newBuilder[AttributionEvent]
          rows.toSeq.sortBy(r => (r.us, r.kind)).foreach { r =>
            if (r.isView) lastView = math.max(lastView, r.us)
            else if (lastView == Long.MinValue)
              out += AttributionEvent(r.event_id, user, r.us, -1L, -1L)
            else
              out += AttributionEvent(r.event_id, user, r.us, lastView, r.us - lastView)
          }
          state.update(lastView)
          out.result().iterator
      }
  }
}
