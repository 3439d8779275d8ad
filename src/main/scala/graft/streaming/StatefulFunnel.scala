package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event arrival for funnel tracking — e22's input row with the
  * timestamp lowered to integer microseconds. */
case class FunnelEvent(event_id: Long, user_id: Long, us: Long,
                       event_type: String)

/** Carried per-user state: the three stage timestamps (−1 = stage not
  * reached; event times are non-negative) plus a strictly-growing
  * delivered-row counter so the final snapshot per user is its
  * max-n_seen emission. */
case class FunnelCell(tView: Long, tClick: Long, tPurchase: Long,
                      nSeen: Long)

/** A per-user funnel snapshot — same columns and values as one row of
  * the batch e22 relation ([[EventsBatch.windowedFunnel]]). */
case class FunnelRow(user_id: Long, reached_view: Boolean,
                     reached_click: Boolean, reached_purchase: Boolean,
                     view_to_click_us: Option[Long],
                     click_to_purchase_us: Option[Long], n_seen: Long)

/** The e22 time-windowed funnel as a LIVE streaming operator: per-user
  * view → click → purchase progress maintained incrementally, each
  * stage admitted only within [[StatefulFunnel.DefaultWindowUs]] of
  * the previous stage — the conversion-window rule the batch key
  * ships. The product surface this powers is the real-time funnel
  * dashboard: a user's snapshot row updates the moment they advance,
  * instead of waiting for the nightly batch.
  *
  * Faithfulness: the batch key takes, per stage, the MINIMUM
  * qualifying timestamp (first view; first click strictly after the
  * view within the window; first purchase strictly after that click
  * within the window). Processing each user's rows in (us, event_id)
  * order makes "first qualifying in order" identical to
  * "min qualifying", so after the log drains, the final snapshot per
  * user is bit-identical to the batch e22 row for ANY micro-batch
  * split — StatefulStreamingSpec asserts the equality split
  * mid-stream. In-order arrival per user across batches is the
  * [[StatefulAnomalies]] contract shared by the twin family.
  *
  * Scale posture: state is ONE fixed-size 4-long cell per user —
  * bounded by the user dimension, never the stream length; users
  * hash-partition the state store. NoTimeout mirrors the
  * finite-dimension argument; production would retire converted or
  * stale users with an event-time timeout. */
object StatefulFunnel {

  /** Same default as e22: each stage within 30 min of the previous. */
  val DefaultWindowUs: Long = 1800000000L

  def funnel(ds: Dataset[FunnelEvent],
             windowUs: Long = DefaultWindowUs): Dataset[FunnelRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelCell]) =>
          var s = state.getOption.getOrElse(FunnelCell(-1L, -1L, -1L, 0L))
          rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            s =
              if (s.tView < 0 && r.event_type == "view")
                s.copy(tView = r.us, nSeen = s.nSeen + 1)
              else if (s.tView >= 0 && s.tClick < 0 &&
                r.event_type == "click" && r.us > s.tView &&
                r.us - s.tView <= windowUs)
                s.copy(tClick = r.us, nSeen = s.nSeen + 1)
              else if (s.tClick >= 0 && s.tPurchase < 0 &&
                r.event_type == "purchase" && r.us > s.tClick &&
                r.us - s.tClick <= windowUs)
                s.copy(tPurchase = r.us, nSeen = s.nSeen + 1)
              else s.copy(nSeen = s.nSeen + 1)
          }
          state.update(s)
          FunnelRow(user, s.tView >= 0, s.tClick >= 0, s.tPurchase >= 0,
            if (s.tClick >= 0) Some(s.tClick - s.tView) else None,
            if (s.tPurchase >= 0) Some(s.tPurchase - s.tClick) else None,
            s.nSeen)
      }
  }
}
