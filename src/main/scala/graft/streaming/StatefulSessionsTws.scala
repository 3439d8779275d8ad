package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState, ExpiredTimerInfo}

/** One event on the session stream: `ts` is the event-time column the
  * watermark rides; `us` its exact integer microseconds (the batch
  * twin's arithmetic), `event_id` the total-order tiebreak. */
case class SessionEvent(user_id: Long, event_id: Long, us: Long,
                        ts: java.sql.Timestamp)

/** A CLOSED session: [start_us, end_us] with its event count. */
case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                      n_events: Long)

/** The in-flight session carried per user (8-byte fields only). */
case class SessionCell(start_us: Long, last_us: Long, n: Long)

/** LIVE SESSIONIZATION with EVENT-TIME TIMERS on the state-API v2 —
  * the timer half of `transformWithState` that the anomalies twin
  * ([[StatefulAnomaliesTws]]) doesn't exercise: a session should
  * CLOSE when the stream goes quiet, and "quiet" in event time means
  * the WATERMARK passed the session's gap horizon — exactly what
  * `registerTimer` + `handleExpiredTimer(TimeMode.EventTime)` encode
  * declaratively, where a flatMapGroupsWithState port hand-rolls
  * timeout bookkeeping.
  *
  * SAME ALGEBRA AS BATCH e4 ([[EventsBatch.sessionize]]): events per
  * user in (ts, event_id) order split when the floor-second gap
  * exceeds `gapSec` (the integer floor-division rule both engines
  * share). In-batch splits emit immediately; the tail session emits
  * from the timer when the watermark passes `last + gap` — so the
  * emitted session set over a drained stream is bit-identical to the
  * batch session relation (TwsSessionsSpec replays a fixture against
  * an in-process reference of the batch rule).
  *
  * Scale posture: state is ONE 3-long cell + one timer per ACTIVE
  * user (the watermark retires idle users through the timer path, so
  * state tracks concurrent activity, not user-dimension size);
  * users hash-partition the RocksDB store. */
object StatefulSessionsTws {

  class SessionsProcessor(gapSec: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionOut] {

    @transient private var cur: ValueState[SessionCell] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[SessionCell](
        "session", Encoders.product[SessionCell], TTLConfig.NONE)

    private def second(us: Long): Long = Math.floorDiv(us, 1000000L)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val out = List.newBuilder[SessionOut]
      // Retro-session builder for gap-distant stragglers: since rows are
      // processed in (us, event_id) order, stragglers that themselves sit
      // within gapSec of each other must COALESCE into one retro-session
      // (the batch e4 rule would merge them) — emitting one singleton per
      // straggler would over-split exactly when two late events arrive in
      // the same batch.
      var retro: Option[SessionCell] = None
      def pushRetro(): Unit = retro.foreach { rc =>
        out += SessionOut(user, rc.start_us, rc.last_us, rc.n)
        retro = None
      }
      rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
        val prev = if (cur.exists()) Option(cur.get()) else None
        prev match {
          case Some(c) if second(r.us) - second(c.last_us) > gapSec =>
            out += SessionOut(user, c.start_us, c.last_us, c.n)
            cur.update(SessionCell(r.us, r.us, 1L))
          case Some(c) if second(c.start_us) - second(r.us) > gapSec =>
            // late straggler from a PREVIOUS batch, more than a gap
            // before the live session's start: it cannot extend the
            // session, and its true in-order neighbors were already
            // emitted — fold it into the retro-session under the same
            // gap rule as the live path rather than corrupting the live
            // cell (bounded-lateness streaming cannot re-open an emitted
            // session; the batch twin would have merged it only with
            // already-closed history)
            retro match {
              case Some(rc) if second(r.us) - second(rc.last_us) > gapSec =>
                pushRetro()
                retro = Some(SessionCell(r.us, r.us, 1L))
              case Some(rc) =>
                retro = Some(SessionCell(math.min(rc.start_us, r.us),
                  math.max(rc.last_us, r.us), rc.n + 1L))
              case None =>
                retro = Some(SessionCell(r.us, r.us, 1L))
            }
          case Some(c) =>
            // absorb — with min/max tracking, NOT plain assignment: a
            // cross-batch out-of-order event (late but above the
            // watermark) may carry r.us < c.last_us, and assigning it
            // would move the session end BACKWARD, so later gap checks
            // and the re-armed timer would use the stale earlier
            // timestamp and split where the batch e4 rule would not
            cur.update(SessionCell(math.min(c.start_us, r.us),
              math.max(c.last_us, r.us), c.n + 1L))
          case None =>
            cur.update(SessionCell(r.us, r.us, 1L))
        }
      }
      pushRetro()
      // ONE live timer per user at the gap horizon of the newest event:
      // re-arm by deleting whatever was pending first (timers are not
      // keyed by name, so stale horizons would otherwise accumulate)
      if (cur.exists()) {
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        val expiryMs = (second(cur.get().last_us) + gapSec + 1L) * 1000L
        getHandle.registerTimer(expiryMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // the watermark passed last + gap: no in-order event can extend
      // this session anymore — close and retire the user's state
      val out =
        if (cur.exists()) {
          val c = cur.get()
          cur.clear()
          Iterator.single(SessionOut(user, c.start_us, c.last_us, c.n))
        } else Iterator.empty
      out
    }
  }

  def sessions(ds: Dataset[SessionEvent], gapSec: Long = 1800L,
               watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionsProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
