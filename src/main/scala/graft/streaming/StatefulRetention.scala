package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event arrival for retention tracking — only the user and the
  * event-time microseconds matter. */
case class RetEvent(event_id: Long, user_id: Long, us: Long)

/** Carried per-user state: the cohort anchor (epoch day of the ISO
  * Monday starting the user's FIRST week) plus the week offsets
  * already credited — bounded by the calendar span in weeks, never by
  * the stream length. */
case class RetState(cohortDay: Long, seen: Seq[Long])

/** One emitted retention increment: user u was active in week
  * `cohort + week_offset` for the first time — exactly one emission
  * per (user, week_offset), so any downstream count of these rows IS
  * the batch e7 retention triangle maintained incrementally. */
case class RetentionInc(user_id: Long, cohort_week: String,
                        week_offset: Long)

/** The e7 cohort-retention triangle as a LIVE streaming operator: the
  * per-user cell tracks the first-week anchor and the set of week
  * offsets already seen; a new offset emits one immutable increment
  * row (append mode — never revised). Aggregating increments by
  * (cohort_week, week_offset) gives active_users; the offset-0 count
  * is the cohort size (every user is active in their own first week),
  * so the full batch relation — including the double retention ratio —
  * derives from the emission stream alone.
  *
  * Faithfulness: the batch key anchors cohorts at
  * date_trunc('week', ts) of the user's earliest event; with per-user
  * in-order arrival (the [[StatefulAnomalies]] family contract) the
  * first row processed carries that week. Week truncation is the ISO
  * Monday rule both engines implement — recomputed here from the UTC
  * epoch day so the twin emits the identical 'yyyy-MM-dd' labels.
  * StatefulStreamingSpec replays the log over a micro-batch split and
  * asserts the aggregated increments equal batch e7 bit-for-bit.
  *
  * Scale posture: state per user is one long + the offsets seen
  * (calendar-bounded); users hash-partition the state store. The
  * emission stream is |users|·|weeks|-bounded regardless of event
  * volume — the retention triangle's own size. */
object StatefulRetention {

  private val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE

  /** Epoch day of the ISO Monday starting the week containing `us`. */
  private def weekStartDay(us: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(
      Math.floorDiv(us, 86400000000L))
    d.toEpochDay - (d.getDayOfWeek.getValue - 1)
  }

  def increments(ds: Dataset[RetEvent]): Dataset[RetentionInc] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) =>
          var s = state.getOption.getOrElse(RetState(-1L, Seq.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[RetentionInc]
          rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            val wk = weekStartDay(r.us)
            if (s.cohortDay < 0) s = RetState(wk, Seq.empty)
            val off = (wk - s.cohortDay) / 7
            if (!s.seen.contains(off)) {
              s = s.copy(seen = s.seen :+ off)
              out += RetentionInc(user,
                java.time.LocalDate.ofEpochDay(s.cohortDay).format(fmt), off)
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
