package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row of the state-change log on the stream — `us` the exact
  * integer microseconds, `event_id` the total-order tiebreak (the
  * batch e33 sort key). */
case class ScdEvent(user_id: Long, event_id: Long, us: Long,
                    event_type: String)

/** One SCD2 history row as the stream emits it — same columns/values as
  * batch e33 ([[EventsBatch.scd2Intervals]]); valid_to_us is None on
  * the open (current) version. */
case class Scd2Row(user_id: Long, version: Long, state: String,
                   valid_from_us: Long, valid_to_us: Option[Long],
                   n_events: Long, is_current: Boolean)

/** The open-version cell — all a user's CLOSED history is already
  * emitted, so state is one fixed-size record per entity. */
case class Scd2Cell(version: Long, state: String, valid_from_us: Long,
                    n_events: Long)

/** e33's SCD TYPE-2 interval build as a LIVE operator: the stream
  * maintains each entity's open dimension version and emits (a) every
  * version the batch closes — exactly once, at the event that closes
  * it — and (b) the refreshed open-version row each micro-batch (Update
  * semantics: downstream keeps the LAST row per (user, version), the
  * same upsert contract as [[StatefulLatestState]]).
  *
  * Faithfulness: batch e33 orders each user's log by (ts, event_id)
  * and collapses equal-state runs; the stream applies the identical
  * order within each micro-batch and carries the open run across
  * batches, so an IN-ORDER replay (no batch boundary delivers an event
  * older than one already processed — the narrowed contract
  * StatefulSessionsTws documents for the same reason) is bit-identical
  * to the batch relation under last-write-wins on (user, version).
  * StatefulStreamingSpec replays the full log split mid-stream and
  * asserts exactly that.
  *
  * Scale posture: state is ONE open-version cell per entity — bounded
  * by the entity dimension, never by stream length (closed versions
  * leave the store the moment they emit); entities hash-partition the
  * state store. NoTimeout per the finite-dimension argument; an
  * event-time timeout would retire dormant entities. */
object StatefulScd2 {

  def intervals(ds: Dataset[ScdEvent]): Dataset[Scd2Row] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[ScdEvent], state: GroupState[Scd2Cell]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
          var cell = state.getOption.orNull
          rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            cell =
              if (cell == null) Scd2Cell(1L, r.event_type, r.us, 1L)
              else if (r.event_type == cell.state)
                cell.copy(n_events = cell.n_events + 1)
              else {
                out += Scd2Row(user, cell.version, cell.state,
                  cell.valid_from_us, Some(r.us), cell.n_events,
                  is_current = false)
                Scd2Cell(cell.version + 1, r.event_type, r.us, 1L)
              }
          }
          if (cell != null) {
            state.update(cell)
            out += Scd2Row(user, cell.version, cell.state, cell.valid_from_us,
              None, cell.n_events, is_current = true)
          }
          out.iterator
      }
  }
}
