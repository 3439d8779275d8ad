package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event arrival for transition tracking — e14's input row with the
  * timestamp lowered to integer microseconds (the e6/e8/e17 domain). */
case class TransEvent(user_id: Long, us: Long, event_id: Long, event_type: String)

/** Carried per-user state: ONE cell — the last event type seen (plus
  * its ordering key for documentation; arrival order is assumed
  * in-order per user across batches, the StatefulAnomalies contract). */
case class TransState(lastUs: Long, lastId: Long, lastType: String)

/** One emitted transition — the (from, to) bigram the moment it forms. */
case class Transition(user_id: Long, from_type: String, to_type: String)

/** The e14 transition matrix as a LIVE streaming operator: each
  * (from → to) bigram is emitted exactly once, the moment the `to`
  * event arrives — so any downstream (from, to) count aggregate is
  * the batch e14 relation maintained incrementally, and the emitted
  * stream itself feeds next-action models that want the transition
  * EVENT (not the nightly matrix). State per user is one fixed-size
  * cell (the last event type) — the smallest possible stateful
  * lowering; contrast [[StatefulBursts]]' eight-field cell.
  *
  * Faithfulness: rows within a micro-batch are processed in
  * (us, event_id) order — exactly the batch LEAD window's sort — so
  * replaying the event stream through any micro-batch split emits a
  * multiset of transitions whose (from, to) counts are bit-identical
  * to batch e14 (StatefulStreamingSpec asserts the equality, p_trans
  * included). Append mode: emissions are immutable facts, never
  * revised. */
object StatefulTransitions {

  def transitions(ds: Dataset[TransEvent]): Dataset[Transition] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TransEvent], state: GroupState[TransState]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            last.foreach(s => out += Transition(user, s.lastType, r.event_type))
            last = Some(TransState(r.us, r.event_id, r.event_type))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
