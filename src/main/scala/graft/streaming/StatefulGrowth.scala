package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One "user was active on epoch day d" observation from the event
  * stream (days as epoch-day longs — the integer comparison domain,
  * like e6/e8's microsecond timestamps). */
case class ActivityEvent(user_id: Long, epoch_day: Long)

/** An emitted per-(user, day) growth classification — the row the batch
  * e13 relation aggregates per day ([[EventsBatch.growthAccounting]]'s
  * `classified` stage). */
case class GrowthEvent(user_id: Long, epoch_day: Long, status: String)

/** The e13 growth classification as a LIVE streaming operator: each
  * user's first activity of a calendar day is classified
  * new/retained/resurrected the moment it arrives, instead of in a
  * nightly batch. The batch plan derives the per-user previous active
  * day with a lag window; the stream carries it in a per-user state
  * cell — the same lowering [[StatefulAttribution]] applies to e8's
  * running max.
  *
  * Faithfulness: within a micro-batch, a user's days are processed in
  * ascending order (the batch window's sort); days at or before the
  * state's last-seen day are DROPPED, which makes re-delivered events
  * idempotent (a day is classified exactly once — the batch `distinct`
  * made explicit). A batch replay over any micro-batch split is
  * bit-identical (StatefulStreamingSpec). Cross-batch, per-user
  * in-order day arrival is assumed — the [[StatefulAnomalies]]
  * assumption, true under event-time watermarking.
  *
  * Scale posture: state is ONE long per user, bounded by the user
  * dimension; users hash-partition the state store. Downstream, the
  * day-level rollup (counts per status per day) is an ordinary
  * streaming aggregation over these appended rows — churn stays a
  * day-level derivation exactly as in batch. Swap NoTimeout for an
  * event-time timeout to retire users idle past the retention horizon
  * (their next appearance then re-classifies as "new", which is the
  * standard growth-accounting convention after state expiry). */
object StatefulGrowth {

  def classify(ds: Dataset[ActivityEvent]): Dataset[GrowthEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[ActivityEvent], state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = List.newBuilder[GrowthEvent]
          rows.map(_.epoch_day).toSeq.distinct.sorted.foreach { d =>
            if (d > last) {
              val status =
                if (last == Long.MinValue) "new"
                else if (d - last == 1) "retained"
                else "resurrected"
              out += GrowthEvent(user, d, status)
              last = d
            }
          }
          state.update(last)
          out.result().iterator
      }
  }
}
