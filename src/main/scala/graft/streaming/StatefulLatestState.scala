package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One row of the upsert log on the stream — timestamps already lowered
  * to integer microseconds (the engine-exact domain the e-family uses). */
case class VersionEvent(event_id: Long, user_id: Long, us: Long,
                        event_type: String, value: Double)

/** A per-entity snapshot — same columns and values as one row of the
  * batch e12 relation ([[EventsBatch.latestState]]). */
case class SnapshotRow(user_id: Long, last_event_id: Long, last_type: String,
                       last_value: Double, last_ts_us: Long, first_ts_us: Long,
                       n_versions: Long)

/** The e12 latest-state compaction as a LIVE operator: the
  * stream-maintained side of the stream/table duality — each micro-batch
  * updates a per-entity snapshot cell and emits the entity's current
  * snapshot row, i.e. a continuously-maintained materialized view of the
  * upsert log (what a lakehouse MERGE materializes nightly, kept fresh
  * per batch).
  *
  * Faithfulness: the batch relation reduces the log with
  * max(struct(ts, event_id, …)); the stream applies the same total order
  * — a row replaces the cell iff (us, event_id) is strictly greater —
  * with rows within a micro-batch folded in that order, so replaying the
  * whole log in any batch split is bit-identical to batch e12
  * (StatefulStreamingSpec asserts it, split mid-stream). The money value
  * is rounded exactly as the batch's DECIMAL(18,2) cast (HALF_UP).
  * n_versions counts every delivered row, which is precisely what the
  * batch count(1) does.
  *
  * Scale posture: state is ONE fixed-size snapshot cell per entity —
  * bounded by the entity dimension, not the stream length; entities
  * hash-partition the state store. NoTimeout mirrors the
  * finite-dimension argument of [[StatefulAnomalies]]; swap in an
  * event-time timeout to retire entities past their retention window. */
object StatefulLatestState {

  def snapshots(ds: Dataset[VersionEvent]): Dataset[SnapshotRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[VersionEvent], state: GroupState[SnapshotRow]) =>
          var s = state.getOption.orNull
          rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            val v = BigDecimal(r.value)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            s =
              if (s == null)
                SnapshotRow(user, r.event_id, r.event_type, v, r.us, r.us, 1L)
              else {
                val newer = r.us > s.last_ts_us ||
                  (r.us == s.last_ts_us && r.event_id > s.last_event_id)
                if (newer)
                  SnapshotRow(user, r.event_id, r.event_type, v, r.us,
                    math.min(s.first_ts_us, r.us), s.n_versions + 1)
                else
                  s.copy(first_ts_us = math.min(s.first_ts_us, r.us),
                    n_versions = s.n_versions + 1)
              }
          }
          state.update(s)
          s
      }
  }
}
