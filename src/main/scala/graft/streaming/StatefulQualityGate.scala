package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One order observation on the ingest stream — the k18 row-level
  * quality domain (custkey nullability, status domain, total sign),
  * pre-keyed to its month partition. */
case class OrderObs(month: Long, custkey: Option[Long], status: String,
                    totalprice: Double)

/** One per-month counter snapshot. `n` is the month's monotone arrival
  * counter — consumers take the max-`n` emission per month and SUM
  * months for the corpus metrics, exactly the batch k18 read-off
  * (completeness/domain/sign per-milles from the summed counters;
  * month continuity from the emitted month set vs its span). */
case class QualityCounters(month: Long, n: Long, custkey_nonnull: Long,
                           status_ok: Long, total_pos: Long)

/** k18's MERGEABLE expectation metrics as a LIVE streaming gate: each
  * month partition holds four integer counters; a batch folds its
  * arrivals in and emits the month's updated snapshot. The streaming
  * face of the same algebra the batch key rests on — conditional
  * counts are commutative-associative sums, so the maintained metrics
  * are independent of delivery order and micro-batch split (the
  * StatefulQualityGateSpec replay ties two different splits to the
  * batch key bit-for-bit). The uniqueness check is deliberately OUT of
  * the twin's scope: it needs per-key first-seen state (the streaming
  * dropDuplicates class, StreamingCorpus's domain), not counters.
  *
  * Scale posture: state is four longs per month — bounded by the
  * calendar, not the stream; months hash-partition the state store,
  * and the corpus read-off is a months-sized fold downstream, never a
  * rescan. The gate's verdicts (metric >= threshold) stay a pure map
  * over the emitted counters. */
object StatefulQualityGate {

  val StatusDomain = Set("O", "F", "P")

  /** Fold one arrival into the counters — shared by the streaming
    * update and the spec's in-process recompute. */
  def fold(c: QualityCounters, o: OrderObs): QualityCounters =
    QualityCounters(c.month, c.n + 1,
      c.custkey_nonnull + (if (o.custkey.isDefined) 1 else 0),
      c.status_ok + (if (StatusDomain(o.status)) 1 else 0),
      c.total_pos + (if (o.totalprice > 0d) 1 else 0))

  def gate(ds: Dataset[OrderObs]): Dataset[QualityCounters] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.month)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (month: Long, rows: Iterator[OrderObs],
         state: GroupState[QualityCounters]) =>
          val updated = rows.foldLeft(state.getOption
            .getOrElse(QualityCounters(month, 0L, 0L, 0L, 0L)))(fold)
          state.update(updated)
          Iterator.single(updated)
      }
  }
}
