package graft

import graft.streaming.{SessionEvent, StatefulSessionsTws}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The event-time-timer sessionizer emits EXACTLY the batch gap-rule
  * sessions: in-batch splits immediately, tail sessions when the
  * watermark passes their gap horizon (the timer path). */
class TwsSessionsSpec extends GraftSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // all times sit above a base: the initial event-time watermark is 0,
  // and the v2 operator drops input at or below the watermark as late —
  // a fixture event at second 0 would silently vanish
  private val BaseSec = 100000L

  private def ev(user: Long, eid: Long, sec: Long): SessionEvent = {
    val us = (BaseSec + sec) * 1000000L
    SessionEvent(user, eid, us, new java.sql.Timestamp(us / 1000L))
  }

  /** The batch e4 rule, in-process: split when floor-second gap > gapSec. */
  private def reference(evs: Seq[SessionEvent],
                        gapSec: Long): Seq[(Long, Long, Long, Long)] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.us, e.event_id))
      val sessions = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long)]
      var start = -1L; var last = -1L; var n = 0L
      sorted.foreach { e =>
        if (n == 0L) { start = e.us; last = e.us; n = 1L }
        else if (e.us / 1000000L - last / 1000000L > gapSec) {
          sessions += ((u, start, last, n)); start = e.us; last = e.us; n = 1L
        } else { last = e.us; n += 1L }
      }
      if (n > 0L) sessions += ((u, start, last, n))
      sessions.toSeq
    }.sortBy(t => (t._1, t._2))

  test("tws sessions equal the batch gap rule; tail sessions close on the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: [0,10,20] then [2000,2010] then [5000] — two splits
    // user 2: [100, 1900] is ONE session (floor-gap exactly 1800 does
    // not split — the batch > rule), then [3800] splits
    val batch1 = Seq(ev(1, 1, 0), ev(1, 2, 10), ev(1, 3, 20),
      ev(2, 4, 100), ev(2, 5, 1900))
    val batch2 = Seq(ev(1, 6, 2000), ev(1, 7, 2010), ev(1, 8, 5000),
      ev(2, 9, 3800))
    val fixture = batch1 ++ batch2
    val sentinelSec = 10000000L
    withRocksDb {
      val input = MemoryStream[SessionEvent]
      val q = StatefulSessionsTws.sessions(input.toDS(), gapSec = 1800L)
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_sessions").start()
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        // watermark pushers: two sentinel batches far in the future fire
        // every pending timer (the second also closes the first's session)
        input.addData(ev(999L, 100L, sentinelSec)); q.processAllAvailable()
        input.addData(ev(998L, 101L, sentinelSec * 2)); q.processAllAvailable()
        val got = spark.sql(
            """SELECT user_id, start_us, end_us, n_events
              |FROM tws_sessions WHERE user_id < 100""".stripMargin)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2))
        val want = reference(fixture, 1800L)
        assert(want.size === 5, s"fixture must produce 5 sessions, got $want")
        assert(got.toSeq === want)
      } finally q.stop()
    }
  }

  test("cross-batch out-of-order events absorb by min/max, stragglers emit retro") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // gap 30 s, watermark delay 2000 s so a batch-2 event EARLIER than
    // batch 1's can still be above the watermark (the late-but-valid
    // path the per-user-ordered fixture above never exercises).
    // user 1: b1 [2000, 2010]; b2 delivers 2005 LATE then 2038.
    //   A plain last_us := r.us absorb would set last backward to 2005
    //   and split at 2038 (2038-2005=33 > 30); the batch rule on the
    //   sorted events (0,5,10,38 gaps 5,5,28) keeps ONE session.
    // user 3: b1 [3000]; b2 delivers 1500 — above the watermark (1000)
    //   but a full gap BEFORE the live session's start: it cannot
    //   extend [3000,3000]; it emits as a singleton retro-session,
    //   exactly what the batch rule yields for the sorted pair.
    val batch1 = Seq(ev(1, 1, 2000), ev(1, 2, 2010), ev(3, 3, 3000))
    val batch2 = Seq(ev(1, 4, 2005), ev(1, 5, 2038), ev(3, 6, 1500))
    val fixture = batch1 ++ batch2
    val sentinelSec = 10000000L
    withRocksDb {
      val input = MemoryStream[SessionEvent]
      val q = StatefulSessionsTws.sessions(input.toDS(), gapSec = 30L,
          watermarkDelay = "2000 seconds")
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_sessions_ooo").start()
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        input.addData(ev(999L, 100L, sentinelSec)); q.processAllAvailable()
        input.addData(ev(998L, 101L, sentinelSec * 2)); q.processAllAvailable()
        val got = spark.sql(
            """SELECT user_id, start_us, end_us, n_events
              |FROM tws_sessions_ooo WHERE user_id < 100""".stripMargin)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2))
        val want = reference(fixture, 30L)
        assert(want.size === 3, s"fixture must produce 3 sessions, got $want")
        assert(got.toSeq === want)
      } finally q.stop()
    }
  }

  test("same-batch gap-distant stragglers coalesce into merged retro-sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // gap 30 s, watermark delay 2000 s. Both users have a live session at
    // 3000 and receive TWO stragglers in one later batch, each a full gap
    // before the live start:
    // user 5: stragglers 1500, 1510 — within gapSec of EACH OTHER, so the
    //   batch rule merges them into ONE retro-session [1500,1510] n=2
    //   (per-event singleton emission would over-split this to two rows);
    // user 6: stragglers 1500, 1600 — gap 100 > 30 between them, so they
    //   stay two singleton retro-sessions.
    val batch1 = Seq(ev(5, 1, 3000), ev(6, 2, 3000))
    val batch2 = Seq(ev(5, 3, 1500), ev(5, 4, 1510),
      ev(6, 5, 1500), ev(6, 6, 1600))
    val fixture = batch1 ++ batch2
    val sentinelSec = 10000000L
    withRocksDb {
      val input = MemoryStream[SessionEvent]
      val q = StatefulSessionsTws.sessions(input.toDS(), gapSec = 30L,
          watermarkDelay = "2000 seconds")
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_sessions_retro").start()
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        input.addData(ev(999L, 100L, sentinelSec)); q.processAllAvailable()
        input.addData(ev(998L, 101L, sentinelSec * 2)); q.processAllAvailable()
        val got = spark.sql(
            """SELECT user_id, start_us, end_us, n_events
              |FROM tws_sessions_retro WHERE user_id < 100""".stripMargin)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2))
        val want = reference(fixture, 30L)
        assert(want.size === 5, s"fixture must produce 5 sessions, got $want")
        assert(got.toSeq === want)
      } finally q.stop()
    }
  }
}
