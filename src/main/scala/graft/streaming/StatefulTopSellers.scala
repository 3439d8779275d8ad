package graft.streaming

import scala.collection.mutable

import graft.functions.TopKByCount
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One sales line on the stream (the sk3 input, incrementally). */
case class SaleLine(store_id: String, sku: String)

/** A per-batch top-seller emission: the store's current Misra-Gries
  * top-k after `n_seen` total lines. */
case class TopSellerUpdate(store_id: String, n_seen: Long, rank: Int,
                           sku: String, est_count: Long, max_err: Long)

/** Streaming twin of sk3 ([[graft.analytics.Sketches.storeTopSellers]]):
  * a live "top products right now" board maintained incrementally — the
  * read path the reference's dashboard polls, kept warm by the stream
  * instead of recomputed per request.
  *
  * The state per store is the SAME bounded Misra-Gries summary the batch
  * aggregate carries — `summarySize` entries and one error counter, by
  * calling the identical [[TopKByCount.updateOne]] algebra (parity by
  * construction, not by reimplementation; spec-asserted in the exact
  * regime). That bound is the 100 TB argument: per-key streaming state
  * that grows with the distinct-sku space dies on a wide catalog;
  * Misra-Gries state is `summarySize` entries per store FOREVER, no
  * watermark needed, while still certifying est ≤ true ≤ est + max_err.
  */
object StatefulTopSellers {

  /** Serializable state snapshot (the product encoder carries Map). */
  case class MGState(counts: Map[String, Long], decs: Long, nSeen: Long)

  def topSellers(lines: Dataset[SaleLine], summarySize: Int = 32,
                 topK: Int = 5): Dataset[TopSellerUpdate] = {
    import lines.sparkSession.implicits._
    lines.groupByKey(_.store_id)
      .flatMapGroupsWithState[MGState, TopSellerUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (store, rows, state) =>
          val prior = state.getOption
          val mg = prior match {
            case Some(s) =>
              new TopKByCount.MG(mutable.HashMap(s.counts.toSeq: _*), s.decs)
            case None => new TopKByCount.MG(mutable.HashMap.empty, 0L)
          }
          var n = prior.map(_.nSeen).getOrElse(0L)
          rows.foreach { r =>
            TopKByCount.updateOne(mg, r.sku, summarySize)
            n += 1
          }
          state.update(MGState(mg.toMap, mg.decs, n))
          mg.entries.toSeq.sortBy { case (k, c) => (-c, k) }.take(topK)
            .zipWithIndex.iterator.map { case ((k, c), i) =>
              TopSellerUpdate(store, n, i + 1, k, c, mg.decs)
            }
      }
  }
}
