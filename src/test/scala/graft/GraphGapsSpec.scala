package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsBatch
import graft.model.Tables

/** Invariants for e27 (integer PageRank over the type-transition
  * graph) and a40 (inter-purchase gap histogram). */
class GraphGapsSpec extends GraftSpec {

  test("e27: ranks match an exact in-process recomputation of the integer iteration") {
    val edges = EventsBatch.typePagerank(spark, sfDir) // force once for shape
    val edgeRows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r =>
          (r.getAs[java.sql.Timestamp]("ts").getTime, r.getLong(2)))
        val types = sorted.map(_.getString(3)).toList
        types.zip(types.drop(1))
      }
      .groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val out = edges.collect()
    val nodes = out.map(_.getString(0)).toSeq.sorted
    val n = nodes.length.toLong
    val outc = edgeRows.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var rank = nodes.map(_ -> 1000000L / n).toMap
    (1 to 3).foreach { _ =>
      val contrib = scala.collection.mutable.Map[String, Long]()
      edgeRows.foreach { case ((from, to), c) =>
        val t = (850L * ((rank(from) * c) / outc(from))) / 1000L
        contrib(to) = contrib.getOrElse(to, 0L) + t
      }
      rank = nodes.map(v => v -> (150000L / n + contrib.getOrElse(v, 0L))).toMap
    }
    out.foreach { r =>
      assert(r.getAs[Long]("rank_micro") == rank(r.getString(0)),
        s"rank mismatch for ${r.getString(0)}")
      assert(r.getAs[Long]("out_transitions") ==
        outc.getOrElse(r.getString(0), 0L))
    }
  }

  test("e27: conservation bound — total mass stays within floor loss of 1e6") {
    val out = EventsBatch.typePagerank(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("rank_micro")).sum
    assert(total <= 1000000L)
    // each of n nodes can lose <1 micro per floor per term; 3 iterations
    // of |nodes| aggregates plus the teleport floor keeps the loss tiny
    assert(total > 900000L)
  }

  test("a40: gap count conserves (orders minus first orders) and buckets are legal") {
    val out = graft.analytics.Kpis.interpurchaseGaps(spark, sfDir).collect()
    val nGaps = out.map(_.getAs[Long]("n_gaps")).sum
    val o = Tables.orders(spark, sfDir)
    val nOrders = o.count()
    val nCust = o.agg(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(nGaps == nOrders - nCust)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b <= 8L || java.lang.Long.bitCount(b) == 1,
        s"bucket $b is neither exact (<=8) nor a power of two")
      assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_gaps"))
    }
  }
}
