package graft

import graft.model.Tables
import org.apache.spark.sql.functions._

/** Round-11 operators: in-process recomputes against the engine
  * relations (the oracle certifies engine-vs-DuckDB; these certify
  * engine-vs-straight-line-Scala on the same fixture). */
class R11OpsSpec extends GraftSpec {

  test("g8: personalized PageRank matches an in-process integer-micro " +
      "random-walk-with-restart over the same pruned graph") {
    // rebuild the support-pruned weighted co-purchase graph
    val baskets = Tables.sales(spark, sfDir)
      .select(col("l_orderkey").as("order_id"), col("sku")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = baskets.groupBy(_._1).values.flatMap { b =>
      val skus = b.map(_._2).distinct.sorted
      for (i <- skus.indices; j <- (i + 1) until skus.length)
        yield (skus(i), skus(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toSeq
    assert(pairs.nonEmpty, "pruned graph must be non-empty at this SF")
    val de = pairs.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val wdeg = de.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = wdeg.keySet.toSeq.sorted
    val seeds = nodes.take(4)
    val ns = seeds.size.toLong
    var rank = nodes.map(v =>
      v -> (if (seeds.contains(v)) 1000000L / ns else 0L)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      de.foreach { case (src, dst, c) =>
        contrib(dst) += (850L * ((rank(src) * c) / wdeg(src))) / 1000L
      }
      rank = nodes.map(v =>
        v -> ((if (seeds.contains(v)) 150000L / ns else 0L) +
          contrib(v))).toMap
    }
    val want = nodes
      .map(v => (v, if (seeds.contains(v)) 1L else 0L, wdeg(v), rank(v)))
      .sortBy(t => (-t._4, t._1)).take(25)
    val got = graft.analytics.Graph.personalizedPagerank(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    // walk mass stays on the restart distribution's support: every
    // positive-rank node is reachable, total mass <= 1e6 (floor leak)
    assert(got.head._4 > 0L)
    assert(rank.values.sum <= 1000000L)
  }

  test("g9: weighted SSSP matches an in-process Bellman-Ford over the " +
      "same pruned graph with the same round bound") {
    val baskets = Tables.sales(spark, sfDir)
      .select(col("l_orderkey").as("order_id"), col("sku")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = baskets.groupBy(_._1).values.flatMap { b =>
      val skus = b.map(_._2).distinct.sorted
      for (i <- skus.indices; j <- (i + 1) until skus.length)
        yield (skus(i), skus(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toSeq
    val de = pairs.flatMap { case ((a, b), c) =>
      val w = 1000L / c + 1L
      Seq((a, b, w), (b, a, w))
    }
    val nodes = de.map(_._1).distinct.sorted
    val seeds = nodes.take(8)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 8) {
      val next = scala.collection.mutable.Map[Long, Long]() ++ dist
      de.foreach { case (u, v, w) =>
        dist.get(u).foreach { du =>
          if (!next.contains(v) || next(v) > du + w) next(v) = du + w
        }
      }
      dist = next.toMap
    }
    val want = dist.toSeq
      .map { case (v, d) => (v, if (seeds.contains(v)) 1L else 0L, d) }
      .sortBy(t => (t._3, t._1)).take(25)
    val got = graft.analytics.Graph.weightedSssp(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    // triangle-inequality sanity on the readout: seeds at 0, distances
    // non-decreasing down the list
    assert(got.filter(_._2 == 1L).forall(_._3 == 0L))
    assert(got.map(_._3).sliding(2).forall {
      case Seq(a, b) => a <= b
      case _ => true
    })
  }
}
