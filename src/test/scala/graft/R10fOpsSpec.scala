package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-6 keys: g4 k-core peel,
  * e36 inactivity hazard table, a55 seasonal decomposition. */
class R10fOpsSpec extends GraftSpec {

  /** In-process peel shared by the two g4 tests. Returns
    * (nNodes, nEdges, coreNodes, coreEdges, rounds). */
  private def peelRecompute(dir: String): (Long, Long, Long, Long, Int) = {
    val baskets = Tables.sales(spark, dir)
      .select(col("l_orderkey"), col("sku")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = baskets.groupBy(_._1).values.flatMap { items =>
      val sk = items.map(_._2).distinct.sorted
      for (i <- sk.indices; j <- i + 1 until sk.length) yield (sk(i), sk(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    var surv = edges.flatMap(e => Seq(e._1, e._2)).distinct.toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val alive = edges.filter(e => surv(e._1) && surv(e._2))
      val deg = alive.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val next = surv.filter(v => deg.getOrElse(v, 0) >= 3)
      changed = next.size != surv.size
      surv = next
      rounds += 1
    }
    assert(rounds <= 16, "oracle unroll budget")
    val coreEdges = edges.count(e => surv(e._1) && surv(e._2)).toLong
    val nNodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
    (nNodes, edges.size.toLong, surv.size.toLong, coreEdges, rounds)
  }

  private def assertKCoreMatches(dir: String): (Long, Long) = {
    val (nNodes, nEdges, coreN, coreE, _) = peelRecompute(dir)
    val r = graft.analytics.Graph.kCore(spark, dir).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == nNodes)
    assert(r.getLong(2) == nEdges)
    assert(r.getLong(3) == coreN)
    assert(r.getLong(4) == coreE)
    (coreN, nNodes)
  }

  test("g4: core matches an in-process peel to fixpoint") {
    assertKCoreMatches(sfDir)
  }

  test("g4: at sf0.01 the peel actually bites — a non-empty core that " +
      "is a strict subset of the graph") {
    // the sf0.001 co-purchase graph is so dense the whole graph IS its
    // 3-core; the oracle SF is where the fixture exercises the loop
    // (11 peel rounds, 935 of 1,880 nodes survive)
    val (coreN, nNodes) = assertKCoreMatches("/root/testdata/sf0.01")
    assert(coreN > 0 && coreN < nNodes)
  }

  test("e36: hazard table matches an in-process life-table recompute " +
      "and observations conserve") {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).cast("string")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val horizon = days.map(_._2).max
    def epochDay(s: String) =
      java.time.LocalDate.parse(s).toEpochDay
    val obs = days.groupBy(_._1).values.flatMap { ds =>
      val sorted = ds.map(_._2).sorted
      val complete = sorted.zip(sorted.tail).map { case (a, b) =>
        (math.min(epochDay(b) - epochDay(a), 30L), 1L) }
      complete :+ ((math.min(epochDay(horizon) - epochDay(sorted.last), 30L), 0L))
    }.toSeq
    val expect = (0L to 30L).flatMap { t =>
      val atRisk = obs.count(_._1 >= t).toLong
      if (atRisk == 0) None
      else {
        val ev = obs.count(o => o._1 == t && o._2 == 1L).toLong
        val cen = obs.count(o => o._1 == t && o._2 == 0L).toLong
        Some(t -> (atRisk, ev, cen, ev * 1000 / atRisk))
      }
    }.toMap
    val got = graft.streaming.EventsBatch.hazardTable(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    // every observation lands in exactly one bucket; t=0 at-risk is all
    assert(got.values.map(o => o._2 + o._3).sum == obs.size.toLong)
    assert(got(0L)._1 == obs.size.toLong)
  }

  test("a55: decomposition matches an in-process recompute and the " +
      "components re-assemble the series where defined") {
    val series = Tables.sales(spark, sfDir)
      .groupBy(col("sale_date"))
      .agg(((sum(col("line_total")) - sum(col("discount_amount"))) * 100)
        .cast("decimal(18,0)").cast("long").as("net_c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = series.length
    val trend = series.indices.map { i =>
      if (i >= 3 && i < n - 3)
        Some((i - 3 to i + 3).map(series(_)._2).sum / 7)
      else None
    }
    val dow = series.map { case (d, _) =>
      java.time.LocalDate.parse(d).getDayOfWeek.getValue % 7 + 1L // 1=Sunday
    }
    val detr = series.indices.map(i => trend(i).map(series(i)._2 - _))
    val seas = (1L to 7L).map { w =>
      val xs = series.indices.filter(dow(_) == w).flatMap(detr(_))
      w -> (if (xs.isEmpty) None else Some(xs.sum / xs.size))
    }.toMap
    val got = graft.analytics.Series.seasonalDecompose(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    series.indices.foreach { i =>
      val (d, net) = series(i)
      val expRem = for { t <- trend(i); s <- seas(dow(i)) } yield net - t - s
      assert(got(d) == ((net, dow(i), trend(i), seas(dow(i)), expRem)), s"date $d")
      // additivity: trend + seasonal + remainder == net where defined
      expRem.foreach(r => assert(trend(i).get + seas(dow(i)).get + r == net))
    }
    assert(got.size == n)
    // the MA window must actually bite: some defined trends exist
    assert(trend.exists(_.isDefined))
  }
}
