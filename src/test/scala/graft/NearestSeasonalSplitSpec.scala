package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsBatch
import graft.analytics.Trends
import graft.text.CorpusPrep
import graft.model.Tables

/** Invariants for e29 nearest-event, a42 seasonal index, and p19
  * cluster-aware split. */
class NearestSeasonalSplitSpec extends GraftSpec {

  test("e29: choice matches an exact in-process nearest-within-horizon scan") {
    val H = 1800000000L
    val events = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type")).collect()
    val byUser = events.groupBy(_.getLong(1))
    val out = EventsBatch.nearestEvent(spark, sfDir).collect()
    val outMap = out.map(r => r.getLong(0) -> r).toMap
    byUser.foreach { case (_, rows) =>
      val views = rows.filter(_.getString(3) == "view").map(_.getLong(2)).sorted
      rows.filter(_.getString(3) == "purchase").foreach { p =>
        val pu = p.getLong(2)
        val b = views.filter(_ <= pu).lastOption.filter(pu - _ <= H)
        val f = views.filter(_ > pu).headOption.filter(_ - pu <= H)
        val want: Option[Long] = (b, f) match {
          case (Some(bv), Some(fv)) =>
            if (pu - bv <= fv - pu) Some(bv) else Some(fv)
          case (Some(bv), None) => Some(bv)
          case (None, Some(fv)) => Some(fv)
          case _ => None
        }
        val r = outMap(p.getLong(0))
        val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
        assert(got == want, s"purchase ${p.getLong(0)}")
        want.foreach { v =>
          assert(r.getString(5) == (if (pu - v >= 0) "backward" else "forward"))
        }
        if (want.isEmpty) assert(r.getString(5) == "none")
      }
    }
  }

  test("a42: per-store day counts conserve and the day-weighted index means 1") {
    val out = Trends.seasonalIndex(spark, sfDir).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val nDays = rows.map(_.getAs[Long]("n_days_dow")).sum
      val weighted = rows.map(r =>
        r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_days_dow")).sum
      // Σ (index · share) = 1 exactly in real arithmetic; float eps here
      assert(math.abs(weighted / nDays - 1.0) < 1e-9)
    }
  }

  test("e30: arm assignment, counts, and z-score match an in-process recomputation") {
    val users = Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) =>
        u -> (rows.count(_.getString(1) == "purchase") * 10 >= rows.length * 3) }
    def arm(u: Long) = if (((u % 1000000007L) * 2654435761L) % 1000L < 500L) "A" else "B"
    val nA = users.count(kv => arm(kv._1) == "A").toLong
    val cA = users.count(kv => arm(kv._1) == "A" && kv._2).toLong
    val nB = users.count(kv => arm(kv._1) == "B").toLong
    val cB = users.count(kv => arm(kv._1) == "B" && kv._2).toLong
    val r = EventsBatch.abReadout(spark, sfDir).head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b")) == (nA, cA, nB, cB))
    assert(r.getAs[Long]("rate_a_milli") == cA * 1000 / nA)
    assert(r.getAs[Long]("lift_milli") ==
      cB * 1000 / nB - cA * 1000 / nA)
    val pPool = (cA + cB).toDouble / (nA + nB).toDouble
    if (pPool == 0.0 || pPool == 1.0) assert(r.isNullAt(7))
    else {
      val z = (cB.toDouble / nB.toDouble - cA.toDouble / nA.toDouble) /
        math.sqrt(pPool * (1.0 - pPool) * (1.0 / nA.toDouble + 1.0 / nB.toDouble))
      assert(r.getAs[Double]("z_score") == z)
    }
  }

  test("p19: zero cross-split near-dup pairs by construction; singletons never move") {
    val split = CorpusPrep.clusterSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(4), r.getAs[Long]("cluster_size"),
        r.getAs[Boolean]("moved"))).toMap
    // singleton ⇒ label = own id ⇒ unmoved
    split.foreach { case (_, (_, size, moved)) =>
      if (size == 1) assert(!moved)
    }
    // re-derive the leak audit over final_split: must be identically zero
    val pairs = graft.dedup.Dedup.ngramJaccard(spark, sfDir, 0.5)
      .select("doc_a", "doc_b").collect()
    pairs.foreach { r =>
      val a = split(r.getLong(0))._1
      val b = split(r.getLong(1))._1
      assert(a == b, s"near-dup pair ${r.getLong(0)}/${r.getLong(1)} straddles $a/$b")
    }
  }
}
