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
