package graft

import org.apache.spark.sql.functions._
import graft.vector.Similarity
import graft.analytics.Trends
import graft.model.Tables

/** Invariants for v30 Rocchio PRF and a41 discount elasticity. */
class RocchioElasticitySpec extends GraftSpec {

  test("v30: beta = 0 reproduces v1's ranking bit-for-bit") {
    val prf = Similarity.rocchioExpand(spark, sfDir, beta = 0.0)
      .select("query_id", "rank", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val v1 = Similarity.cosineTopK(spark, sfDir)
      .select("query_id", "rank", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(prf.toSeq == v1.toSeq)
  }

  test("v30: every query emits exactly k rows with ranks 1..k") {
    val out = Similarity.rocchioExpand(spark, sfDir).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
    }
    // feedback flag marks a subset of size <= k drawn from the seed list
    val base = Similarity.cosineTopK(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val marked = r.getBoolean(4)
      assert(marked == base((r.getLong(0), r.getLong(2))))
    }
  }

  test("v31: multi-probe dominates v2 pointwise and flags probe tiers") {
    val v31 = Similarity.multiProbeLsh(spark, sfDir).collect()
    v31.foreach { r =>
      val f = r.getAs[Long]("probe_flips")
      assert(f == 0L || f == 1L, s"probe_flips $f outside the 1-flip probe set")
    }
    // candidates(v31) ⊇ candidates(v2) ⇒ at every rank the multi-probe
    // cosine is at least v2's (ranking dominance — recall can only rise)
    val v2 = Similarity.annLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        r.getAs[Double]("cosine")).toMap
    v31.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Int]("rank"))
      v2.get(key).foreach { c2 =>
        assert(r.getAs[Double]("cosine") >= c2,
          s"rank ${key._2} of query ${key._1} got worse under more probes")
      }
    }
    // every query must emit at least as many rows as under v2
    val n31 = v31.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    val n2 = Similarity.annLsh(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    n2.foreach { case (q, n) => assert(n31.getOrElse(q, 0) >= n) }
  }

  test("v32: ood scores are self-consistent and cover every vector") {
    val out = Similarity.oodScores(spark, sfDir).collect()
    assert(out.length == Tables.embeddings(spark, sfDir).count())
    out.foreach { r =>
      val cos = r.getAs[Double]("best_cos")
      val ood = r.getAs[Long]("ood_milli")
      assert(ood == 1000L - math.floor(cos * 1000).toLong)
      assert(r.getAs[Boolean]("is_outlier") == (ood > 900))
    }
    // the centroid donors sit (near-)exactly on their own centroid
    out.filter(_.getAs[Long]("vec_id") < 8).foreach { r =>
      assert(r.getAs[Long]("ood_milli") <= 1)
    }
  }

  test("a43: backlog drains to zero and both series conserve total quantity") {
    val out = graft.analytics.Trends.fulfillmentBacklog(spark, sfDir)
      .orderBy(col("month")).collect()
    val totalQty = Tables.lineitem(spark, sfDir)
      .agg(sum(col("l_quantity").cast("long"))).head.getLong(0)
    assert(out.map(_.getAs[Long]("qty_ordered")).sum == totalQty)
    assert(out.map(_.getAs[Long]("qty_shipped")).sum == totalQty)
    assert(out.last.getAs[Long]("backlog_qty") == 0L)
    out.foreach(r => assert(r.getAs[Long]("cum_ordered") >=
      r.getAs[Long]("cum_shipped") - totalQty)) // sanity: bounded
  }

  test("a41: slope matches an exact in-process recomputation (same op order)") {
    val brands = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    case class M(var n: Long = 0, var sx: Long = 0, var sy: Long = 0,
                 var sxy: Long = 0, var sxx: Long = 0, var syy: Long = 0)
    val acc = scala.collection.mutable.Map[String, M]()
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_discount", "l_quantity").collect()
      .foreach { r =>
        val b = brands(r.getLong(0))
        val x = BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact
        val y = r.getDouble(2).toLong
        val m = acc.getOrElseUpdate(b, M())
        m.n += 1; m.sx += x; m.sy += y; m.sxy += x * y
        m.sxx += x * x; m.syy += y * y
      }
    val out = Trends.discountElasticity(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet == acc.keySet)
    out.foreach { r =>
      val m = acc(r.getString(0))
      assert(r.getLong(1) == m.n)
      val varx = m.sxx.toDouble - m.sx.toDouble * m.sx.toDouble / m.n.toDouble
      val covxy = m.sxy.toDouble - m.sx.toDouble * m.sy.toDouble / m.n.toDouble
      if (varx == 0.0) assert(r.isNullAt(2))
      else assert(r.getDouble(2) == covxy / varx, s"slope ${r.getString(0)}")
    }
  }
}
