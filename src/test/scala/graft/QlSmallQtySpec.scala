package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.analytics.Star
import graft.model.Tables

/** Exact in-process recomputations for h3 query-likelihood retrieval
  * and j11 small-quantity revenue. */
class QlSmallQtySpec extends GraftSpec {

  test("h3: charges and ranking match the integer formulas recomputed in-process") {
    val docs = graft.text.Corpus.docsTok(spark, sfDir)
      .select(col("doc_id"), col("words")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val nDocs = docs.size.toLong
    val tTotal = docs.values.map(_.size.toLong).sum
    val tf = docs.map { case (d, ws) =>
      d -> ws.groupBy(x => x).view.mapValues(_.size.toLong).toMap }
    val df = docs.values.flatMap(_.distinct).groupBy(x => x)
      .view.mapValues(_.size.toLong).toMap
    val cf = docs.values.flatten.groupBy(x => x)
      .view.mapValues(_.size.toLong).toMap
    val kept = df.keySet.filter(w => df(w) * 100 <= 78 * nDocs)
    def cfp(w: String) = math.max(cf(w) * 1048576L / tTotal, 1L)
    def mlog(qr: Long): Long = {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(qr)
      val p = 1L << b
      (b - 10) * 1000 + (qr - p) * 1000 / p
    }
    val mu = 300L
    val out = TextAnalysis.queryLikelihood(spark, sfDir).collect()
    val queries = (0L until 3L)
    queries.foreach { q =>
      val qws = tf(q).keySet.intersect(kept).toList.sorted
      val cands = docs.keys.filter(d => d != q &&
        qws.exists(w => tf(d).contains(w) && kept(w))).toList
      val scored = cands.map { d =>
        val dl = docs(d).size.toLong
        val charge = qws.map { w =>
          val t = tf(d).getOrElse(w, 0L)
          val qr = ((dl + mu) * 1048576L * 1024L) /
            (t * 1048576L + mu * cfp(w))
          mlog(qr)
        }.sum
        (d, charge)
      }.sortBy { case (d, s) => (s, d) }.take(5)
      val got = out.filter(_.getLong(0) == q)
        .sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_milli")))
      assert(got.toSeq == scored.map(x => (x._1, x._2)).toSeq, s"query $q")
    }
  }

  test("j11: qualifying lines and brand revenue match a BigDecimal recomputation") {
    val brands = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong,
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val byPart = lines.groupBy(_._1)
    val agg = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
    byPart.foreach { case (pk, ls) =>
      val n = ls.length.toLong
      val sumQty = ls.map(_._2).sum
      ls.foreach { case (_, qty, price) =>
        if (qty * 5 * n < sumQty) {
          val b = brands(pk)
          val (c, s) = agg.getOrElse(b, (0L, BigDecimal(0)))
          agg(b) = (c + 1, s + price)
        }
      }
    }
    val out = Star.smallQtyRevenue(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet == agg.keySet)
    out.foreach { r =>
      val (c, s) = agg(r.getString(0))
      assert(r.getLong(1) == c)
      assert(r.getLong(2) == (s * 100).toLongExact)
    }
  }
}
