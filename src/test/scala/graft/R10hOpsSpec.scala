package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-8 keys: er4 blocking-quality
  * audit, k20 functional-dependency audit. */
class R10hOpsSpec extends GraftSpec {

  test("er4: blocking metrics match an in-process recompute of both " +
      "passes, and the brand pass covers every true pair by construction") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4)))
    val clean = parts.map { case (k, n, b, t, s) => (k, n, b, t, s) }
    val dirty = parts.map { case (k, n, b, t, s) =>
      val h = ((k % 1000000007L) * 2654435761L % n.length).toInt
      val nd = n.substring(0, h) + n.substring(math.min(h + 1, n.length))
      (k, nd, b, if (k % 4 == 0) "UNKNOWN" else t, s)
    }
    def pass(block: ((Long, String, String, String, Int),
                     (Long, String, String, String, Int)) => Boolean) =
      (for {
        c <- clean; d <- dirty
        if c._5 == d._5 && (c._2.length - d._2.length) >= 0 &&
          (c._2.length - d._2.length) <= 2 && block(c, d)
      } yield (c._1, d._1)).distinct
    val b1 = pass((c, d) => c._3 == d._3)
    val b2 = pass((c, d) => c._4 == d._4)
    val union = (b1 ++ b2).distinct
    val n = parts.length.toLong
    def metrics(p: Seq[(Long, Long)]) = {
      val covered = p.count(x => x._1 == x._2).toLong
      (p.size.toLong, covered, n,
        1000L - p.size.toLong * 1000 / (n * n), covered * 1000 / n)
    }
    val expect = Map("brand_size_len" -> metrics(b1),
      "type_size_len" -> metrics(b2), "union" -> metrics(union))
    val got = graft.analytics.Linkage.blockingAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    // the corruption deletes one name char and never touches brand/size,
    // so the brand pass must reach every true pair: recall ceiling 1000
    assert(got("brand_size_len")._5 == 1000L)
    assert(got("union")._5 == 1000L)
    // the type pass must NOT (p_type blanked on every key%4=0 row)
    assert(got("type_size_len")._5 < 1000L)
    // multi-pass insurance is real: the union exceeds each single pass
    assert(got("union")._1 > got("brand_size_len")._1)
    assert(got("union")._1 > got("type_size_len")._1)
  }

  test("k20: every FD verdict matches an in-process recompute, " +
      "key-implied FDs hold, business-rule FDs fail") {
    def check(rows: Array[(Any, Any)]): (Long, Long, Long, Long, Boolean) = {
      val byLhs = rows.groupBy(_._1).map { case (_, xs) =>
        xs.map(_._2).distinct.length.toLong }
      val nLhs = byLhs.size.toLong
      val viol = byLhs.count(_ > 1).toLong
      (nLhs, viol, byLhs.max, viol * 1000 / nLhs, viol == 0)
    }
    def collectPairs(df: org.apache.spark.sql.DataFrame,
                     a: String, b: String): Array[(Any, Any)] =
      df.select(col(a), col(b)).collect().map(r => (r.get(0), r.get(1)))
    val expect = Map(
      "cust_key_nation" -> check(collectPairs(Tables.customer(spark, sfDir), "c_custkey", "c_nationkey")),
      "cust_nation_segment" -> check(collectPairs(Tables.customer(spark, sfDir), "c_nationkey", "c_mktsegment")),
      "ord_key_status" -> check(collectPairs(Tables.orders(spark, sfDir), "o_orderkey", "o_orderstatus")),
      "ord_cust_priority" -> check(collectPairs(Tables.orders(spark, sfDir), "o_custkey", "o_orderpriority")),
      "li_part_supp" -> check(collectPairs(Tables.lineitem(spark, sfDir), "l_partkey", "l_suppkey")),
      "supp_key_nation" -> check(collectPairs(Tables.supplier(spark, sfDir), "s_suppkey", "s_nationkey")))
    val got = graft.analytics.Expectations.fdAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getBoolean(8))).toMap
    assert(got == expect)
    // the fixture exercises both verdicts
    assert(got("cust_key_nation")._5 && got("ord_key_status")._5 &&
      got("supp_key_nation")._5, "key-implied FDs must hold")
    assert(!got("cust_nation_segment")._5 && !got("li_part_supp")._5,
      "business-rule FDs must fail on real data")
  }
}
