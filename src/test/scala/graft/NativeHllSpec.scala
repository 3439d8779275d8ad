package graft

import org.apache.spark.sql.functions._

/** sk18's anchors: the datasketches estimate stays inside its published
  * error envelope of the in-row exact column, and same-lgK union is
  * LOSSLESS — the merged company estimate equals the direct one. */
class NativeHllSpec extends GraftSpec {

  private lazy val rows =
    graft.analytics.NativeHll.nativeHll(spark, sfDir).collect()

  test("sk18: estimates stay within 3x the lgK=12 RSE of the exact counts") {
    // datasketches HLL RSE ~ 1.04 / sqrt(2^lgK); 3 sigma + 1 abs slack
    val bound = 3.0 * 1.04 / math.sqrt(1 << 12)
    val stores = rows.filterNot(_.getString(0).startsWith("__"))
    assert(stores.nonEmpty)
    stores.foreach { r =>
      val (est, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(est - exact) <= exact * bound + 1.0,
        s"store ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("sk18: same-lgK union is lossless — merged and direct company " +
      "estimates are identical, and both track the exact company count") {
    val byKey = rows.filter(_.getString(0).startsWith("__"))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (direct, exactD) = byKey("__company_direct__")
    val (merged, exactM) = byKey("__company_merged__")
    assert(exactD == exactM)
    assert(direct == merged,
      "register-wise max union must reproduce the direct sketch estimate")
    val bound = 3.0 * 1.04 / math.sqrt(1 << 12)
    assert(math.abs(direct.toDouble - exactD) <= exactD * bound + 1.0)
  }

  test("sk18: determinism — a second evaluation is bit-identical") {
    val again = graft.analytics.NativeHll.nativeHll(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
