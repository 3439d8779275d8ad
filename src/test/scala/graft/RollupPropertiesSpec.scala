package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property tests of the rollup algebra (SURVEY.md §5) over
  * GENERATED sales frames — not the fixed testdata — so the invariants
  * hold for arbitrary inputs including ties, single rows, and one-store
  * days. Frames are tiny (Spark overhead per case), cases few. Uses raw
  * ScalaCheck (the scalatest bridge artifact isn't in the offline cache):
  * each property runs through Test.check with a fixed case budget. */
class RollupPropertiesSpec extends AnyFunSuite {

  private def checkProp(p: Prop, cases: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  private lazy val spark = GraftSpec.session
  import scala.jdk.CollectionConverters._

  private case class Line(store: String, date: String, sku: Long,
                          qty: Long, total: BigDecimal, disc: BigDecimal)

  private val genLine: Gen[Line] = for {
    store <- Gen.oneOf("0001", "0002", "0003")
    date <- Gen.oneOf("2024-01-01", "2024-01-02")
    sku <- Gen.choose(1L, 6L)
    qty <- Gen.choose(1L, 5L)
    cents <- Gen.choose(100L, 99999L)
    discCents <- Gen.choose(0L, 99L)
  } yield Line(store, date, sku, qty,
    BigDecimal(cents) / 100, BigDecimal(discCents) / 100)

  private val genFrame: Gen[List[Line]] = Gen.nonEmptyListOf(genLine)

  private def toDf(lines: List[Line]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("store_id", StringType), StructField("sale_date", StringType),
      StructField("sku", LongType), StructField("quantity", LongType),
      StructField("line_total", DecimalType(18, 2)),
      StructField("discount_amount", DecimalType(18, 2))))
    val rows = lines.map(l => org.apache.spark.sql.Row(
      l.store, l.date, l.sku, l.qty,
      l.total.setScale(2).bigDecimal, l.disc.setScale(2).bigDecimal))
    spark.createDataFrame(rows.asJava, schema)
  }

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("store_id"), col("sale_date"))
      .agg(sum(col("line_total")).as("gross"),
        sum(col("discount_amount")).as("disc"),
        count(lit(1)).as("txn"),
        sum(col("quantity")).as("items"))

  test("net = gross - discount and company rollup = sum of store rollups") {
    checkProp(Prop.forAll(genFrame) { lines =>
      val sd = rollup(toDf(lines)).cache()
      try {
        val withNet = sd.withColumn("net", col("gross") - col("disc"))
        assert(withNet.filter(col("net") =!= col("gross") - col("disc")).count() === 0)
        val company = sd.groupBy("sale_date")
          .agg(sum("gross").as("c_gross"), sum("txn").as("c_txn"))
        val direct = toDf(lines).groupBy("sale_date")
          .agg(sum("line_total").as("d_gross"), count(lit(1)).as("d_txn"))
        val j = company.join(direct, "sale_date")
        j.filter(col("c_gross") =!= col("d_gross") ||
          col("c_txn") =!= col("d_txn")).count() === 0L
      } finally sd.unpersist()
    })
  }

  test("top-k per group is the k-prefix of the full ranking, ties broken by sku") {
    checkProp(Prop.forAll(genFrame) { lines =>
      val df = toDf(lines)
      val perSku = df.groupBy(col("store_id"), col("sale_date"), col("sku"))
        .agg(sum(col("line_total") - col("discount_amount")).as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("store_id"), col("sale_date"))
        .orderBy(col("rev").desc, col("sku").asc)
      val ranked = perSku.withColumn("rank", row_number().over(w)).cache()
      try {
        val top2 = ranked.filter(col("rank") <= 2)
        // containment + never more than k
        assert(top2.groupBy("store_id", "sale_date").count()
          .filter(col("count") > 2).count() === 0)
        // every non-top row has rev <= the group's rank-2 rev (ties allowed)
        val kth = ranked.filter(col("rank") === 2)
          .select(col("store_id"), col("sale_date"), col("rev").as("kth_rev"))
        val below = ranked.filter(col("rank") > 2)
          .join(kth, Seq("store_id", "sale_date"))
        below.filter(col("rev") > col("kth_rev")).count() === 0L
      } finally ranked.unpersist()
    })
  }

  test("payment-style partition: per-key sums add up to the total") {
    checkProp(Prop.forAll(genFrame) { lines =>
      val df = toDf(lines).withColumn("method",
        element_at(lit(Array("cash", "credit", "debit")), (col("sku") % 3 + 1).cast("int")))
      val total = df.agg(sum("line_total")).head.getDecimal(0)
      val parts = df.groupBy("method").agg(sum("line_total").as("s"))
        .agg(sum("s")).head.getDecimal(0)
      total == parts
    })
  }
}
