package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A19/J3: upload-completeness check — which expected stores have reported
  * for a date, and which are missing (reference: backend/functions/
  * check-all-stores/lambda_function.py:45-112; the missing-store set is the
  * anti-join at :63).
  *
  * Expected stores = the supplier dimension (broadcast-sized by
  * construction, like the reference's 11-store config). Reported stores =
  * distinct store_id present in the fact table for the date.
  *
  * Scale posture: the reported side reduces to ≤|stores| rows per date
  * BEFORE the join (aggregate-then-join, not join-then-aggregate); the
  * expected side broadcasts. With a date-partitioned lake the date filter
  * is partition pruning, not a scan.
  */
object Completeness {

  def expectedStores(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .select(format_string("%04d", col("s_suppkey")).as("store_id"))

  val expectedStoresSql: String =
    "SELECT printf('%04d', s_suppkey) AS store_id FROM supplier"

  /** J3: stores expected but not reported on `date` — left anti join. */
  def missingStores(spark: SparkSession, dir: String,
                    date: String = Defaults.targetDate): DataFrame = {
    val reported = Tables.salesInRange(spark, dir, date, date)
      .select(col("store_id")).distinct()
    expectedStores(spark, dir)
      .join(reported, Seq("store_id"), "left_anti")
      .orderBy(col("store_id"))
  }

  def missingStoresSql(date: String = Defaults.targetDate): String =
    s"""SELECT store_id FROM ($expectedStoresSql)
       |WHERE store_id NOT IN (
       |  SELECT DISTINCT store_id FROM (${Tables.salesSql})
       |  WHERE sale_date = '$date')
       |ORDER BY store_id""".stripMargin

  /** A19: per-date completeness over a range: reported vs expected counts
    * + the boolean gate that triggers the daily analysis in the reference
    * (check-all-stores:60-65). */
  def completeness(spark: SparkSession, dir: String,
                   from: String = Defaults.rangeStart,
                   to: String = Defaults.rangeEnd): DataFrame = {
    val expected = expectedStores(spark, dir).count() // dimension-sized; driver-side scalar is fine
    Tables.salesInRange(spark, dir, from, to)
      .groupBy(col("sale_date"))
      .agg(countDistinct(col("store_id")).as("stores_reported_count"))
      .select(col("sale_date"), col("stores_reported_count"),
        lit(expected).as("expected_count"),
        (col("stores_reported_count") === expected).as("complete"))
      .orderBy(col("sale_date"))
  }

  def completenessSql(from: String = Defaults.rangeStart,
                      to: String = Defaults.rangeEnd): String =
    s"""WITH expected AS (SELECT COUNT(*) AS n FROM ($expectedStoresSql))
       |SELECT sale_date,
       |  COUNT(DISTINCT store_id) AS stores_reported_count,
       |  (SELECT n FROM expected) AS expected_count,
       |  COUNT(DISTINCT store_id) = (SELECT n FROM expected) AS complete
       |FROM (${Tables.salesSql})
       |WHERE sale_date BETWEEN '$from' AND '$to'
       |GROUP BY sale_date
       |ORDER BY sale_date""".stripMargin
}

/** Shared fixed parameters for parameterized queries (dates chosen to be
  * populated at every scale factor: testdata spans 1995-01..2001-11). */
object Defaults {
  val targetDate = "1998-06-15"
  val rangeStart = "1998-06-01"
  val rangeEnd = "1998-06-30"
}
