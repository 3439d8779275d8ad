package graft.analytics

import graft.etl.StoreDaily
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTIVARIATE least squares as a pure aggregation — the a30 OLS
  * family generalized from one regressor to a design matrix, solved
  * EXACTLY by Cramer's rule on integer moment sums (no iterative
  * optimizer, no float accumulation): per store, regress daily net
  * revenue on (t = days since the store's first sale, w = weekend
  * indicator), fitting level + drift + weekend lift in one pass.
  *
  * EXACTNESS — the entire solve is integer arithmetic: the nine
  * moments Σ1, Σt, Σw, Σt², Σtw, Σw², Σy, Σty, Σwy accumulate as
  * scale-0 decimals (order-independent, exact), the four 3×3
  * determinants are polynomials in those integers evaluated in
  * DECIMAL(38,0) (worst term Σy·Σt²·Σw² ≈ 1e22 at sf1.0 — 16 digits
  * of headroom), and the coefficients come out as milli-cents via a
  * SIGN-EXPLICIT integer division (truncation toward zero written as
  * sign(n·d)·(|n|·1000 div |d|)), because Spark's DIV truncates where
  * DuckDB's // floors — they'd disagree on every negative slope.
  * Both engines therefore compute bit-identical BIGINTs.
  *
  * SCALE SHAPE — one (store, day) rollup of the fact table (the
  * shared rollupDec silver), then ONE store-keyed hash aggregate to
  * moment grain (9 numbers per store, map-side combinable); the solve
  * itself is a scalar projection over |stores| rows. No windows, no
  * joins, no iteration: at 100 TB this is exactly two exchanges and
  * the moment rows are the only thing that moves. */
object Regression {

  /** Shared Cramer-determinant polynomials (operands are the pre-cast
    * moment columns, so the same text is valid in both engines). */
  private val detM =
    "(n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2)" +
      " + sx2 * (sx1 * sx12 - sx11 * sx2))"
  private val det0 =
    "(sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y)" +
      " + sx2 * (sx1y * sx12 - sx11 * sx2y))"
  private val det1 =
    "(n * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2)" +
      " + sx2 * (sx1 * sx2y - sx1y * sx2))"
  private val det2 =
    "(n * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2)" +
      " + sy * (sx1 * sx12 - sx11 * sx2))"

  /** Sign-explicit milli quotient shared by both engines (`div` is
    * Spark's integral divide; DuckDB spells it `//` — both see only
    * NON-NEGATIVE operands here, where truncate == floor). */
  private def milli(num: String, den: String, divOp: String): String =
    s"CASE WHEN $den = 0 THEN NULL ELSE " +
      s"(CASE WHEN ($num < 0) != ($den < 0) THEN -1 ELSE 1 END) * " +
      s"(abs($num) * 1000 $divOp abs($den)) END"

  /** a59: per-store 3-coefficient exact OLS (intercept, per-day drift,
    * weekend lift), all in milli-cents. */
  def storeMlr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec38 = "decimal(38,0)"
    val sd = StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"),
        ((col("gross_dec") - col("disc_dec")) * 100)
          .cast("decimal(18,0)").as("y_c"))
    val wMin = Window.partitionBy(col("store_id"))
    val base = sd
      .withColumn("t", datediff(to_date(col("sale_date")),
        to_date(min(col("sale_date")).over(wMin))).cast("long"))
      .withColumn("w",
        when(dayofweek(to_date(col("sale_date"))).isin(1, 7), 1L)
          .otherwise(0L))
    val m = base.groupBy(col("store_id")).agg(
      count(lit(1)).cast(dec38).as("n"),
      sum(col("t")).cast(dec38).as("sx1"),
      sum(col("w")).cast(dec38).as("sx2"),
      sum(col("t") * col("t")).cast(dec38).as("sx11"),
      sum(col("t") * col("w")).cast(dec38).as("sx12"),
      sum(col("w") * col("w")).cast(dec38).as("sx22"),
      sum(col("y_c")).cast(dec38).as("sy"),
      sum(col("t").cast(dec38) * col("y_c")).cast(dec38).as("sx1y"),
      sum(col("w").cast(dec38) * col("y_c")).cast(dec38).as("sx2y"))
    m.select(col("store_id"), col("n").cast("long").as("n_days"),
        expr(milli(det0, detM, "div")).as("b0_milli"),
        expr(milli(det1, detM, "div")).as("b1_milli"),
        expr(milli(det2, detM, "div")).as("b2_milli"))
      .orderBy(col("store_id"))
  }

  def storeMlrSql(): String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |base AS (
       |  SELECT store_id,
       |    CAST(date_diff('day',
       |      MIN(CAST(sale_date AS DATE)) OVER (PARTITION BY store_id),
       |      CAST(sale_date AS DATE)) AS BIGINT) AS t,
       |    CASE WHEN dayofweek(CAST(sale_date AS DATE)) IN (0, 6)
       |      THEN 1 ELSE 0 END AS w,
       |    CAST((gross_dec - disc_dec) * 100 AS DECIMAL(18,0)) AS y_c
       |  FROM sd),
       |m AS (
       |  SELECT store_id,
       |    CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(t) AS HUGEINT) AS sx1,
       |    CAST(SUM(w) AS HUGEINT) AS sx2,
       |    CAST(SUM(t * t) AS HUGEINT) AS sx11,
       |    CAST(SUM(t * w) AS HUGEINT) AS sx12,
       |    CAST(SUM(w * w) AS HUGEINT) AS sx22,
       |    CAST(SUM(y_c) AS HUGEINT) AS sy,
       |    CAST(SUM(t * y_c) AS HUGEINT) AS sx1y,
       |    CAST(SUM(w * y_c) AS HUGEINT) AS sx2y
       |  FROM base GROUP BY store_id)
       |SELECT store_id, CAST(n AS BIGINT) AS n_days,
       |  CAST(${milli(det0, detM, "//")} AS BIGINT) AS b0_milli,
       |  CAST(${milli(det1, detM, "//")} AS BIGINT) AS b1_milli,
       |  CAST(${milli(det2, detM, "//")} AS BIGINT) AS b2_milli
       |FROM m
       |ORDER BY store_id""".stripMargin
}
