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
  * sign(n·d)·(|n|·1000 div |d|)). Both Spark DIV and DuckDB // truncate
  * toward zero (verified: -7 // 2 = -3 in DuckDB), so the sign-explicit
  * form is clarity/defense, not behavioral necessity; either way both
  * engines compute bit-identical BIGINTs.
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

  /** a60: DIFFERENCE-IN-DIFFERENCES — the canonical quasi-experimental
    * promo-impact readout (Card & Krueger 1994 class): stores split
    * into a deterministic treatment/control arm (house multiplicative
    * hash parity of the store key — both engines draw the identical
    * assignment), the calendar split into the last [[DidWindowDays]]
    * days (post) and the [[DidWindowDays]] before them (pre). Emitted:
    * the four cell means of store-day net revenue (milli-cents,
    * integer DIV — sums are non-negative so truncate == floor), the
    * DiD estimate (Δtreated − Δcontrol), and the PARALLEL-TRENDS
    * diagnostic — each arm's exact-OLS slope over its pre-period
    * daily totals (the a59 integer-moment discipline, sign-explicit
    * division) and the slope gap, the number a practitioner checks
    * before believing the DiD.
    *
    * Scale shape: ONE pass over the dimension-sized store-day silver
    * ([[StoreDaily.rollupDec]]) does all four cells as conditional
    * sums (map-side partials, 1-row result); the trend leg aggregates
    * the pre window to ≤ 2·[[DidWindowDays]] group-day rows before
    * its 2-row moment agg; the calendar anchor is a broadcast 1-row
    * scalar. Nothing here scales with fact rows beyond the silver
    * build, which is priced once per session. */
  def didPromo(spark: SparkSession, dir: String): DataFrame = {
    val dec38 = "decimal(38,0)"
    val w = DidWindowDays
    val sd = StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"),
        ((col("gross_dec") - col("disc_dec")) * 100)
          .cast("decimal(18,0)").cast("long").as("y_c"))
    val maxd = sd.agg(max(col("sale_date")).as("maxd"))
    val base = sd.crossJoin(broadcast(maxd))
      .withColumn("gap",
        datediff(to_date(col("maxd")), to_date(col("sale_date")))
          .cast("long"))
      .filter(col("gap") < 2L * w)
      .withColumn("post", when(col("gap") < w, 1L).otherwise(0L))
      .withColumn("treated",
        when((col("store_id").cast("long") * 2654435761L) %
          1000000007L % 2 === 0L, 1L).otherwise(0L))
    // empty-arm guard: Spark's ANSI DIV throws on a zero denominator
    // where DuckDB's // yields NULL — a pathological assignment (every
    // store hashing to one arm) must degrade to NULL in BOTH engines
    def cellMean(t: Int, p: Int): String = {
      val cond = s"treated = $t AND post = $p"
      s"CASE WHEN count(CASE WHEN $cond THEN 1 END) = 0 THEN NULL ELSE " +
        s"CAST(sum(CASE WHEN $cond THEN y_c END) AS decimal(38,0)) * 1000 " +
        s"DIV count(CASE WHEN $cond THEN 1 END) END"
    }
    val cells = base.agg(
      expr(cellMean(1, 0)).cast("long").as("t_pre_milli"),
      expr(cellMean(1, 1)).cast("long").as("t_post_milli"),
      expr(cellMean(0, 0)).cast("long").as("c_pre_milli"),
      expr(cellMean(0, 1)).cast("long").as("c_post_milli"))
      .select(col("t_pre_milli"), col("t_post_milli"),
        col("c_pre_milli"), col("c_post_milli"),
        ((col("t_post_milli") - col("t_pre_milli")) -
          (col("c_post_milli") - col("c_pre_milli"))).as("did_milli"))
    val preDaily = base.filter(col("post") === 0L)
      .withColumn("t", lit(2L * w - 1) - col("gap"))
      .groupBy(col("treated"), col("t"))
      .agg(sum(col("y_c")).as("yd"))
    val slopeNum = "(n * sty - st * sy)"
    val slopeDen = "(n * stt - st * st)"
    val slopes = preDaily.groupBy(col("treated")).agg(
      count(lit(1)).cast(dec38).as("n"),
      sum(col("t")).cast(dec38).as("st"),
      sum(col("t") * col("t")).cast(dec38).as("stt"),
      sum(col("yd")).cast(dec38).as("sy"),
      sum(col("t").cast(dec38) * col("yd")).cast(dec38).as("sty"))
      .select(col("treated"),
        expr(milli(slopeNum, slopeDen, "div")).as("slope_milli"))
      .agg(max(when(col("treated") === 1L, col("slope_milli")))
        .as("t_slope_milli"),
        max(when(col("treated") === 0L, col("slope_milli")))
          .as("c_slope_milli"))
      .select(col("t_slope_milli"), col("c_slope_milli"),
        (col("t_slope_milli") - col("c_slope_milli"))
          .as("slope_gap_milli"))
    cells.crossJoin(slopes)
  }

  /** Pre/post window length for a60 — two equal 28-day arms off the
    * calendar tail (declared semantics, mirrored in the oracle). */
  private val DidWindowDays = 28L

  def didPromoSql(): String = {
    val w = DidWindowDays
    def cell(t: Int, p: Int): String =
      s"CAST(CASE WHEN COUNT(CASE WHEN treated = $t AND post = $p" +
        s" THEN 1 END) = 0 THEN NULL ELSE" +
        s" CAST(SUM(CASE WHEN treated = $t AND post = $p THEN y_c END)" +
        s" AS HUGEINT) * 1000 // COUNT(CASE WHEN treated = $t AND" +
        s" post = $p THEN 1 END) END AS BIGINT)"
    val slopeNum = "(n * sty - st * sy)"
    val slopeDen = "(n * stt - st * st)"
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |y AS (
       |  SELECT store_id, sale_date,
       |    CAST(CAST((gross_dec - disc_dec) * 100 AS DECIMAL(18,0))
       |      AS BIGINT) AS y_c
       |  FROM sd),
       |mx AS (SELECT MAX(sale_date) AS maxd FROM y),
       |base AS (
       |  SELECT store_id, y_c,
       |    CAST(date_diff('day', CAST(sale_date AS DATE),
       |      CAST(maxd AS DATE)) AS BIGINT) AS gap,
       |    CASE WHEN date_diff('day', CAST(sale_date AS DATE),
       |      CAST(maxd AS DATE)) < $w THEN 1 ELSE 0 END AS post,
       |    CASE WHEN (CAST(store_id AS BIGINT) * 2654435761)
       |      % 1000000007 % 2 = 0 THEN 1 ELSE 0 END AS treated
       |  FROM y CROSS JOIN mx
       |  WHERE date_diff('day', CAST(sale_date AS DATE),
       |    CAST(maxd AS DATE)) < ${2 * w}),
       |cells AS (
       |  SELECT ${cell(1, 0)} AS t_pre_milli, ${cell(1, 1)} AS t_post_milli,
       |    ${cell(0, 0)} AS c_pre_milli, ${cell(0, 1)} AS c_post_milli
       |  FROM base),
       |pre_daily AS (
       |  SELECT treated, ${2 * w - 1} - gap AS t,
       |    CAST(SUM(y_c) AS HUGEINT) AS yd
       |  FROM base WHERE post = 0 GROUP BY 1, 2),
       |moments AS (
       |  SELECT treated, CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(t) AS HUGEINT) AS st,
       |    CAST(SUM(t * t) AS HUGEINT) AS stt,
       |    CAST(SUM(yd) AS HUGEINT) AS sy,
       |    CAST(SUM(t * yd) AS HUGEINT) AS sty
       |  FROM pre_daily GROUP BY 1),
       |slopes AS (
       |  SELECT
       |    MAX(CASE WHEN treated = 1 THEN slope_milli END) AS t_slope_milli,
       |    MAX(CASE WHEN treated = 0 THEN slope_milli END) AS c_slope_milli
       |  FROM (SELECT treated,
       |    CAST(${milli(slopeNum, slopeDen, "//")} AS BIGINT) AS slope_milli
       |    FROM moments) q)
       |SELECT t_pre_milli, t_post_milli, c_pre_milli, c_post_milli,
       |  (t_post_milli - t_pre_milli) - (c_post_milli - c_pre_milli)
       |    AS did_milli,
       |  t_slope_milli, c_slope_milli,
       |  t_slope_milli - c_slope_milli AS slope_gap_milli
       |FROM cells CROSS JOIN slopes""".stripMargin
  }
}
