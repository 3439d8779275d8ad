package graft.analytics

import graft.etl.StoreDaily
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series and forensic-audit readouts over the daily revenue
  * series — the a30/a42 family extended with the two classics every
  * BI stack ships: the autocorrelation function (is there weekly
  * structure worth a seasonal model?) and the Benford first-digit
  * audit (does the amount distribution look organic?). */
object Series {

  private val MaxLag = 14

  /** a50: AUTOCORRELATION FUNCTION of company daily net revenue at row
    * lags 1..14 — the readout that justifies (or kills) a42's weekly
    * seasonal index: a lag-7 spike is weekly structure, a flat ACF says
    * the seasonal model is noise. Pairing is POSITIONAL (row i with row
    * i−k of the date-ordered series), so calendar gaps never produce
    * null pairs and both engines agree by construction.
    *
    * Exactness: all five moments accumulate as scale-0 integer cents
    * (the a30 rule — decimal→double lands one ulp apart across
    * engines; exact-integer moments cast to double at the END, then
    * ONE identical IEEE expression per row, cannot). `acf` is the raw
    * IEEE quotient of those exact operands.
    *
    * Scale shape: the company series is DATE-grain (calendar-bounded —
    * the a29 argument), so the single-partition lag window is over
    * ~10^3 rows regardless of fact-table size; all 14 lags come out of
    * ONE window pass (14 lag columns, then a stack unpivot), and the
    * lag-grain moment agg has 14 output rows. The row-sized folds are
    * the two upstream rollups. */
  def acf(spark: SparkSession, dir: String): DataFrame = {
    val netCents = ((col("gross_dec") - col("disc_dec")) * 100)
      .cast(DecimalType(18, 0))
    val series = StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"))
      .agg(sum(netCents).cast(DecimalType(18, 0)).as("net_c"))
    val byDate = Window.orderBy(col("sale_date"))
    val lagged = (1 to MaxLag).foldLeft(series) { (df, k) =>
      df.withColumn(s"lag_$k", lag(col("net_c"), k).over(byDate))
    }
    val stackArgs = (1 to MaxLag)
      .map(k => s"${k}L, lag_$k").mkString(s"stack($MaxLag, ", ", ",
        ") AS (lag, x_c)")
    val pairs = lagged.selectExpr("net_c AS y_c", stackArgs)
      .where(col("x_c").isNotNull)
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x_c")).as("sx_c"),
      sum(col("y_c")).as("sy_c"),
      sum(col("x_c") * col("x_c")).as("sxx_c"),
      sum(col("y_c") * col("y_c")).as("syy_c"),
      sum(col("x_c") * col("y_c")).as("sxy_c"))
    val nD = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    m.select(col("lag"), col("n_pairs"),
        ((nD * d("sxy_c") - d("sx_c") * d("sy_c")) /
          sqrt((nD * d("sxx_c") - d("sx_c") * d("sx_c")) *
            (nD * d("syy_c") - d("sy_c") * d("sy_c")))).as("acf"))
      .orderBy(col("lag"))
  }

  def acfSql(): String = {
    val lagCols = (1 to MaxLag)
      .map(k => s"LAG(net_c, $k) OVER (ORDER BY sale_date) AS lag_$k")
      .mkString(",\n       |    ")
    val unpivot = (1 to MaxLag)
      .map(k => s"SELECT CAST($k AS BIGINT) AS lag, net_c AS y_c, " +
        s"lag_$k AS x_c FROM lagged WHERE lag_$k IS NOT NULL")
      .mkString("\n       |  UNION ALL ")
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |series AS (
       |  SELECT sale_date,
       |    CAST(SUM((gross_dec - disc_dec) * 100) AS BIGINT) AS net_c
       |  FROM sd GROUP BY sale_date),
       |lagged AS (
       |  SELECT sale_date, net_c,
       |    $lagCols
       |  FROM series),
       |pairs AS (
       |  $unpivot),
       |m AS (
       |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(SUM(x_c) AS DOUBLE) AS sx, CAST(SUM(y_c) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(x_c AS HUGEINT) * x_c) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(y_c AS HUGEINT) * y_c) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(x_c AS HUGEINT) * y_c) AS DOUBLE) AS sxy,
       |    CAST(COUNT(*) AS DOUBLE) AS nd
       |  FROM pairs GROUP BY lag)
       |SELECT lag, n_pairs,
       |  (nd * sxy - sx * sy)
       |    / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS acf
       |FROM m ORDER BY lag""".stripMargin
  }

  /** a52: CHANGEPOINT DETECTION (binary segmentation, first split) on
    * company daily net revenue — "did the level shift, and when?": the
    * split t that maximizes the variance explained by a two-mean model,
    * gain(t) = S_l²/t + S_r²/(n−t) − S²/n (the SSE reduction in sum
    * form — no per-candidate rescan, every candidate reads one prefix
    * sum). Ties break to the EARLIEST split in both engines. One row:
    * split index/date, segment means (exact integer cents), the raw
    * gain and the variance-explained per-mille.
    *
    * Exactness: prefix sums and the squared-total moments accumulate
    * as exact integer cents (the a30/a50 rule); gain is ONE identical
    * IEEE expression from those exact operands, so argmax and the
    * emitted doubles agree across engines bit-for-bit; means and the
    * per-mille are integer DIV.
    *
    * Scale shape: the candidate relation IS the date-grain series
    * (calendar-bounded — the a29 argument), one single-partition
    * window pass builds rank + prefix + totals, gain is a pure map,
    * and the argmax is a 1-row sort-limit. The row-sized folds are
    * the two upstream rollups. */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val netCents = ((col("gross_dec") - col("disc_dec")) * 100)
      .cast(DecimalType(18, 0))
    val series = StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"))
      .agg(sum(netCents).cast(DecimalType(18, 0)).as("net_c"))
    val byDate = Window.orderBy(col("sale_date"))
    val all = Window.partitionBy()
    val cand = series
      .withColumn("t", row_number().over(byDate).cast("long"))
      .withColumn("cum_c", sum(col("net_c")).over(byDate))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("s_c", sum(col("net_c")).over(all))
      .withColumn("syy_c", sum(col("net_c") * col("net_c")).over(all))
      .where(col("t") < col("n"))
    val tD = col("t").cast("double")
    val nD = col("n").cast("double")
    val slD = col("cum_c").cast("double")
    val sD = col("s_c").cast("double")
    val srD = sD - slD
    val gain = slD * slD / tD + srD * srD / (nD - tD) - sD * sD / nD
    val sseTotal = col("syy_c").cast("double") - sD * sD / nD
    cand.select(col("sale_date").as("split_date"), col("t").as("split_idx"),
        col("n").as("n_days"), gain.as("gain"),
        floor(gain * 1000d / sseTotal).cast("long").as("var_explained_milli"),
        expr("CAST(cum_c AS BIGINT) DIV t").as("mean_left_cents"),
        expr("CAST(s_c - cum_c AS BIGINT) DIV (n - t)").as("mean_right_cents"))
      .orderBy(col("gain").desc, col("split_idx"))
      .limit(1)
  }

  def changepointSql(): String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |series AS (
       |  SELECT sale_date,
       |    CAST(SUM((gross_dec - disc_dec) * 100) AS BIGINT) AS net_c
       |  FROM sd GROUP BY sale_date),
       |cand AS (
       |  SELECT sale_date,
       |    CAST(ROW_NUMBER() OVER (ORDER BY sale_date) AS BIGINT) AS t,
       |    CAST(SUM(net_c) OVER (ORDER BY sale_date
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_c,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
       |    CAST(SUM(net_c) OVER () AS BIGINT) AS s_c,
       |    CAST(SUM(CAST(net_c AS HUGEINT) * net_c) OVER () AS DOUBLE) AS syy
       |  FROM series),
       |scored AS (
       |  SELECT sale_date AS split_date, t AS split_idx, n AS n_days,
       |    CAST(cum_c AS DOUBLE) * cum_c / t
       |      + (CAST(s_c AS DOUBLE) - cum_c) * (CAST(s_c AS DOUBLE) - cum_c)
       |        / (n - t)
       |      - CAST(s_c AS DOUBLE) * s_c / n AS gain,
       |    syy - CAST(s_c AS DOUBLE) * s_c / n AS sse_total,
       |    cum_c // t AS mean_left_cents,
       |    (s_c - cum_c) // (n - t) AS mean_right_cents
       |  FROM cand WHERE t < n)
       |SELECT split_date, split_idx, n_days, gain,
       |  CAST(floor(gain * 1000 / sse_total) AS BIGINT) AS var_explained_milli,
       |  mean_left_cents, mean_right_cents
       |FROM scored
       |ORDER BY gain DESC, split_idx LIMIT 1""".stripMargin

  /** Benford expected first-digit shares, per-mille (floor of
    * 1000·log10(1 + 1/d)) — fixed literals so both engines agree and
    * the rubric is stable across runs. */
  private val BenfordMilli: Map[Int, Long] = Map(
    1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
    6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)

  /** a51: BENFORD FIRST-DIGIT AUDIT of order totals — the forensic
    * screen every finance/audit pipeline runs: organic multiplicative
    * amounts follow log-uniform first digits; fabricated or clamped
    * data doesn't. One row per digit 1..9: observed count, observed
    * per-mille, the Benford expectation (fixed per-mille literals)
    * and the signed deviation. TPC-H-style uniform pricing is NOT
    * Benford — large deviations here are the readout working, and the
    * spec asserts the exact counts, not conformance.
    *
    * Exactness: digit = first char of the integer cents rendered as a
    * string (cents via the house DECIMAL(18,2) money cast — never
    * double*100 truncation); counts and per-milles are pure integers.
    *
    * Scale shape: a narrow map to the digit, one 9-group hash agg,
    * and a broadcast 1-row total for the share — nothing else moves. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast(Tables.Money) * 100)
      .cast("long")
    val digits = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 0d)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      // total via a global window over the 9-row digit relation — a
      // second .agg would re-run the whole scan+fold for one number
      .withColumn("n_total", sum(col("n_obs")).over(Window.partitionBy()))
    val expected = BenfordMilli.toSeq
      .map { case (d, m) => s"$d, ${m}L" }
      .mkString("stack(9, ", ", ", ") AS (digit, expected_milli)")
    digits
      .join(broadcast(spark.range(1).selectExpr(expected)), Seq("digit"))
      .select(col("digit").cast("long").as("digit"), col("n_obs"),
        expr("n_obs * 1000 DIV n_total").as("obs_milli"),
        col("expected_milli"),
        (expr("n_obs * 1000 DIV n_total") - col("expected_milli"))
          .as("deviation_milli"))
      .orderBy(col("digit"))
  }

  def benfordAuditSql(): String = {
    val expected = BenfordMilli.toSeq.sorted
      .map { case (d, m) => s"($d, $m)" }.mkString(", ")
    s"""WITH digits AS (
       |  SELECT CAST(substring(CAST(CAST(
       |      CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM orders WHERE o_totalprice > 0),
       |obs AS (
       |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
       |  FROM digits GROUP BY digit),
       |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
       |exp_m AS (SELECT * FROM (VALUES $expected) AS t(digit, expected_milli))
       |SELECT CAST(o.digit AS BIGINT) AS digit, o.n_obs,
       |  o.n_obs * 1000 // t.n_total AS obs_milli,
       |  CAST(e.expected_milli AS BIGINT) AS expected_milli,
       |  o.n_obs * 1000 // t.n_total - e.expected_milli AS deviation_milli
       |FROM obs o CROSS JOIN tot t JOIN exp_m e ON e.digit = o.digit
       |ORDER BY digit""".stripMargin
  }

  /** How many trailing sale dates per store the Theil–Sen window reads.
    * The bound is the whole scale argument: pair count per store is
    * WindowDays·(WindowDays−1)/2 = 1,770 — CONSTANT in corpus size. */
  private val TheilSenDays = 60

  /** a54: THEIL–SEN ROBUST TREND per store — the median-of-pairwise-
    * slopes estimator (Theil 1950, Sen 1968): the robust answer to
    * a30's OLS slope, immune to the outlier days that drag a
    * least-squares fit (up to ~29% contamination). Computed over the
    * TRAILING 60 sale dates per store so the pairwise stage is
    * calendar-bounded, not data-bounded.
    *
    * Exactness: a slope is the rational (dy_cents / dx_days); the
    * MEDIAN is selected — never averaged — as the LOWER median (rank
    * (n+1) DIV 2), so the emitted numerator/denominator are exact
    * integers. The rank order is the IEEE double quotient of exact
    * integer operands (identically rounded in both engines; one
    * division, the a50 rule) with a full deterministic tie-break
    * (dy, dx, both endpoint dates).
    *
    * Scale shape: the silver rollup is the only fact-sized fold; the
    * trailing-window rank and the pair self-join are both keyed on
    * store_id — ONE hash exchange reused by the window, the join, and
    * the median window (Spark keeps the co-partitioning); pairs are
    * ≤1,770 rows per store by the window bound, so the join output is
    * dimension-sized (|stores|·1,770) at ANY fact scale. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val byStoreRecent = Window.partitionBy(col("store_id"))
      .orderBy(col("sale_date").desc)
    val pts = StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"),
        ((col("gross_dec") - col("disc_dec")) * 100)
          .cast(DecimalType(18, 0)).cast("long").as("net_c"))
      .withColumn("rn", row_number().over(byStoreRecent))
      .where(col("rn") <= TheilSenDays)
      .select(col("store_id"),
        datediff(to_date(col("sale_date")), lit("1992-01-01").cast("date"))
          .cast("long").as("x"),
        col("net_c").as("y"))
    // PAIR EXPANSION stays partition-local (guide §2.4): the ≤60 points
    // collect into one x-sorted array per store (x is distinct per
    // store, so struct sort = x sort) and every i<j pair is generated
    // map-side by nested array transforms — the {x1 < x2} pair SET is
    // identical to the old self-join's, the downstream rank windows are
    // order-insensitive, and the groupBy + both windows + the explode
    // all ride the ONE store_id exchange the trailing window already
    // paid. The previous shape paid either a doubled window subtree
    // (un-materialized self-join legs) or, checkpointed, a sort-merge
    // self-join with two re-exchanges (LogicalRDD hides size stats, so
    // the planner dropped the broadcast).
    val pairs = pts
      .groupBy(col("store_id"))
      .agg(array_sort(collect_list(struct(col("x"), col("y")))).as("ps"))
      .select(col("store_id"), explode(expr(
        "flatten(transform(ps, (p, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), q -> " +
          "struct(q.y - p.y AS dy, q.x - p.x AS dx, " +
          "p.x AS x1, q.x AS x2))))")).as("pr"))
      .select(col("store_id"), col("pr.dy").as("dy"),
        col("pr.dx").as("dx"), col("pr.x1").as("x1"), col("pr.x2").as("x2"))
    val byStoreSlope = Window.partitionBy(col("store_id"))
      .orderBy((col("dy").cast("double") / col("dx").cast("double")).asc,
        col("dy").asc, col("dx").asc, col("x1").asc, col("x2").asc)
    val byStore = Window.partitionBy(col("store_id"))
    pairs
      .withColumn("rnk", row_number().over(byStoreSlope))
      .withColumn("n_pairs", count(lit(1)).over(byStore))
      .where(col("rnk") === expr("(n_pairs + 1) DIV 2"))
      .select(col("store_id"), col("n_pairs"),
        col("dy").as("med_dy_cents"), col("dx").as("med_dx_days"),
        (col("dy").cast("double") / col("dx").cast("double"))
          .as("slope_cents_per_day"))
      .orderBy(col("store_id"))
  }

  def theilSenSql(): String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |pts AS (
       |  SELECT store_id,
       |    CAST(date_diff('day', DATE '1992-01-01',
       |      CAST(sale_date AS DATE)) AS BIGINT) AS x,
       |    CAST((gross_dec - disc_dec) * 100 AS BIGINT) AS y
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY store_id
       |      ORDER BY sale_date DESC) AS rn
       |    FROM sd)
       |  WHERE rn <= $TheilSenDays),
       |pairs AS (
       |  SELECT a.store_id, b.y - a.y AS dy, b.x - a.x AS dx, a.x AS x1,
       |    b.x AS x2
       |  FROM pts a JOIN pts b
       |    ON a.store_id = b.store_id AND a.x < b.x),
       |ranked AS (
       |  SELECT store_id, dy, dx,
       |    ROW_NUMBER() OVER (PARTITION BY store_id
       |      ORDER BY CAST(dy AS DOUBLE) / dx ASC, dy ASC, dx ASC,
       |        x1 ASC, x2 ASC) AS rnk,
       |    CAST(COUNT(*) OVER (PARTITION BY store_id) AS BIGINT) AS n_pairs
       |  FROM pairs)
       |SELECT store_id, n_pairs, dy AS med_dy_cents, dx AS med_dx_days,
       |  CAST(dy AS DOUBLE) / dx AS slope_cents_per_day
       |FROM ranked
       |WHERE rnk = (n_pairs + 1) // 2
       |ORDER BY store_id""".stripMargin

  /** a65: FORECAST + BACKTEST — the extrapolation step a55's
    * decomposition and a52's changepoint feed: hold out the LAST
    * [[ForecastH]] days of company daily net revenue, fit on the rest,
    * and emit the per-day backtest of two reference forecasters:
    *
    *   fc_snaive_c  seasonal-naive-with-drift: the same-weekday value
    *                one season back (lag 7 — inside the train window
    *                for every holdout day because H = season length)
    *                plus h·drift, drift = (last_train − first_train)
    *                DIV (n_train − 1) cents/day
    *   fc_naive_c   last train value carried flat (the no-skill
    *                baseline every forecast must beat)
    *
    * The relation is the backtest itself — actuals next to both
    * forecasts and their absolute errors, the honest eval a forecast
    * ships with (M-competition discipline: always against naive).
    * Exactness: integer cents end to end; drift uses truncating DIV
    * (both engines truncate toward zero — the t32 verification).
    *
    * Scale shape: the series is DATE-grain (calendar-bounded, the a29
    * argument): the rank/lag windows run over ~10³ rows regardless of
    * fact scale; the corpus-sized work is the one upstream rollup the
    * memoized silver already paid. */
  val ForecastH = 7

  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val netCents = ((col("gross_dec") - col("disc_dec")) * 100)
      .cast(DecimalType(18, 0))
    val series = StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"))
      .agg(sum(netCents).cast(DecimalType(18, 0)).cast("long").as("net_c"))
    val byDate = Window.orderBy(col("sale_date"))
    val all = Window.partitionBy()
    series
      .withColumn("rn", row_number().over(byDate).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("lag7", lag(col("net_c"), ForecastH).over(byDate))
      .withColumn("y_first",
        max(when(col("rn") === 1, col("net_c"))).over(all))
      .withColumn("y_last_train",
        max(when(col("rn") === col("n") - ForecastH, col("net_c"))).over(all))
      .withColumn("drift_c",
        expr(s"(y_last_train - y_first) DIV (n - ${ForecastH + 1})"))
      .filter(col("rn") > col("n") - ForecastH)
      .withColumn("h", col("rn") - (col("n") - ForecastH))
      .select(col("sale_date"), col("h"),
        col("net_c").as("actual_c"),
        (col("lag7") + col("h") * col("drift_c")).as("fc_snaive_c"),
        col("y_last_train").as("fc_naive_c"))
      .withColumn("err_snaive_c", abs(col("actual_c") - col("fc_snaive_c")))
      .withColumn("err_naive_c", abs(col("actual_c") - col("fc_naive_c")))
      .orderBy(col("sale_date"))
  }

  def forecastBacktestSql(): String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |series AS (
       |  SELECT sale_date,
       |    CAST(SUM((gross_dec - disc_dec) * 100) AS BIGINT) AS net_c
       |  FROM sd GROUP BY sale_date),
       |ranked AS (
       |  SELECT sale_date, net_c,
       |    CAST(ROW_NUMBER() OVER (ORDER BY sale_date) AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
       |    lag(net_c, $ForecastH) OVER (ORDER BY sale_date) AS lag7
       |  FROM series),
       |fitted AS (
       |  SELECT *,
       |    MAX(CASE WHEN rn = 1 THEN net_c END) OVER () AS y_first,
       |    MAX(CASE WHEN rn = n - $ForecastH THEN net_c END) OVER ()
       |      AS y_last_train
       |  FROM ranked),
       |fc AS (
       |  SELECT sale_date, rn - (n - $ForecastH) AS h, net_c AS actual_c,
       |    lag7 + (rn - (n - $ForecastH))
       |      * ((y_last_train - y_first) // (n - ${ForecastH + 1}))
       |      AS fc_snaive_c,
       |    y_last_train AS fc_naive_c
       |  FROM fitted WHERE rn > n - $ForecastH)
       |SELECT sale_date, h, actual_c, fc_snaive_c, fc_naive_c,
       |  abs(actual_c - fc_snaive_c) AS err_snaive_c,
       |  abs(actual_c - fc_naive_c) AS err_naive_c
       |FROM fc ORDER BY sale_date""".stripMargin

  /** a55: CLASSICAL SEASONAL DECOMPOSITION (the moving-average
    * decomposition under STL's additive model: series = trend +
    * seasonal + remainder) of company daily net revenue — the readout
    * that turns a42's seasonal index and a50's lag-7 ACF spike into
    * per-day components an analyst actually plots:
    *
    *   trend_c     centered 7-day moving average, defined only where
    *               the full window exists (rank 4 .. n−3 — no
    *               half-window edge bias)
    *   seasonal_c  per day-of-week mean of the detrended series
    *               (integer cents, truncating DIV — both engines
    *               truncate, the t32 verification)
    *   remainder_c net − trend − seasonal where trend is defined
    *
    * Exactness: the 7-day sum is exact integer cents, DIV 7 once; the
    * DOW means are integer sums over the detrended values divided
    * once; no doubles anywhere. DOW is Spark `dayofweek` (1=Sunday);
    * the oracle maps DuckDB's 0-based value with +1 (the x2 rule).
    *
    * Scale shape: the series is DATE-grain (calendar-bounded, the a29
    * argument) — the rank/MA windows and the 7-group DOW means all run
    * over ~10³ rows regardless of fact scale; the row-sized folds are
    * the two upstream rollups. */
  /** The unordered decomposition relation, leaf-memoized: a55 reads it
    * ordered, a56 runs its MAD screen over the same rows. */
  private def decomposed(spark: SparkSession, dir: String): DataFrame =
    graft.model.Silver.memoize(spark, "seasonalDecomp", dir) {
      val netCents = ((col("gross_dec") - col("disc_dec")) * 100)
        .cast(DecimalType(18, 0))
      val series = StoreDaily.rollupDec(spark, dir)
        .groupBy(col("sale_date"))
        .agg(sum(netCents).cast(DecimalType(18, 0)).cast("long").as("net_c"))
      val byDate = Window.orderBy(col("sale_date"))
      val ma7 = byDate.rowsBetween(-3, 3)
      val withTrend = series
        .withColumn("rn", row_number().over(byDate).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("sum7", sum(col("net_c")).over(ma7).cast("long"))
        .withColumn("trend_c",
          when(col("rn") > 3 && col("rn") <= col("n") - 3,
            expr("sum7 DIV 7")))
        .withColumn("dow",
          dayofweek(to_date(col("sale_date"))).cast("long"))
        .withColumn("detr_c", col("net_c") - col("trend_c"))
      val byDow = Window.partitionBy(col("dow"))
      withTrend
        .withColumn("seas_sum", sum(col("detr_c")).over(byDow).cast("long"))
        .withColumn("seas_n", count(col("detr_c")).over(byDow))
        .withColumn("seasonal_c",
          when(col("seas_n") > 0, expr("seas_sum DIV seas_n")))
        .select(col("sale_date"), col("net_c"), col("dow"), col("trend_c"),
          col("seasonal_c"),
          (col("detr_c") - col("seasonal_c")).as("remainder_c"))
    }

  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame =
    decomposed(spark, dir).orderBy(col("sale_date"))

  def seasonalDecomposeSql(): String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |series AS (
       |  SELECT sale_date,
       |    CAST(SUM((gross_dec - disc_dec) * 100) AS BIGINT) AS net_c
       |  FROM sd GROUP BY sale_date),
       |with_trend AS (
       |  SELECT sale_date, net_c,
       |    CAST(dayofweek(CAST(sale_date AS DATE)) + 1 AS BIGINT) AS dow,
       |    CASE WHEN ROW_NUMBER() OVER (ORDER BY sale_date) > 3
       |        AND ROW_NUMBER() OVER (ORDER BY sale_date)
       |          <= COUNT(*) OVER () - 3
       |      THEN CAST(SUM(net_c) OVER (ORDER BY sale_date
       |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) // 7
       |      END AS trend_c
       |  FROM series),
       |detr AS (
       |  SELECT *, net_c - trend_c AS detr_c FROM with_trend),
       |seas AS (
       |  SELECT *,
       |    CASE WHEN COUNT(detr_c) OVER (PARTITION BY dow) > 0
       |      THEN CAST(SUM(detr_c) OVER (PARTITION BY dow) AS BIGINT)
       |        // CAST(COUNT(detr_c) OVER (PARTITION BY dow) AS BIGINT)
       |      END AS seasonal_c
       |  FROM detr)
       |SELECT sale_date, net_c, dow, trend_c, seasonal_c,
       |  detr_c - seasonal_c AS remainder_c
       |FROM seas
       |ORDER BY sale_date""".stripMargin

  /** a56: MAD ANOMALY SCREEN ON THE DECOMPOSITION REMAINDER — the
    * robust-residual alert that closes the a55 loop (the S-H-ESD /
    * "seasonal hybrid" pattern: deseasonalize+detrend FIRST, then a
    * median/MAD outlier rule on what's left — e16 runs the same rule
    * on raw values, where weekly structure masquerades as anomaly):
    * flag days whose |remainder − median| exceeds 3× the median
    * absolute deviation. Both medians are the POSITIONAL lower median
    * (a34's rank-lookup — no interpolation, engine-exact); the MAD is
    * floored at 1 so a degenerate zero-spread series cannot divide by
    * zero. Output: the flagged days with their deviation and a
    * milli score, plus the med/MAD the rule used.
    *
    * Scale shape: everything runs over the a55 leaf (calendar-bounded
    * date grain); the two medians are single-partition rank windows
    * over ~10³ rows; the readout is a filter. */
  def remainderAnomalies(spark: SparkSession, dir: String,
                         kMad: Long = 3L): DataFrame = {
    val rem = decomposed(spark, dir)
      .filter(col("remainder_c").isNotNull)
    val byRem = Window.orderBy(col("remainder_c"), col("sale_date"))
    val all = Window.partitionBy()
    val med = rem
      .withColumn("rn", row_number().over(byRem).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("remainder_c").as("med_c"))
    val withDev = rem.crossJoin(broadcast(med))
      .withColumn("dev_c", abs(col("remainder_c") - col("med_c")))
    val byDev = Window.orderBy(col("dev_c"), col("sale_date"))
    val mad = withDev
      .withColumn("rn", row_number().over(byDev).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(greatest(col("dev_c"), lit(1L)).as("mad_c"))
    withDev.crossJoin(broadcast(mad))
      .filter(col("dev_c") > lit(kMad) * col("mad_c"))
      .select(col("sale_date"), col("net_c"), col("remainder_c"),
        col("med_c"), col("mad_c"), col("dev_c"),
        expr("dev_c * 1000 DIV mad_c").as("score_milli"))
      .orderBy(col("sale_date"))
  }

  def remainderAnomaliesSql(kMad: Long = 3L): String =
    s"""WITH decomp AS (${seasonalDecomposeSql()}),
       |rem AS (SELECT * FROM decomp WHERE remainder_c IS NOT NULL),
       |med AS (
       |  SELECT remainder_c AS med_c FROM (
       |    SELECT remainder_c,
       |      ROW_NUMBER() OVER (ORDER BY remainder_c, sale_date) AS rn,
       |      COUNT(*) OVER () AS n
       |    FROM rem)
       |  WHERE rn = (n + 1) // 2),
       |with_dev AS (
       |  SELECT r.*, m.med_c, abs(r.remainder_c - m.med_c) AS dev_c
       |  FROM rem r CROSS JOIN med m),
       |mad AS (
       |  SELECT GREATEST(dev_c, 1) AS mad_c FROM (
       |    SELECT dev_c,
       |      ROW_NUMBER() OVER (ORDER BY dev_c, sale_date) AS rn,
       |      COUNT(*) OVER () AS n
       |    FROM with_dev)
       |  WHERE rn = (n + 1) // 2)
       |SELECT sale_date, net_c, remainder_c, med_c, mad_c, dev_c,
       |  dev_c * 1000 // mad_c AS score_milli
       |FROM with_dev CROSS JOIN mad
       |WHERE dev_c > $kMad * mad_c
       |ORDER BY sale_date""".stripMargin

  /** a57: PRICE INDICES (Laspeyres / Paasche, matched-model) — the
    * retail-economics readout that separates "revenue grew" into price
    * vs volume: per month t against the first month as base,
    *
    *   Laspeyres = Σ p_t·q_0 / Σ p_0·q_0   (base-period basket)
    *   Paasche   = Σ p_t·q_t / Σ p_0·q_t   (current-period basket)
    *
    * over the SKUs traded in BOTH months (the matched-model rule —
    * entering/exiting SKUs are a composition effect, not a price
    * move). Unit price = monthly cents·1000 DIV monthly qty (exact
    * integer milli-cents; the floor is applied identically in both
    * engines, and identically in numerator and denominator).
    *
    * Exactness/overflow: p ≤ ~10⁷ milli-cents (price-like, scale-
    * free), q is the monthly sku quantity; p·q summed over the
    * catalog stays far inside BIGINT at any tested SF — at true 100 TB
    * the two Σ's move to DECIMAL(38) sums, a type change, not a shape
    * change.
    *
    * Scale shape: one (sku, month) rollup of the fact table (hash,
    * map-side combinable, dimension-sized output); the base month is
    * a 1-row broadcast; the matched join is sku-keyed over the
    * dimension-sized monthly relation; the index is a per-month
    * aggregate. */
  /** The (sku, month) rollup a57 and a61 share — cents, quantity, and
    * the exact milli-cent unit price; leaf-memoized so the fact scan
    * is priced once per session. */
  private def monthlySku(spark: SparkSession, dir: String): DataFrame =
    graft.model.Silver.memoize(spark, "monthlySku", dir) {
      Tables.sales(spark, dir)
        .groupBy(col("sku"), substring(col("sale_date"), 1, 7).as("month"))
        .agg((sum(col("line_total")) * 100).cast(DecimalType(18, 0))
          .cast("long").as("cents"),
          sum(col("quantity")).cast("long").as("qty"))
        .withColumn("p_milli", expr("cents * 1000 DIV qty"))
    }

  def priceIndex(spark: SparkSession, dir: String): DataFrame = {
    val monthly = monthlySku(spark, dir)
    val base = monthly
      .crossJoin(broadcast(monthly.agg(min(col("month")).as("base_month"))))
      .filter(col("month") === col("base_month"))
      .select(col("sku"), col("base_month"),
        col("p_milli").as("p0"), col("qty").as("q0"))
    monthly.join(base, Seq("sku"))
      .groupBy(col("month"), col("base_month"))
      .agg(count(lit(1)).as("n_matched_skus"),
        sum(col("p_milli") * col("q0")).cast("long").as("pt_q0"),
        sum(col("p0") * col("q0")).cast("long").as("p0_q0"),
        sum(col("p_milli") * col("qty")).cast("long").as("pt_qt"),
        sum(col("p0") * col("qty")).cast("long").as("p0_qt"))
      .select(col("month"), col("base_month"), col("n_matched_skus"),
        expr("pt_q0 * 1000 DIV p0_q0").as("laspeyres_milli"),
        expr("pt_qt * 1000 DIV p0_qt").as("paasche_milli"))
      .orderBy(col("month"))
  }

  def priceIndexSql(): String =
    s"""WITH sales AS (${graft.model.Tables.salesSql}),
       |monthly AS (
       |  SELECT sku, substring(sale_date, 1, 7) AS month,
       |    CAST(SUM(line_total) * 100 AS BIGINT) AS cents,
       |    CAST(SUM(quantity) AS BIGINT) AS qty
       |  FROM sales GROUP BY 1, 2),
       |priced AS (
       |  SELECT *, cents * 1000 // qty AS p_milli FROM monthly),
       |base AS (
       |  SELECT sku, month AS base_month, p_milli AS p0, qty AS q0
       |  FROM priced
       |  WHERE month = (SELECT MIN(month) FROM priced))
       |SELECT t.month, b.base_month,
       |  CAST(COUNT(*) AS BIGINT) AS n_matched_skus,
       |  CAST(SUM(t.p_milli * b.q0) AS BIGINT) * 1000
       |    // CAST(SUM(b.p0 * b.q0) AS BIGINT) AS laspeyres_milli,
       |  CAST(SUM(t.p_milli * t.qty) AS BIGINT) * 1000
       |    // CAST(SUM(b.p0 * t.qty) AS BIGINT) AS paasche_milli
       |FROM priced t JOIN base b ON t.sku = b.sku
       |GROUP BY t.month, b.base_month
       |ORDER BY t.month""".stripMargin

  /** a62: WEIGHTED QUANTILES — the quantity-weighted median and p90 of
    * the UNIT price per brand (a34's exact positional quantiles weight
    * every row equally; pricing and survey analytics weight by volume,
    * where a 1000-unit line should pull the median 1000× harder than a
    * 1-unit line). Classic cumulative-weight construction: lines order
    * by (unit price, full tie-break), weights cumulate, and the LOWER
    * weighted quantile is the first value whose running weight reaches
    * the quantile share — positional selection over exact integers,
    * never interpolation. Unit price in exact milli-cents (the a57
    * floor rule).
    *
    * Scale shape: ONE brand-keyed exchange carries the cumulative
    * window AND the final per-brand aggregate (same-partitioning
    * reuse); the readout is |brands| rows. The selection predicates
    * (2·cum ≥ W, 10·cum ≥ 9·W) are pure integer comparisons. */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.sales(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey").as("sku"), col("p_brand").as("brand"))),
        Seq("sku"))
      .select(col("brand"),
        expr("CAST(CAST(line_total * 100 AS DECIMAL(18,0)) AS BIGINT)" +
          " * 1000 DIV quantity").as("u_milli"),
        col("quantity").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val byBrand = Window.partitionBy(col("brand"))
    val ordered = byBrand.orderBy(col("u_milli"), col("l_orderkey"),
      col("l_linenumber"))
    lines
      .withColumn("cum", sum(col("w")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("w")).over(byBrand))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_lines"), max(col("tot")).as("total_qty"),
        min(when(col("cum") * 2 >= col("tot"), col("u_milli")))
          .as("wmedian_u_milli"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("u_milli")))
          .as("wp90_u_milli"))
      .orderBy(col("brand"))
  }

  def weightedQuantilesSql(): String =
    s"""WITH sales AS (${graft.model.Tables.salesSql}),
       |lines AS (
       |  SELECT p.p_brand AS brand,
       |    CAST(CAST(s.line_total * 100 AS DECIMAL(18,0)) AS BIGINT)
       |      * 1000 // s.quantity AS u_milli,
       |    s.quantity AS w, s.l_orderkey, s.l_linenumber
       |  FROM sales s JOIN part p ON s.sku = p.p_partkey),
       |cums AS (
       |  SELECT brand, u_milli, w,
       |    CAST(SUM(w) OVER (PARTITION BY brand ORDER BY u_milli,
       |      l_orderkey, l_linenumber
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS HUGEINT) AS cum,
       |    CAST(SUM(w) OVER (PARTITION BY brand) AS HUGEINT) AS tot
       |  FROM lines)
       |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(MAX(tot) AS BIGINT) AS total_qty,
       |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN u_milli END) AS BIGINT)
       |    AS wmedian_u_milli,
       |  CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN u_milli END) AS BIGINT)
       |    AS wp90_u_milli
       |FROM cums
       |GROUP BY brand
       |ORDER BY brand""".stripMargin

  /** a61: REVENUE BRIDGE (price / volume / mix waterfall) — the FP&A
    * decomposition of month-over-month revenue change, the additive
    * sibling of a57's ratio indices: between the two newest calendar
    * months (k22's string-order anchors — no interval arithmetic),
    *
    *   price effect  = Σ_matched (p1 − p0)·q1
    *   volume effect = Σ_matched (q1 − q0)·p0
    *   new effect    = Σ_{B only} revenue
    *   disc. effect  = −Σ_{A only} revenue
    *
    * with unit prices in exact integer milli-cents (a57's floor rule)
    * and the RECONCILIATION RESIDUAL reported explicitly: flooring the
    * unit prices makes the four effects not sum exactly to ΔR, and a
    * real bridge CARRIES that rounding line instead of hiding it —
    * the spec asserts delta = effects + residual as an identity and
    * bounds the residual by 1 milli-cent per matched-sku quantity
    * unit (the floor's worst case).
    *
    * Scale shape: rides the memoized [[monthlySku]] leaf (shared with
    * a57 — the fact scan is priced once); the month filter cuts it to
    * two dimension-sized slices, the bridge is ONE sku-keyed
    * full-outer join + a 1-row conditional aggregate. Overflow note
    * as a57: p·q sums move to DECIMAL(38) at true 100 TB — a type
    * change, not a shape change. */
  def revenueBridge(spark: SparkSession, dir: String): DataFrame = {
    val m = monthlySku(spark, dir)
    val months = m.select(col("month")).distinct()
    val mbDf = months.agg(max(col("month")).as("mb"))
    val maDf = months.crossJoin(broadcast(mbDf))
      .filter(col("month") < col("mb")).agg(max(col("month")).as("ma"))
    val mm = mbDf.crossJoin(maDf)
    val two = m.crossJoin(broadcast(mm))
      .filter(col("month") === col("ma") || col("month") === col("mb"))
    val a = two.filter(col("month") === col("ma"))
      .select(col("sku"), col("ma"), col("cents").as("c0"),
        col("qty").as("q0"), col("p_milli").as("p0"))
    val b = two.filter(col("month") === col("mb"))
      .select(col("sku"), col("mb"), col("cents").as("c1"),
        col("qty").as("q1"), col("p_milli").as("p1"))
    val j = a.join(b, Seq("sku"), "full_outer")
    val matched = col("c0").isNotNull && col("c1").isNotNull
    j.agg(
      max(col("ma")).as("month_a"), max(col("mb")).as("month_b"),
      coalesce(sum(col("c0")), lit(0L)).as("rev_a_c"),
      coalesce(sum(col("c1")), lit(0L)).as("rev_b_c"),
      sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
      sum(when(col("c0").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_gone"),
      coalesce(sum(when(matched, (col("p1") - col("p0")) * col("q1"))),
        lit(0L)).as("price_effect_milli"),
      coalesce(sum(when(matched, (col("q1") - col("q0")) * col("p0"))),
        lit(0L)).as("volume_effect_milli"),
      coalesce(sum(when(col("c0").isNull, col("c1") * 1000)), lit(0L))
        .as("new_effect_milli"),
      (-coalesce(sum(when(col("c1").isNull, col("c0") * 1000)), lit(0L)))
        .as("discontinued_effect_milli"))
      .select(col("month_a"), col("month_b"), col("rev_a_c"), col("rev_b_c"),
        col("n_matched"), col("n_new"), col("n_gone"),
        ((col("rev_b_c") - col("rev_a_c")) * 1000).as("delta_milli"),
        col("price_effect_milli"), col("volume_effect_milli"),
        col("new_effect_milli"), col("discontinued_effect_milli"),
        ((col("rev_b_c") - col("rev_a_c")) * 1000 -
          col("price_effect_milli") - col("volume_effect_milli") -
          col("new_effect_milli") - col("discontinued_effect_milli"))
          .as("residual_milli"))
  }

  def revenueBridgeSql(): String =
    s"""WITH sales AS (${graft.model.Tables.salesSql}),
       |monthly AS (
       |  SELECT sku, substring(sale_date, 1, 7) AS month,
       |    CAST(SUM(line_total) * 100 AS BIGINT) AS cents,
       |    CAST(SUM(quantity) AS BIGINT) AS qty
       |  FROM sales GROUP BY 1, 2),
       |priced AS (
       |  SELECT *, cents * 1000 // qty AS p_milli FROM monthly),
       |mm AS (
       |  SELECT (SELECT MAX(month) FROM priced) AS mb,
       |    (SELECT MAX(month) FROM priced
       |     WHERE month < (SELECT MAX(month) FROM priced)) AS ma),
       |a AS (SELECT sku, cents AS c0, qty AS q0, p_milli AS p0
       |  FROM priced CROSS JOIN mm WHERE month = ma),
       |b AS (SELECT sku, cents AS c1, qty AS q1, p_milli AS p1
       |  FROM priced CROSS JOIN mm WHERE month = mb),
       |j AS (SELECT * FROM a FULL OUTER JOIN b USING (sku)),
       |agg AS (
       |  SELECT
       |    CAST(COALESCE(SUM(c0), 0) AS BIGINT) AS rev_a_c,
       |    CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS rev_b_c,
       |    CAST(SUM(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |    CAST(SUM(CASE WHEN c0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_new,
       |    CAST(SUM(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_gone,
       |    CAST(COALESCE(SUM(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL
       |      THEN (p1 - p0) * q1 END), 0) AS BIGINT) AS price_effect_milli,
       |    CAST(COALESCE(SUM(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL
       |      THEN (q1 - q0) * p0 END), 0) AS BIGINT) AS volume_effect_milli,
       |    CAST(COALESCE(SUM(CASE WHEN c0 IS NULL THEN c1 * 1000 END), 0)
       |      AS BIGINT) AS new_effect_milli,
       |    CAST(-COALESCE(SUM(CASE WHEN c1 IS NULL THEN c0 * 1000 END), 0)
       |      AS BIGINT) AS discontinued_effect_milli
       |  FROM j)
       |SELECT (SELECT ma FROM mm) AS month_a, (SELECT mb FROM mm) AS month_b,
       |  rev_a_c, rev_b_c, n_matched, n_new, n_gone,
       |  (rev_b_c - rev_a_c) * 1000 AS delta_milli,
       |  price_effect_milli, volume_effect_milli, new_effect_milli,
       |  discontinued_effect_milli,
       |  (rev_b_c - rev_a_c) * 1000 - price_effect_milli
       |    - volume_effect_milli - new_effect_milli
       |    - discontinued_effect_milli AS residual_milli
       |FROM agg""".stripMargin
}
