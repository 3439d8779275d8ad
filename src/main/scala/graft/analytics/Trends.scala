package graft.analytics

import graft.etl.{Defaults, StoreDaily}
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A13/A14/A17/A20/A21: the /trends read path (reference:
  * backend/functions/get-trends/lambda_function.py:171-336).
  *
  * All inputs are the (store,day) / (sku,day) summary relations — already
  * reduced — so these stay cheap at any fact-table scale. Window functions
  * partition on the analyzed key (store / sku): one hash shuffle each.
  */
object Trends {

  private def sdRange(spark: SparkSession, dir: String,
                      from: String, to: String): DataFrame =
    StoreDaily.rollupDec(spark, dir)
      .filter(col("sale_date").between(from, to))

  private def sdRangeSql(from: String, to: String): String =
    s"""SELECT * FROM (${StoreDaily.rollupDecSql})
       |WHERE sale_date BETWEEN '$from' AND '$to'""".stripMargin

  /** A13: half-vs-half trend per store over a date range
    * (get-trends:232-247): order the store's (nonzero) daily sales by
    * date, split at mid = n/2; second-half avg vs first-half avg ±10%.
    * Days without sales simply don't exist in the summary relation, which
    * matches the reference's nonzero filter. */
  def trendHalves(spark: SparkSession, dir: String,
                  from: String = Defaults.rangeStart,
                  to: String = Defaults.rangeEnd): DataFrame = {
    val w = Window.partitionBy(col("store_id")).orderBy(col("sale_date"))
    sdRange(spark, dir, from, to)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("store_id"))))
      .withColumn("mid", (col("n") / 2).cast("long"))
      .groupBy(col("store_id"))
      .agg(
        max(col("n")).as("days"),
        sum(when(col("rn") <= col("mid"), col("gross_dec"))).as("first_dec"),
        sum(when(col("rn") > col("mid"), col("gross_dec"))).as("second_dec"),
        max(col("mid")).as("first_n"),
        (max(col("n")) - max(col("mid"))).as("second_n"))
      .select(
        col("store_id"), col("days"),
        when(col("first_n") > 0, col("first_dec").cast("double") / col("first_n"))
          .as("first_half_avg"),
        (col("second_dec").cast("double") / col("second_n")).as("second_half_avg"),
        // reference emits 0, not null, when the guard fails (get-trends:245)
        when(col("first_n") > 0,
          (col("second_dec").cast("double") / col("second_n")
            - col("first_dec").cast("double") / col("first_n"))
            / (col("first_dec").cast("double") / col("first_n")) * 100)
          .otherwise(0.0).as("trend_percent"),
        when(col("days") < 2, "insufficient_data")
          .when(col("second_dec").cast("double") / col("second_n") >
            col("first_dec").cast("double") / col("first_n") * 1.1, "increasing")
          .when(col("second_dec").cast("double") / col("second_n") <
            col("first_dec").cast("double") / col("first_n") * 0.9, "decreasing")
          .otherwise("stable").as("direction"))
      .orderBy(col("store_id"))
  }

  def trendHalvesSql(from: String = Defaults.rangeStart,
                     to: String = Defaults.rangeEnd): String =
    s"""WITH sd AS (${sdRangeSql(from, to)}),
       |ranked AS (
       |  SELECT store_id, gross_dec,
       |    ROW_NUMBER() OVER (PARTITION BY store_id ORDER BY sale_date) AS rn,
       |    COUNT(*) OVER (PARTITION BY store_id) AS n,
       |    COUNT(*) OVER (PARTITION BY store_id) // 2 AS mid
       |  FROM sd),
       |agg AS (
       |  SELECT store_id,
       |    MAX(n) AS days,
       |    SUM(CASE WHEN rn <= mid THEN gross_dec END) AS first_dec,
       |    SUM(CASE WHEN rn > mid THEN gross_dec END) AS second_dec,
       |    MAX(mid) AS first_n,
       |    MAX(n) - MAX(mid) AS second_n
       |  FROM ranked GROUP BY store_id)
       |SELECT store_id, days,
       |  CASE WHEN first_n > 0 THEN CAST(first_dec AS DOUBLE) / first_n END AS first_half_avg,
       |  CAST(second_dec AS DOUBLE) / second_n AS second_half_avg,
       |  COALESCE(CASE WHEN first_n > 0 THEN
       |    (CAST(second_dec AS DOUBLE) / second_n - CAST(first_dec AS DOUBLE) / first_n)
       |      / (CAST(first_dec AS DOUBLE) / first_n) * 100 END, 0.0) AS trend_percent,
       |  CASE
       |    WHEN days < 2 THEN 'insufficient_data'
       |    WHEN CAST(second_dec AS DOUBLE) / second_n >
       |      CAST(first_dec AS DOUBLE) / first_n * 1.1 THEN 'increasing'
       |    WHEN CAST(second_dec AS DOUBLE) / second_n <
       |      CAST(first_dec AS DOUBLE) / first_n * 0.9 THEN 'decreasing'
       |    ELSE 'stable' END AS direction
       |FROM agg
       |ORDER BY store_id""".stripMargin

  /** A14: first-vs-last trend percent per store (get-trends:318-324).
    * min_by/max_by on the unique date key — deterministic argmin/argmax. */
  def trendFirstLast(spark: SparkSession, dir: String,
                     from: String = Defaults.rangeStart,
                     to: String = Defaults.rangeEnd): DataFrame =
    sdRange(spark, dir, from, to)
      .groupBy(col("store_id"))
      .agg(
        min_by(col("gross_dec"), col("sale_date")).as("first_dec"),
        max_by(col("gross_dec"), col("sale_date")).as("last_dec"))
      .select(
        col("store_id"),
        col("first_dec").cast("double").as("first_sales"),
        col("last_dec").cast("double").as("last_sales"),
        // reference emits 0, not null, when first <= 0 (get-trends:322)
        when(col("first_dec") > 0,
          (col("last_dec").cast("double") - col("first_dec").cast("double"))
            / col("first_dec").cast("double") * 100).otherwise(0.0).as("trend_percent"))
      .orderBy(col("store_id"))

  def trendFirstLastSql(from: String = Defaults.rangeStart,
                        to: String = Defaults.rangeEnd): String =
    s"""WITH sd AS (${sdRangeSql(from, to)})
       |SELECT store_id,
       |  CAST(arg_min(gross_dec, sale_date) AS DOUBLE) AS first_sales,
       |  CAST(arg_max(gross_dec, sale_date) AS DOUBLE) AS last_sales,
       |  COALESCE(CASE WHEN arg_min(gross_dec, sale_date) > 0 THEN
       |    (CAST(arg_max(gross_dec, sale_date) AS DOUBLE) - CAST(arg_min(gross_dec, sale_date) AS DOUBLE))
       |      / CAST(arg_min(gross_dec, sale_date) AS DOUBLE) * 100 END, 0.0) AS trend_percent
       |FROM sd
       |GROUP BY store_id
       |ORDER BY store_id""".stripMargin

  /** A17/O3: per-product multi-day totals over a range, averages over
    * NONZERO days only (get-trends:225-229), top-15 by revenue. Built on
    * the lossy per-(day,sku) rollup like the reference. */
  def productTrends(spark: SparkSession, dir: String,
                    from: String = Defaults.rangeStart,
                    to: String = Defaults.rangeEnd): DataFrame = {
    val pd = StoreDaily.topProductsDecRange(spark, dir, 5, from, to)
      .groupBy(col("sale_date"), col("sku"))
      .agg(sum(col("units")).as("units"), sum(col("rev_dec")).as("rev_dec"))
    // top-15 as sort+limit (TakeOrderedAndProject: per-partition partial
    // top-k, then a 15-row driver merge) instead of a global row_number
    // window, which would funnel every sku through one partition at scale;
    // the rank window then runs over only the 15 surviving rows.
    val w = Window.orderBy(col("rev_total").desc, col("sku").asc)
    pd.groupBy(col("sku"))
      .agg(
        sum(col("units")).as("units_total"),
        sum(col("rev_dec")).as("rev_total"),
        // pd is keyed by (sale_date, sku): a plain count IS the distinct
        // day count, without the Expand a COUNT(DISTINCT) plans
        count(lit(1)).as("days_sold"))
      .orderBy(col("rev_total").desc, col("sku").asc)
      .limit(15)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("sku"), col("units_total").as("units_sold"),
        col("rev_total").cast("double").as("revenue"), col("days_sold"),
        (col("units_total").cast("double") / col("days_sold")).as("avg_daily_units"),
        (col("rev_total").cast("double") / col("days_sold")).as("avg_daily_revenue"))
      .orderBy(col("rank"))
  }

  def productTrendsSql(from: String = Defaults.rangeStart,
                       to: String = Defaults.rangeEnd): String =
    s"""WITH top5 AS (${StoreDaily.topProductsDecSql(5)}),
       |pd AS (
       |  SELECT sale_date, sku, CAST(SUM(units) AS BIGINT) AS units, SUM(rev_dec) AS rev_dec
       |  FROM top5 WHERE sale_date BETWEEN '$from' AND '$to'
       |  GROUP BY sale_date, sku),
       |agg AS (
       |  SELECT sku,
       |    CAST(SUM(units) AS BIGINT) AS units_sold,
       |    SUM(rev_dec) AS rev_total,
       |    COUNT(*) AS days_sold
       |  FROM pd GROUP BY sku),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY rev_total DESC, sku ASC) AS rank FROM agg)
       |SELECT rank, sku, units_sold,
       |  CAST(rev_total AS DOUBLE) AS revenue, days_sold,
       |  CAST(units_sold AS DOUBLE) / days_sold AS avg_daily_units,
       |  CAST(rev_total AS DOUBLE) / days_sold AS avg_daily_revenue
       |FROM ranked WHERE rank <= 15
       |ORDER BY rank""".stripMargin

  /** A20: wide time-series pivot — per date: company totals + per-store
    * `{store}_sales`/`{store}_transactions` columns, zero-filled
    * (get-trends:266-304). The pivot column list is the REAL store set of
    * the queried range (the reference pivots its full fixed store set,
    * get-trends:295-301); deriving it costs one dimension-sized distinct +
    * driver collect — the same broadcast-config pattern as the reference's
    * store list. Spark's native pivot plans this as two aggregates
    * (partial per (date,store) cell, then PivotFirst per date) rather than
    * 2·|stores| conditional aggregates, which keeps codegen tractable when
    * the store dimension grows with SF. */
  def pivotWide(spark: SparkSession, dir: String,
                from: String = Defaults.rangeStart,
                to: String = Defaults.rangeEnd): DataFrame = {
    val sd = sdRange(spark, dir, from, to)
    // Column list from the STORE DIMENSION (the reference's fixed store
    // set, get-trends:295-301) — a dimension-table scan instead of a
    // distinct over the fact rollup. Every store trades in every queried
    // range at all SFs (and the spec asserts dimension/fact agreement),
    // so the columns match the oracle's data-derived dynamic PIVOT.
    val stores = graft.model.Tables.supplier(spark, dir)
      .select(format_string("%04d", col("s_suppkey")).as("store_id"))
      .collect().map(_.getString(0)).sorted.toSeq
    val piv = sd.groupBy(col("sale_date"))
      .pivot(concat(lit("s"), col("store_id")), stores.map("s" + _))
      .agg(sum(col("gross_dec")).as("sales"),
        sum(col("transaction_count")).as("transactions"))
    val tot = sd.groupBy(col("sale_date"))
      .agg(sum(col("transaction_count")).as("total_transactions"),
        sum(col("gross_dec")).cast("double").as("total_sales"))
    val storeCols = stores.flatMap(s => Seq(
      coalesce(col(s"s${s}_sales"), lit(0)).cast("double").as(s"s${s}_sales"),
      coalesce(col(s"s${s}_transactions"), lit(0L)).as(s"s${s}_transactions")))
    piv.join(tot, Seq("sale_date"))
      .select(col("sale_date") +: storeCols :+ col("total_transactions")
        :+ col("total_sales"): _*)
      .orderBy(col("sale_date"))
  }

  /** Oracle twin of [[pivotWide]]: DuckDB's dynamic `PIVOT` derives the
    * same store column set from the data; the outer `COLUMNS` regex
    * re-select zero-fills and types the generated columns (`CAST AS
    * BIGINT` on the transaction sums — DuckDB SUM(BIGINT) is HUGEINT,
    * the r2 hash-mismatch). */
  def pivotWideSql(from: String = Defaults.rangeStart,
                   to: String = Defaults.rangeEnd): String =
    s"""WITH sd AS (${sdRangeSql(from, to)}),
       |piv AS (
       |  PIVOT sd ON 's' || store_id
       |  USING SUM(gross_dec) AS sales, SUM(transaction_count) AS transactions
       |  GROUP BY sale_date),
       |tot AS (
       |  SELECT sale_date,
       |    CAST(SUM(transaction_count) AS BIGINT) AS total_transactions,
       |    CAST(SUM(gross_dec) AS DOUBLE) AS total_sales
       |  FROM sd GROUP BY sale_date)
       |SELECT sale_date,
       |  CAST(COALESCE(COLUMNS('(s[0-9]+_sales)'), 0) AS DOUBLE) AS '\\1',
       |  CAST(COALESCE(COLUMNS('(s[0-9]+_transactions)'), 0) AS BIGINT) AS '\\1',
       |  total_transactions, total_sales
       |FROM piv JOIN tot USING (sale_date)
       |ORDER BY sale_date""".stripMargin

  /** A21/O5: per-store period summary, sorted by total sales desc
    * (get-trends:307-336), with the A14 trend percent folded in. */
  def storePeriodSummary(spark: SparkSession, dir: String,
                         from: String = Defaults.rangeStart,
                         to: String = Defaults.rangeEnd): DataFrame =
    sdRange(spark, dir, from, to)
      .groupBy(col("store_id"))
      .agg(
        sum(col("gross_dec")).as("sales_dec"),
        sum(col("transaction_count")).as("total_transactions"),
        count(lit(1)).as("days_with_data"),
        min_by(col("gross_dec"), col("sale_date")).as("first_dec"),
        max_by(col("gross_dec"), col("sale_date")).as("last_dec"))
      .select(
        col("store_id"),
        col("sales_dec").cast("double").as("total_sales"),
        col("total_transactions"), col("days_with_data"),
        (col("sales_dec").cast("double") / col("days_with_data")).as("avg_daily_sales"),
        when(col("first_dec") > 0,
          (col("last_dec").cast("double") - col("first_dec").cast("double"))
            / col("first_dec").cast("double") * 100).otherwise(0.0).as("trend_percent"))
      .orderBy(col("total_sales").desc, col("store_id").asc)

  /** a27: daily store ranking and day-over-day movement — rank by sales
    * within each day (dense ranking over the summary relation), then the
    * movement vs the store's previous reported day. Two window passes:
    * one partitioned by day (rank), one by store (lag) — each a single
    * hash shuffle of the dimension-sized summary. */
  def rankMovement(spark: SparkSession, dir: String,
                   from: String = Defaults.rangeStart,
                   to: String = Defaults.rangeEnd): DataFrame = {
    val byDay = Window.partitionBy(col("sale_date"))
      .orderBy(col("gross_dec").desc, col("store_id").asc)
    val byStore = Window.partitionBy(col("store_id")).orderBy(col("sale_date"))
    sdRange(spark, dir, from, to)
      .withColumn("day_rank", row_number().over(byDay))
      .withColumn("prev_rank", lag(col("day_rank"), 1).over(byStore))
      .select(col("store_id"), col("sale_date"), col("day_rank"),
        col("prev_rank"),
        (coalesce(col("prev_rank"), col("day_rank")) - col("day_rank")).as("movement"))
      .orderBy(col("sale_date"), col("day_rank"))
  }

  def rankMovementSql(from: String = Defaults.rangeStart,
                      to: String = Defaults.rangeEnd): String =
    s"""WITH sd AS (${sdRangeSql(from, to)}),
       |ranked AS (
       |  SELECT store_id, sale_date,
       |    ROW_NUMBER() OVER (PARTITION BY sale_date
       |      ORDER BY gross_dec DESC, store_id ASC) AS day_rank
       |  FROM sd),
       |moved AS (
       |  SELECT *, LAG(day_rank) OVER (PARTITION BY store_id ORDER BY sale_date) AS prev_rank
       |  FROM ranked)
       |SELECT store_id, sale_date, day_rank, prev_rank,
       |  COALESCE(prev_rank, day_rank) - day_rank AS movement
       |FROM moved
       |ORDER BY sale_date, day_rank""".stripMargin

  /** a28: week-over-week growth — weekly company sales with the previous
    * week's value (lag over the ISO-week rollup) and the growth ratio as
    * one exact-operand IEEE division. */
  def wowGrowth(spark: SparkSession, dir: String): DataFrame = {
    val weekly = StoreDaily.rollupDec(spark, dir)
      .groupBy(date_format(date_trunc("week", to_date(col("sale_date"))), "yyyy-MM-dd")
        .as("week_start"))
      .agg(sum(col("gross_dec")).as("week_dec"))
    val w = Window.orderBy(col("week_start"))
    weekly
      .withColumn("prev_dec", lag(col("week_dec"), 1).over(w))
      .select(col("week_start"),
        col("week_dec").cast("double").as("week_sales"),
        col("prev_dec").cast("double").as("prev_week_sales"),
        when(col("prev_dec") > 0,
          (col("week_dec").cast("double") - col("prev_dec").cast("double"))
            / col("prev_dec").cast("double") * 100).as("wow_growth_pct"))
      .orderBy(col("week_start"))
  }

  val wowGrowthSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |weekly AS (
       |  SELECT strftime(date_trunc('week', CAST(sale_date AS DATE)), '%Y-%m-%d') AS week_start,
       |    SUM(gross_dec) AS week_dec
       |  FROM sd GROUP BY 1),
       |lagged AS (
       |  SELECT *, LAG(week_dec) OVER (ORDER BY week_start) AS prev_dec FROM weekly)
       |SELECT week_start,
       |  CAST(week_dec AS DOUBLE) AS week_sales,
       |  CAST(prev_dec AS DOUBLE) AS prev_week_sales,
       |  CASE WHEN prev_dec > 0 THEN
       |    (CAST(week_dec AS DOUBLE) - CAST(prev_dec AS DOUBLE))
       |      / CAST(prev_dec AS DOUBLE) * 100 END AS wow_growth_pct
       |FROM lagged
       |ORDER BY week_start""".stripMargin

  /** x2: day-of-week seasonality profile — company daily sales averaged by
    * weekday (the reference bakes Mon 0.85 … Sat 1.40 multipliers into its
    * generator, generate_sample_data.py:75-88; this is the read-side
    * recovery of that profile). Spark `dayofweek` is 1=Sunday..7; DuckDB
    * `dayofweek` is 0=Sunday..6, hence the +1 in the oracle. */
  def dowProfile(spark: SparkSession, dir: String): DataFrame =
    StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"))
      .agg(sum(col("gross_dec")).as("day_dec"))
      .withColumn("dow", dayofweek(to_date(col("sale_date"))).cast("long"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("day_dec")).as("sales_dec"))
      .select(col("dow"), col("n_days"),
        col("sales_dec").cast("double").as("total_sales"),
        (col("sales_dec").cast("double") / col("n_days")).as("avg_daily_sales"))
      .orderBy(col("dow"))

  /** a42: SEASONALITY INDEX per (store, day-of-week) — each store's
    * weekday profile normalized by its own mean day (index 1.0 = an
    * average day; the BI heatmap behind staffing/stocking decisions,
    * and x2's company-wide profile broken out per store so a mall
    * store's weekend spike isn't averaged away by office-district
    * stores). Exactness: both means are single IEEE divisions of
    * exact decimal-summed cents, then ONE ratio — fixed op order both
    * engines. Shape: two rollups of the cached (store, day) silver
    * (|stores|·7 and |stores| rows) joined on store_id. */
  def seasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val sd = StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"),
        ((col("gross_dec") - col("disc_dec")) * 100)
          .cast(org.apache.spark.sql.types.DecimalType(18, 0)).as("net_c"))
      .withColumn("dow", dayofweek(to_date(col("sale_date"))).cast("long"))
    val byDow = sd.groupBy(col("store_id"), col("dow"))
      .agg(count(lit(1)).as("n_days_dow"),
        sum(col("net_c")).cast("long").as("dow_c"))
    val byStore = sd.groupBy(col("store_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("net_c")).cast("long").as("store_c"))
    byDow.join(byStore, "store_id")
      .select(col("store_id"), col("dow"), col("n_days_dow"),
        ((col("dow_c").cast("double") / col("n_days_dow").cast("double")) /
          (col("store_c").cast("double") / col("n_days").cast("double")))
          .as("seasonal_index"))
      .orderBy(col("store_id"), col("dow"))
  }

  val seasonalIndexSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |base AS (
       |  SELECT store_id, sale_date,
       |    CAST((gross_dec - disc_dec) * 100 AS DECIMAL(18,0)) AS net_c,
       |    CAST(dayofweek(CAST(sale_date AS DATE)) + 1 AS BIGINT) AS dow
       |  FROM sd),
       |by_dow AS (
       |  SELECT store_id, dow, CAST(COUNT(*) AS BIGINT) AS n_days_dow,
       |    CAST(SUM(net_c) AS BIGINT) AS dow_c
       |  FROM base GROUP BY 1, 2),
       |by_store AS (
       |  SELECT store_id, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(net_c) AS BIGINT) AS store_c
       |  FROM base GROUP BY 1)
       |SELECT d.store_id, d.dow, d.n_days_dow,
       |  (CAST(dow_c AS DOUBLE) / CAST(n_days_dow AS DOUBLE)) /
       |    (CAST(store_c AS DOUBLE) / CAST(n_days AS DOUBLE))
       |    AS seasonal_index
       |FROM by_dow d JOIN by_store s ON d.store_id = s.store_id
       |ORDER BY d.store_id, d.dow""".stripMargin

  val dowProfileSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |daily AS (
       |  SELECT sale_date, SUM(gross_dec) AS day_dec
       |  FROM sd GROUP BY sale_date)
       |SELECT CAST(dayofweek(CAST(sale_date AS DATE)) + 1 AS BIGINT) AS dow,
       |  COUNT(*) AS n_days,
       |  CAST(SUM(day_dec) AS DOUBLE) AS total_sales,
       |  CAST(SUM(day_dec) AS DOUBLE) / COUNT(*) AS avg_daily_sales
       |FROM daily
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  def storePeriodSummarySql(from: String = Defaults.rangeStart,
                            to: String = Defaults.rangeEnd): String =
    s"""WITH sd AS (${sdRangeSql(from, to)})
       |SELECT store_id,
       |  CAST(SUM(gross_dec) AS DOUBLE) AS total_sales,
       |  CAST(SUM(transaction_count) AS BIGINT) AS total_transactions,
       |  COUNT(*) AS days_with_data,
       |  CAST(SUM(gross_dec) AS DOUBLE) / COUNT(*) AS avg_daily_sales,
       |  COALESCE(CASE WHEN arg_min(gross_dec, sale_date) > 0 THEN
       |    (CAST(arg_max(gross_dec, sale_date) AS DOUBLE) - CAST(arg_min(gross_dec, sale_date) AS DOUBLE))
       |      / CAST(arg_min(gross_dec, sale_date) AS DOUBLE) * 100 END, 0.0) AS trend_percent
       |FROM sd
       |GROUP BY store_id
       |ORDER BY CAST(SUM(gross_dec) AS DOUBLE) DESC, store_id ASC""".stripMargin

  /** a30: per-store ORDINARY-LEAST-SQUARES daily-sales trend — the
    * closed-form regression a BI layer fits per entity (slope $/day,
    * intercept, R², next-day forecast): the continuous upgrade of
    * a12/a13's categorical trend verdicts. All five moments (Σx, Σx²,
    * Σy, Σxy, Σy²) accumulate EXACTLY — x is the day offset from the
    * store's own first sale day (small integers, so products stay in
    * range), y the DECIMAL net; only the final closed-form touches
    * doubles, as one fixed scalar expression sequence both engines
    * evaluate identically (the Tables parity discipline: exact sums
    * into single IEEE ops). Degenerate fits return NULL (one-day
    * stores: no slope; constant sales: no R²) — never a 0/0.
    *
    * Scale shape: the per-store min-date window and the moments
    * rollup both ride ONE store_id exchange over the cached (store,
    * day) silver — a bounded-group running-moment pass, the same
    * shape a distributed GLM fit uses for its sufficient statistics
    * (moments are map-side-combinable; nothing global anywhere). */
  def salesTrendOls(spark: SparkSession, dir: String): DataFrame = {
    // y moments accumulate as SCALE-0 integer cents so the decimal→double
    // edge is the same two steps in both engines (exact-integer cast, then
    // one power-of-ten division) — a (38,4) decimal cast straight to
    // double can land one ulp apart across decimal implementations.
    val netCents = ((col("gross_dec") - col("disc_dec")) * 100)
      .cast(org.apache.spark.sql.types.DecimalType(18, 0))
    val sd = StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"), netCents.as("net_c"))
    val wMin = Window.partitionBy(col("store_id"))
    val base = sd.withColumn("x",
      datediff(to_date(col("sale_date")),
        to_date(min(col("sale_date")).over(wMin))).cast("long"))
    val xDec = col("x").cast(org.apache.spark.sql.types.DecimalType(10, 0))
    val m = base.groupBy(col("store_id")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      max(col("x")).as("mx"),
      sum(col("net_c")).as("sy_c"),
      sum(xDec * col("net_c")).as("sxy_c"),
      sum(col("net_c") * col("net_c")).as("syy_c"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val syD = col("sy_c").cast("double") / lit(100.0)
    val sxyD = col("sxy_c").cast("double") / lit(100.0)
    val syyD = col("syy_c").cast("double") / lit(10000.0)
    m.withColumn("varx", sxxD - sxD * sxD / nD)
      .withColumn("covxy", sxyD - sxD * syD / nD)
      .withColumn("vary", syyD - syD * syD / nD)
      .withColumn("slope",
        when(col("varx") === 0.0, lit(null).cast("double"))
          .otherwise(col("covxy") / col("varx")))
      .withColumn("intercept",
        when(col("slope").isNull, lit(null).cast("double"))
          .otherwise(syD / nD - col("slope") * (sxD / nD)))
      .withColumn("r2",
        when(col("varx") === 0.0 || col("vary") === 0.0,
          lit(null).cast("double"))
          .otherwise(col("covxy") * col("covxy") /
            (col("varx") * col("vary"))))
      .withColumn("forecast_next",
        when(col("slope").isNull, lit(null).cast("double"))
          .otherwise(col("slope") * (col("mx") + 1).cast("double") +
            col("intercept")))
      .select(col("store_id"), col("n").as("n_days"), col("slope"),
        col("intercept"), col("r2"), col("forecast_next"))
      .orderBy("store_id")
  }

  /** a41: DISCOUNT ELASTICITY per part brand — a30's closed-form OLS
    * pointed at the pricing question: does a deeper discount move
    * quantity, per brand? x = discount in exact integer percent
    * points, y = quantity in units, so every moment (n, Σx, Σy, Σxy,
    * Σx², Σy²) is an exact 64-bit integer and only the a30-ordered
    * closing formula touches doubles — bit-identical across engines.
    * Shape: the part dimension broadcasts into the fact scan, one
    * |brands|-bounded aggregate carries six integer moments. */
  def discountElasticity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"),
      (col("l_discount").cast(org.apache.spark.sql.types.DecimalType(4, 2)) * 100)
        .cast("long").as("x"),
      col("l_quantity").cast("long").as("y"))
    val p = broadcast(Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand")))
    val m = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val syyD = col("syy").cast("double")
    m.withColumn("varx", sxxD - sxD * sxD / nD)
      .withColumn("covxy", sxyD - sxD * syD / nD)
      .withColumn("vary", syyD - syD * syD / nD)
      .withColumn("slope",
        when(col("varx") === 0.0, lit(null).cast("double"))
          .otherwise(col("covxy") / col("varx")))
      .withColumn("intercept",
        when(col("slope").isNull, lit(null).cast("double"))
          .otherwise(syD / nD - col("slope") * (sxD / nD)))
      .withColumn("r2",
        when(col("varx") === 0.0 || col("vary") === 0.0,
          lit(null).cast("double"))
          .otherwise(col("covxy") * col("covxy") /
            (col("varx") * col("vary"))))
      .select(col("p_brand"), col("n").as("n_lines"), col("slope"),
        col("intercept"), col("r2"))
      .orderBy("p_brand")
  }

  val discountElasticitySql: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x,
      |    CAST(l_quantity AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT p_brand,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM li JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand),
      |d AS (
      |  SELECT p_brand, n,
      |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |      / CAST(n AS DOUBLE) AS varx,
      |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
      |      / CAST(n AS DOUBLE) AS covxy,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |      / CAST(n AS DOUBLE) AS vary,
      |    CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM m)
      |SELECT p_brand, n AS n_lines,
      |  CASE WHEN varx = 0.0 THEN NULL ELSE covxy / varx END AS slope,
      |  CASE WHEN varx = 0.0 THEN NULL
      |    ELSE syd / nd - (covxy / varx) * (sxd / nd) END AS intercept,
      |  CASE WHEN varx = 0.0 OR vary = 0.0 THEN NULL
      |    ELSE covxy * covxy / (varx * vary) END AS r2
      |FROM d ORDER BY p_brand""".stripMargin

  /** a43: FULFILLMENT BACKLOG over time — the open-quantity series an
    * operations dashboard tracks: per month, quantity ordered (all
    * lines shipping that month or later... measured by order date)
    * versus quantity already shipped, with the backlog as the running
    * difference of the two cumulative series. Exact integers
    * throughout; the two monthly series come from ONE month-keyed
    * aggregate each (map-side combinable), and the cumulative windows
    * run over the |months|-bounded rollup — never over rows. */
  def fulfillmentBacklog(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
    val ordered = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("month"))
      .agg(sum(col("qty")).cast("long").as("qty_ordered"))
    val shipped = li.groupBy(col("ship_month").as("month"))
      .agg(sum(col("qty")).cast("long").as("qty_shipped"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered.join(shipped, Seq("month"), "full_outer")
      .select(col("month"),
        coalesce(col("qty_ordered"), lit(0L)).as("qty_ordered"),
        coalesce(col("qty_shipped"), lit(0L)).as("qty_shipped"))
      .withColumn("cum_ordered", sum(col("qty_ordered")).over(w).cast("long"))
      .withColumn("cum_shipped", sum(col("qty_shipped")).over(w).cast("long"))
      .withColumn("backlog_qty", col("cum_ordered") - col("cum_shipped"))
      .orderBy(col("month"))
  }

  val fulfillmentBacklogSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty,
      |    strftime(l_shipdate, '%Y-%m') AS ship_month
      |  FROM lineitem),
      |ordered AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(qty) AS BIGINT) AS qty_ordered
      |  FROM li JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1),
      |shipped AS (
      |  SELECT ship_month AS month, CAST(SUM(qty) AS BIGINT) AS qty_shipped
      |  FROM li GROUP BY 1),
      |m AS (
      |  SELECT COALESCE(o.month, s.month) AS month,
      |    COALESCE(qty_ordered, 0) AS qty_ordered,
      |    COALESCE(qty_shipped, 0) AS qty_shipped
      |  FROM ordered o FULL OUTER JOIN shipped s ON o.month = s.month)
      |SELECT month, qty_ordered, qty_shipped,
      |  CAST(SUM(qty_ordered) OVER (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_ordered,
      |  CAST(SUM(qty_shipped) OVER (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_shipped,
      |  CAST(SUM(qty_ordered) OVER (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) -
      |  CAST(SUM(qty_shipped) OVER (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS backlog_qty
      |FROM m ORDER BY month""".stripMargin

  /** a32: PARETO / revenue-concentration analysis — stores ranked by
    * total net revenue with exact cumulative shares, flagging the head
    * set that covers 80% of revenue (the "how concentrated is the
    * business" BI staple; for a corpus the same algebra answers "how
    * few domains dominate the token mass"). Shares are integer-exact:
    * the 80% test is cum_cents·5 ≥ total_cents·4 — no float
    * thresholds; the emitted share columns are single divisions of
    * exact cents. The ranking window is |stores|-dimension-sized over
    * the cached (store, day) silver's rollup — the fact table is
    * touched only by the silver build. */
  def paretoStores(spark: SparkSession, dir: String): DataFrame = {
    val byStore = StoreDaily.rollupDec(spark, dir)
      .groupBy(col("store_id"))
      .agg(((sum(col("gross_dec")) - sum(col("disc_dec"))) * 100)
        .cast(org.apache.spark.sql.types.DecimalType(18, 0)).as("net_c"))
    val total = byStore.agg(sum(col("net_c"))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("total_c"))
    val w = Window.orderBy(col("net_c").desc, col("store_id").asc)
    byStore
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_c",
        sum(col("net_c")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("store_id"),
        (col("net_c").cast("double") / lit(100.0)).as("net_revenue"),
        (col("net_c").cast("double") / col("total_c").cast("double"))
          .as("revenue_share"),
        (col("cum_c").cast("double") / col("total_c").cast("double"))
          .as("cum_share"),
        (col("cum_c") * 5 >= col("total_c") * 4).as("cum_reached_80"))
      .orderBy(col("rank"))
  }

  val paretoStoresSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |by_store AS (
       |  SELECT store_id,
       |    CAST((SUM(gross_dec) - SUM(disc_dec)) * 100 AS DECIMAL(18,0))
       |      AS net_c
       |  FROM sd GROUP BY 1),
       |total AS (
       |  SELECT CAST(SUM(net_c) AS DECIMAL(38,0)) AS total_c FROM by_store),
       |ranked AS (
       |  SELECT store_id, net_c,
       |    ROW_NUMBER() OVER w AS rank,
       |    CAST(SUM(net_c) OVER (ORDER BY net_c DESC, store_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS DECIMAL(38,0)) AS cum_c
       |  FROM by_store
       |  WINDOW w AS (ORDER BY net_c DESC, store_id ASC))
       |SELECT CAST(r.rank AS BIGINT) AS rank, r.store_id,
       |  CAST(r.net_c AS DOUBLE) / 100.0 AS net_revenue,
       |  CAST(r.net_c AS DOUBLE) / CAST(t.total_c AS DOUBLE)
       |    AS revenue_share,
       |  CAST(r.cum_c AS DOUBLE) / CAST(t.total_c AS DOUBLE) AS cum_share,
       |  r.cum_c * 5 >= t.total_c * 4 AS cum_reached_80
       |FROM ranked r CROSS JOIN total t
       |ORDER BY rank""".stripMargin

  val salesTrendOlsSql: String =
    s"""WITH sd AS (
       |  SELECT store_id, sale_date,
       |    CAST((gross_dec - disc_dec) * 100 AS DECIMAL(18,0)) AS net_c
       |  FROM (${StoreDaily.rollupDecSql})),
       |b AS (
       |  SELECT store_id, net_c,
       |    date_diff('day',
       |      MIN(CAST(sale_date AS DATE)) OVER (PARTITION BY store_id),
       |      CAST(sale_date AS DATE)) AS x
       |  FROM sd),
       |m AS (
       |  SELECT store_id,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(MAX(x) AS BIGINT) AS mx,
       |    CAST(SUM(net_c) AS DECIMAL(38,0)) AS sy_c,
       |    CAST(SUM(CAST(x AS DECIMAL(10,0)) * net_c) AS DECIMAL(38,0)) AS sxy_c,
       |    CAST(SUM(net_c * net_c) AS DECIMAL(38,0)) AS syy_c
       |  FROM b GROUP BY 1),
       |v AS (
       |  SELECT store_id, n, mx,
       |    CAST(sx AS DOUBLE) AS sxd,
       |    CAST(sy_c AS DOUBLE) / 100.0 AS syd,
       |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
       |      / CAST(n AS DOUBLE) AS varx,
       |    CAST(sxy_c AS DOUBLE) / 100.0 - CAST(sx AS DOUBLE)
       |      * (CAST(sy_c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS covxy,
       |    CAST(syy_c AS DOUBLE) / 10000.0 - (CAST(sy_c AS DOUBLE) / 100.0)
       |      * (CAST(sy_c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS vary
       |  FROM m),
       |f AS (
       |  SELECT store_id, n, mx, syd, sxd, varx, vary, covxy,
       |    CASE WHEN varx = 0 THEN NULL ELSE covxy / varx END AS slope
       |  FROM v)
       |SELECT store_id, n AS n_days, slope,
       |  CASE WHEN slope IS NULL THEN NULL
       |    ELSE syd / CAST(n AS DOUBLE) - slope * (sxd / CAST(n AS DOUBLE))
       |    END AS intercept,
       |  CASE WHEN varx = 0 OR vary = 0 THEN NULL
       |    ELSE covxy * covxy / (varx * vary) END AS r2,
       |  CASE WHEN slope IS NULL THEN NULL
       |    ELSE slope * CAST(mx + 1 AS DOUBLE)
       |      + (syd / CAST(n AS DOUBLE) - slope * (sxd / CAST(n AS DOUBLE)))
       |    END AS forecast_next
       |FROM f ORDER BY store_id""".stripMargin

  /** a36: GINI REVENUE CONCENTRATION per day — how evenly the day's net
    * revenue spreads across stores, the one-number inequality summary a
    * BI page wants next to a32's Pareto curve (a32 ranks the cumulative
    * share; Gini integrates it: 0 = perfectly even, →1 = one store takes
    * all). Closed form over the ascending-ranked series:
    * G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), reported in exact milli via
    * integer cents (rank ties broken by store_id — both engines rank
    * identically). Rides the shared (store, day) rollup silver; the
    * per-day rank windows are store-count-bounded (never data-sized),
    * so the whole operator is one silver read + |days|×|stores| window
    * rows — at 100 TB the silver is the materialized daily summary
    * table and this is a dashboard-sized query. */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val byDay = StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"), col("store_id"))
      .agg(((sum(col("gross_dec")) - sum(col("disc_dec"))) * 100)
        .cast("long").as("net_c"))
    val w = Window.partitionBy(col("sale_date"))
      .orderBy(col("net_c").asc, col("store_id").asc)
    byDay
      .withColumn("rnk", row_number().over(w).cast("long"))
      .groupBy(col("sale_date"))
      .agg(count(lit(1)).as("n_stores"),
        sum(col("net_c")).as("total_cents"),
        sum(col("rnk") * col("net_c")).as("rank_weighted_c"))
      .select(col("sale_date"), col("n_stores"), col("total_cents"),
        expr("(2 * rank_weighted_c - (n_stores + 1) * total_cents) * 1000" +
          " div (n_stores * total_cents)").as("gini_milli"))
      .orderBy(col("sale_date"))
  }

  val giniConcentrationSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |by_day AS (
       |  SELECT sale_date, store_id,
       |    CAST((SUM(gross_dec) - SUM(disc_dec)) * 100 AS BIGINT) AS net_c
       |  FROM sd GROUP BY 1, 2),
       |ranked AS (
       |  SELECT sale_date, net_c,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY sale_date
       |      ORDER BY net_c ASC, store_id ASC) AS BIGINT) AS rnk
       |  FROM by_day),
       |agg AS (
       |  SELECT sale_date,
       |    CAST(COUNT(*) AS BIGINT) AS n_stores,
       |    CAST(SUM(net_c) AS BIGINT) AS total_cents,
       |    CAST(SUM(rnk * net_c) AS BIGINT) AS rank_weighted_c
       |  FROM ranked GROUP BY 1)
       |SELECT sale_date, n_stores, total_cents,
       |  (2 * rank_weighted_c - (n_stores + 1) * total_cents) * 1000
       |    // (n_stores * total_cents) AS gini_milli
       |FROM agg ORDER BY sale_date""".stripMargin

  /** a37: EWMA CONTROL CHART over company daily net revenue — the
    * smoother companion to a11's fixed-window deviation rubric: an
    * exponentially-weighted baseline reacts to level shifts in a few
    * days yet ignores single-day noise. The classic recursion
    * E_t = αx_t + (1−α)E_{t−1} needs libm-free engine parity, so the
    * fit is the exact FINITE-window form with α = 1/4 over the 8 prior
    * days: weights wᵢ = 3^(i−1)·4^(8−i) (lag i = 1..8 — the geometric
    * weights times 4⁸, all integers), baseline = Σwᵢ·xᵢ div Σwᵢ over
    * the lags actually present. Beyond 8 days the dropped geometric
    * tail holds < 10% of the mass; the truncation is the standard
    * "effective window" reading of EWMA and keeps every intermediate
    * in exact 64-bit integers (max weight 4⁷·cents ≪ 2⁶³). Flags days
    * whose deviation from their own baseline exceeds `flagMilli`.
    * One date-ordered window over |calendar days| rows on the company
    * silver — dashboard-sized at any corpus scale. */
  def ewmaControl(spark: SparkSession, dir: String,
                  flagMilli: Long = 300L): DataFrame = {
    val daily = StoreDaily.rollupDec(spark, dir)
      .groupBy(col("sale_date"))
      .agg(((sum(col("gross_dec")) - sum(col("disc_dec"))) * 100)
        .cast("long").as("net_c"))
    val w = Window.orderBy(col("sale_date"))
    val lags = (1 to 8).map { i =>
      val wi = math.pow(3, i - 1).toLong * math.pow(4, 8 - i).toLong
      (lag(col("net_c"), i).over(w), lit(wi))
    }
    val num = lags.map { case (x, wi) =>
      when(x.isNotNull, x * wi).otherwise(lit(0L)) }.reduce(_ + _)
    val den = lags.map { case (x, wi) =>
      when(x.isNotNull, wi).otherwise(lit(0L)) }.reduce(_ + _)
    daily
      .withColumn("num_c", num.cast("long"))
      .withColumn("den_c", den.cast("long"))
      // integer div, never Column./ (double division would round the
      // 4^7-scaled numerator past double's 53-bit exact range)
      .withColumn("ewma_c",
        when(col("den_c") > 0, expr("num_c div den_c")).cast("long"))
      .select(col("sale_date"), col("net_c"), col("ewma_c"),
        when(col("ewma_c") > 0,
          expr("(net_c - ewma_c) * 1000 div ewma_c")).as("dev_milli"))
      .withColumn("is_flagged",
        coalesce(abs(col("dev_milli")) > flagMilli, lit(false)))
      .orderBy(col("sale_date"))
  }

  def ewmaControlSql(flagMilli: Long = 300L): String = {
    val terms = (1 to 8).map { i =>
      val wi = math.pow(3, i - 1).toLong * math.pow(4, 8 - i).toLong
      (s"lag(net_c, $i) OVER (ORDER BY sale_date)", wi)
    }
    val num = terms.map { case (x, wi) =>
      s"CASE WHEN $x IS NOT NULL THEN $x * $wi ELSE 0 END" }
      .mkString(" + ")
    val den = terms.map { case (x, wi) =>
      s"CASE WHEN $x IS NOT NULL THEN $wi ELSE 0 END" }
      .mkString(" + ")
    s"""WITH sd AS (${StoreDaily.rollupDecSql}),
       |daily AS (
       |  SELECT sale_date,
       |    CAST((SUM(gross_dec) - SUM(disc_dec)) * 100 AS BIGINT) AS net_c
       |  FROM sd GROUP BY 1),
       |ew AS (
       |  SELECT sale_date, net_c,
       |    CASE WHEN ($den) > 0
       |      THEN CAST(($num) // ($den) AS BIGINT) END AS ewma_c
       |  FROM daily)
       |SELECT sale_date, net_c, ewma_c,
       |  CASE WHEN ewma_c > 0
       |    THEN (net_c - ewma_c) * 1000 // ewma_c END AS dev_milli,
       |  COALESCE(ABS(CASE WHEN ewma_c > 0
       |    THEN (net_c - ewma_c) * 1000 // ewma_c END) > $flagMilli,
       |    FALSE) AS is_flagged
       |FROM ew ORDER BY sale_date""".stripMargin
  }
}
