package graft.analytics

import graft.etl.{Defaults, StoreDaily}
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A9/A18: read-path KPI aggregates (reference: backend/functions/
  * get-analytics/lambda_function.py:192-230,52-80).
  *
  * A9 replicates a deliberate reference quirk: the flattened KPI/export
  * layer projects only {cash, credit, debit, gift_card} — `mobile` is
  * DROPPED (get-analytics:213-216; export-to-quicksight:205-209) even
  * though it exists in the breakdown maps. We preserve that projection
  * exactly.
  *
  * Scale posture: a single-row global aggregate = map-side partial agg
  * into a 1-row shuffle; the payment pivot is conditional aggregation
  * (no pivot shuffle, no second pass).
  */
object Kpis {

  /** A9: one-row KPI summary for a date range, 4-method payment pivot.
    * Reads the cached per-(store, day, method) payment silver relation
    * ([[graft.etl.StoreDaily.paymentDec]]) — decimal partials re-aggregate
    * exactly, so no per-query orders join and identical values. */
  def kpis(spark: SparkSession, dir: String,
           from: String = Defaults.rangeStart,
           to: String = Defaults.rangeEnd): DataFrame = {
    def pay(m: String) =
      sum(when(col("payment_method") === m, col("amt_dec"))
        .otherwise(lit(null))).as(s"pay_${m}_dec")
    graft.etl.StoreDaily.paymentDec(spark, dir)
      .filter(col("sale_date").between(from, to))
      .agg(
        sum(col("gross_dec")).as("sales_dec"),
        sum(col("txn")).as("total_transactions"),
        sum(col("item_count")).as("total_items"),
        pay("cash"), pay("credit"), pay("debit"), pay("gift_card"))
      .select(
        col("sales_dec").cast("double").as("total_sales"),
        col("total_transactions"), col("total_items"),
        (col("sales_dec").cast("double") / col("total_transactions")).as("avg_transaction"),
        col("pay_cash_dec").cast("double").as("payment_cash"),
        col("pay_credit_dec").cast("double").as("payment_credit"),
        col("pay_debit_dec").cast("double").as("payment_debit"),
        col("pay_gift_card_dec").cast("double").as("payment_gift_card"))
  }

  def kpisSql(from: String = Defaults.rangeStart,
              to: String = Defaults.rangeEnd): String =
    s"""WITH sales AS (${Tables.salesWithPaymentSql})
       |SELECT
       |  CAST(SUM(line_total) AS DOUBLE) AS total_sales,
       |  COUNT(*) AS total_transactions,
       |  CAST(SUM(quantity) AS BIGINT) AS total_items,
       |  CAST(SUM(line_total) AS DOUBLE) / COUNT(*) AS avg_transaction,
       |  CAST(SUM(CASE WHEN payment_method = 'cash' THEN line_total - discount_amount END) AS DOUBLE) AS payment_cash,
       |  CAST(SUM(CASE WHEN payment_method = 'credit' THEN line_total - discount_amount END) AS DOUBLE) AS payment_credit,
       |  CAST(SUM(CASE WHEN payment_method = 'debit' THEN line_total - discount_amount END) AS DOUBLE) AS payment_debit,
       |  CAST(SUM(CASE WHEN payment_method = 'gift_card' THEN line_total - discount_amount END) AS DOUBLE) AS payment_gift_card
       |FROM sales
       |WHERE sale_date BETWEEN '$from' AND '$to'""".stripMargin

  /** a23/a24: calendar rollups — company sales by ISO week / month start
    * (the BI layer's date_trunc aggregations over the exported datasets,
    * dashboard-definition.json LINE/BAR widgets). Both engines truncate
    * weeks to Monday. */
  def calendarRollup(spark: SparkSession, dir: String, unit: String): DataFrame =
    graft.etl.StoreDaily.rollupDec(spark, dir)
      .groupBy(date_format(date_trunc(unit, to_date(col("sale_date"))), "yyyy-MM-dd")
        .as("period_start"))
      .agg(
        sum(col("gross_dec")).as("sales_dec"),
        sum(col("transaction_count")).as("total_transactions"),
        countDistinct(col("sale_date")).as("days_with_data"))
      .select(col("period_start"),
        col("sales_dec").cast("double").as("total_sales"),
        col("total_transactions"), col("days_with_data"))
      .orderBy(col("period_start"))

  def calendarRollupSql(unit: String): String =
    s"""WITH sd AS (${graft.etl.StoreDaily.rollupDecSql})
       |SELECT strftime(date_trunc('$unit', CAST(sale_date AS DATE)), '%Y-%m-%d') AS period_start,
       |  CAST(SUM(gross_dec) AS DOUBLE) AS total_sales,
       |  CAST(SUM(transaction_count) AS BIGINT) AS total_transactions,
       |  COUNT(DISTINCT sale_date) AS days_with_data
       |FROM sd
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** a25: target-date resolution — the requested date if it has data,
    * else the latest earlier date, else the overall latest
    * (get-analytics:294-309's fallback chain as one aggregate). */
  def resolveDate(spark: SparkSession, dir: String,
                  requested: String = Defaults.targetDate): DataFrame =
    Tables.sales(spark, dir)
      .select(col("sale_date")).distinct()
      .agg(
        max(when(col("sale_date") <= requested, col("sale_date"))).as("latest_at_or_before"),
        max(col("sale_date")).as("latest_overall"))
      .select(
        lit(requested).as("requested"),
        coalesce(col("latest_at_or_before"), col("latest_overall")).as("resolved_date"))

  def resolveDateSql(requested: String = Defaults.targetDate): String =
    s"""SELECT '$requested' AS requested,
       |  COALESCE(
       |    MAX(CASE WHEN sale_date <= '$requested' THEN sale_date END),
       |    MAX(sale_date)) AS resolved_date
       |FROM (SELECT DISTINCT sale_date FROM (${Tables.salesSql}))""".stripMargin

  /** A18: distinct-date inventory, newest first (get-analytics:80).
    * Reads the cached (store,day) summary — the reference likewise scans
    * its materialized summary rows for this (a GSI1 projection scan), never
    * the raw line items; same distinct result, dimension-sized input. */
  def availableDates(spark: SparkSession, dir: String): DataFrame =
    graft.etl.StoreDaily.rollupDec(spark, dir)
      .select(col("sale_date")).distinct()
      .orderBy(col("sale_date").desc)

  val availableDatesSql: String =
    s"""SELECT DISTINCT sale_date FROM (${Tables.salesSql})
       |ORDER BY sale_date DESC""".stripMargin

  /** a29: RUNNING + MONTH-TO-DATE totals per store — the cumulative
    * views every BI layer puts next to the daily rollup (the reference's
    * dashboards recompute period sums per request; a lakehouse
    * materializes them as window columns over the same silver).
    *
    * Exactness: the running sums fold the DECIMAL silver (rollupDec),
    * so they are order-independent-exact like every other re-aggregation
    * of it; the double cast happens once at the edge. Scale: windows
    * partition by store (MTD: store × month) — dimension-bounded frames
    * riding ONE store_id exchange, embarrassingly parallel across
    * stores; no global running sum anywhere (the p8 discipline). */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = Window.partitionBy(col("store_id")).orderBy(col("sale_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mtd = Window
      .partitionBy(col("store_id"), substring(col("sale_date"), 1, 7))
      .orderBy(col("sale_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.etl.StoreDaily.rollupDec(spark, dir)
      .withColumn("net_dec", col("gross_dec") - col("disc_dec"))
      .select(col("store_id"), col("sale_date"),
        col("net_dec").cast("double").as("day_sales"),
        sum(col("net_dec")).over(cum).cast("double").as("running_sales"),
        sum(col("net_dec")).over(mtd).cast("double").as("mtd_sales"),
        sum(col("transaction_count")).over(cum).as("running_transactions"))
      .orderBy(col("store_id"), col("sale_date"))
  }

  val runningTotalsSql: String =
    s"""WITH r AS (${graft.etl.StoreDaily.rollupDecSql})
       |SELECT store_id, sale_date,
       |  CAST(gross_dec - disc_dec AS DOUBLE) AS day_sales,
       |  CAST(SUM(gross_dec - disc_dec) OVER cum AS DOUBLE) AS running_sales,
       |  CAST(SUM(gross_dec - disc_dec) OVER mtd AS DOUBLE) AS mtd_sales,
       |  CAST(SUM(transaction_count) OVER cum AS BIGINT) AS running_transactions
       |FROM r
       |WINDOW
       |  cum AS (PARTITION BY store_id ORDER BY sale_date
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |  mtd AS (PARTITION BY store_id, substr(sale_date, 1, 7) ORDER BY sale_date
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY store_id, sale_date""".stripMargin

  /** a33: ROLLUP / grouping-sets aggregation — the (store × month)
    * revenue cube with subtotal rows at every level (per store-month,
    * per store, grand total), the multidimensional shape BI tools
    * drill through. Spark's `rollup` plans ONE pass with an Expand
    * (each input row fans to its grouping sets map-side, partials
    * combine per set) — never one job per level. Subtotal keys render
    * as 'ALL' (the natural keys are never null here, so COALESCE is
    * unambiguous and engine-portable — no grouping_id() dialect
    * dependence). Money stays DECIMAL until the final double cast. */
  def rollupCube(spark: SparkSession, dir: String): DataFrame =
    StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), substring(col("sale_date"), 1, 7).as("month"),
        col("gross_dec"), col("transaction_count"))
      .rollup(col("store_id"), col("month"))
      .agg(sum(col("gross_dec")).as("gross"),
        sum(col("transaction_count")).as("n_tx"),
        count(lit(1)).as("n_cells"))
      .select(
        coalesce(col("store_id"), lit("ALL")).as("store_level"),
        coalesce(col("month"), lit("ALL")).as("month_level"),
        col("gross").cast("double").as("total_sales"),
        col("n_tx"), col("n_cells"))
      .orderBy("store_level", "month_level")

  val rollupCubeSql: String =
    s"""WITH sd AS (${StoreDaily.rollupDecSql})
       |SELECT
       |  COALESCE(store_id, 'ALL') AS store_level,
       |  COALESCE(substr(sale_date, 1, 7), 'ALL') AS month_level,
       |  CAST(SUM(gross_dec) AS DOUBLE) AS total_sales,
       |  CAST(SUM(transaction_count) AS BIGINT) AS n_tx,
       |  CAST(COUNT(*) AS BIGINT) AS n_cells
       |FROM sd
       |GROUP BY ROLLUP(store_id, substr(sale_date, 1, 7))
       |ORDER BY store_level, month_level""".stripMargin

  /** a63: full CUBE + grouping_id() — the (store × payment) revenue
    * cube with ALL FOUR margins (cell, per-store, per-payment, grand),
    * including the payment-only margin a ROLLUP (a33) structurally
    * cannot produce, plus the grouping_id() bit vector itself so the
    * Spark↔DuckDB set-encoding (store = high bit) is hash-certified
    * rather than assumed. Scale shape: the cube reads the memoized
    * payment silver (the orders join paid once corpus-wide, the a2/a6
    * discipline), re-aggregates it to the dimension-bounded
    * (store, payment) grain, and only then lets the CUBE's 4-way
    * Expand run — cubing the raw fact would quadruple the shuffle
    * input for identical output (Expand fans every input row to each
    * grouping set). Decimal partials re-aggregate exactly, so the
    * silver hop changes no value. */
  def cubeMargins(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.etl.StoreDaily.paymentDec(spark, dir)
      .groupBy(col("store_id"), col("payment_method"))
      .agg(sum(col("gross_dec")).as("gross_dec"),
        sum(col("txn")).as("n_lines"))
    base.cube(col("store_id"), col("payment_method"))
      .agg(sum(col("gross_dec")).as("gross"),
        sum(col("n_lines")).as("n_lines_sum"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("store_id"), lit("ALL")).as("store_level"),
        coalesce(col("payment_method"), lit("ALL")).as("payment_level"),
        col("gid").cast("long").as("gid"),
        col("gross").cast("double").as("total_sales"),
        col("n_lines_sum").as("n_lines"))
      .orderBy("gid", "store_level", "payment_level")
  }

  val cubeMarginsSql: String =
    s"""WITH sp AS (${Tables.salesWithPaymentSql}),
       |base AS (
       |  SELECT store_id, payment_method, SUM(line_total) AS gross_dec,
       |    CAST(COUNT(*) AS BIGINT) AS n_lines
       |  FROM sp GROUP BY 1, 2)
       |SELECT
       |  COALESCE(store_id, 'ALL') AS store_level,
       |  COALESCE(payment_method, 'ALL') AS payment_level,
       |  CAST(GROUPING_ID(store_id, payment_method) AS BIGINT) AS gid,
       |  CAST(SUM(gross_dec) AS DOUBLE) AS total_sales,
       |  CAST(SUM(n_lines) AS BIGINT) AS n_lines
       |FROM base
       |GROUP BY CUBE (store_id, payment_method)
       |ORDER BY gid, store_level, payment_level""".stripMargin

  /** a31: MARKET-BASKET AFFINITY — sku co-occurrence with support and
    * lift over order baskets (l_orderkey groups), the association-rule
    * primitive behind "frequently bought together". The pair generator
    * is a self-join on the ORDER key, so the blow-up is bounded by
    * basket size squared (TPC-H baskets are ≤ 7 lines), never by the
    * catalog — the same never-all-pairs discipline as the dedup
    * family. Lift = P(a,b)/(P(a)P(b)) = pair_n·n_orders / (n_a·n_b),
    * exact integers into one IEEE division each (and n_orders is a
    * 1-row broadcast). Top 50 pairs by (count, pair) via
    * TakeOrderedAndProject — per-partition partial top-k + a 50-row
    * driver merge, no global sort at any scale. */
  def basketAffinity(spark: SparkSession, dir: String,
                     topN: Int = 50): DataFrame = {
    // the basket and co-pair relations are the graph family's memoized
    // silvers (definitionally identical: distinct (order, sku) and
    // sa < sb co-occurrence counts) — one session-priced co-purchase
    // table serves g1/g2/g3 and this key instead of a31 rebuilding the
    // self-join + pair aggregate per call
    val baskets = Graph.baskets(spark, dir)
    val nOrders = baskets.select(col("order_id")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemN = baskets.groupBy(col("sku")).agg(count(lit(1)).as("n_item"))
    val pairs = Graph.coPairs(spark, dir)
      .select(col("sa").as("sku_a"), col("sb").as("sku_b"),
        col("c").as("pair_n"))
    // top-k FIRST, decorate after: the k rows are decided by (pair_n,
    // pair) alone, so joining the support counts before the cut paid
    // two pair-relation-sized joins for rows that were about to be
    // dropped (the r10 sf1.0 section measured it at 17x slope —
    // co-pair cardinality grows much faster than the catalog)
    pairs
      .orderBy(col("pair_n").desc, col("sku_a").asc, col("sku_b").asc)
      .limit(topN)
      .join(itemN.select(col("sku").as("sku_a"), col("n_item").as("n_a")),
        Seq("sku_a"))
      .join(itemN.select(col("sku").as("sku_b"), col("n_item").as("n_b")),
        Seq("sku_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("sku_a"), col("sku_b"), col("pair_n"), col("n_a"),
        col("n_b"), col("n_orders"),
        ((col("pair_n") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"),
        (col("pair_n").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"))
      .orderBy(col("pair_n").desc, col("sku_a").asc, col("sku_b").asc)
  }

  def basketAffinitySql(topN: Int = 50): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS order_id, l_partkey AS sku
       |  FROM lineitem),
       |orders AS (SELECT COUNT(DISTINCT order_id) AS n_orders FROM baskets),
       |items AS (
       |  SELECT sku, CAST(COUNT(*) AS BIGINT) AS n_item
       |  FROM baskets GROUP BY 1),
       |pairs AS (
       |  SELECT a.sku AS sku_a, b.sku AS sku_b,
       |    CAST(COUNT(*) AS BIGINT) AS pair_n
       |  FROM baskets a JOIN baskets b
       |    ON a.order_id = b.order_id AND a.sku < b.sku
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT * FROM pairs
       |  ORDER BY pair_n DESC, sku_a ASC, sku_b ASC LIMIT $topN)
       |SELECT t.sku_a, t.sku_b, t.pair_n,
       |  ia.n_item AS n_a, ib.n_item AS n_b,
       |  CAST(o.n_orders AS BIGINT) AS n_orders,
       |  CAST(t.pair_n * o.n_orders AS DOUBLE)
       |    / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift,
       |  CAST(t.pair_n AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS conf_a_to_b
       |FROM top t
       |JOIN items ia ON ia.sku = t.sku_a
       |JOIN items ib ON ib.sku = t.sku_b
       |CROSS JOIN orders o
       |ORDER BY t.pair_n DESC, t.sku_a ASC, t.sku_b ASC""".stripMargin

  /** a34: EXACT per-store percentiles of daily net sales — the certified
    * twin of sk1's `percentile_approx`, defined POSITIONALLY so both
    * engines agree bit-for-bit: p_q is the value at row ceil(q·n) of the
    * (net, date)-ordered per-store series — no interpolation, no
    * engine-specific quantile semantics (Spark's `percentile` and
    * DuckDB's `quantile_cont` interpolate differently; a rank lookup
    * cannot disagree). The date tiebreak makes equal-value days a total
    * order, so the picked row is unique.
    *
    * Scale shape: ONE store-partitioned window (rows per group bounded
    * by the calendar, the a29 argument) and the rank-hit pick rides the
    * same exchange as a conditional agg — no global sort, no second
    * pass. At 100 TB with unbounded groups this swaps for sk1's
    * fixed-size KLL/GK sketch; a34 is the exactness anchor that bounds
    * that sketch's error, the same certifier contract as sk3/sk4. */
  def exactPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byStore = Window.partitionBy(col("store_id"))
    val ordered = byStore.orderBy(col("net_dec"), col("sale_date"))
    graft.etl.StoreDaily.rollupDec(spark, dir)
      .withColumn("net_dec", col("gross_dec") - col("disc_dec"))
      .select(col("store_id"), col("sale_date"), col("net_dec"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byStore))
      .groupBy(col("store_id"))
      .agg(max(col("n")).as("n_days"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("net_dec")))
          .cast("double").as("p50_sales"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("net_dec")))
          .cast("double").as("p90_sales"),
        max(col("net_dec")).cast("double").as("max_sales"))
      .orderBy(col("store_id"))
  }

  val exactPercentilesSql: String =
    s"""WITH r AS (${graft.etl.StoreDaily.rollupDecSql}),
       |ranked AS (
       |  SELECT store_id, gross_dec - disc_dec AS net_dec,
       |    ROW_NUMBER() OVER (PARTITION BY store_id
       |      ORDER BY gross_dec - disc_dec, sale_date) AS rn,
       |    COUNT(*) OVER (PARTITION BY store_id) AS n
       |  FROM r)
       |SELECT store_id,
       |  CAST(MAX(n) AS BIGINT) AS n_days,
       |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN net_dec END) AS DOUBLE) AS p50_sales,
       |  CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN net_dec END) AS DOUBLE) AS p90_sales,
       |  CAST(MAX(net_dec) AS DOUBLE) AS max_sales
       |FROM ranked GROUP BY store_id ORDER BY store_id""".stripMargin

  /** a35: CUSTOMER RFM SEGMENTATION — the classic lifecycle cut every
    * CRM/marketing pipeline runs: per customer, Recency (days from
    * their last order to the corpus high-water date), Frequency
    * (order count) and Monetary value (exact cents), each banded to a
    * 1..4 score by FIXED integer milestones and combined into the RFM
    * code and a named segment. Fixed thresholds — not per-run
    * quantiles — on purpose: scores stay comparable across runs and
    * partitions (the p7/p13 determinism rule applied to scoring), and
    * the banding becomes a pure map over the per-customer aggregate:
    * ONE custkey hash agg + a broadcast 1-row high-water date, no
    * rank window over the customer base. Segment rubric (first match
    * wins): champion (r4, f≥3, m≥3), loyal (f≥3), big_spender (m≥3),
    * at_risk (r≤2, f≥2), dormant (r=1), casual. */
  def customerRfm(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        col("o_totalprice").cast(Tables.Money).as("price_dec"))
    val hiWater = orders.agg(max(col("d")).as("hi"))
    val base = orders.groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_d"),
        count(lit(1)).as("frequency"),
        (sum(col("price_dec")) * 100).cast("long").as("monetary_cents"))
      .crossJoin(broadcast(hiWater))
      .select(col("o_custkey").as("custkey"),
        datediff(col("hi"), col("last_d")).cast("long").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    base
      .withColumn("r_score",
        when(col("recency_days") <= 90, 4L).when(col("recency_days") <= 180, 3L)
          .when(col("recency_days") <= 365, 2L).otherwise(1L))
      .withColumn("f_score",
        when(col("frequency") >= 12, 4L).when(col("frequency") >= 10, 3L)
          .when(col("frequency") >= 8, 2L).otherwise(1L))
      .withColumn("m_score",
        when(col("monetary_cents") >= 300000000L, 4L)
          .when(col("monetary_cents") >= 240000000L, 3L)
          .when(col("monetary_cents") >= 180000000L, 2L).otherwise(1L))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .withColumn("segment",
        when(col("r_score") === 4 && col("f_score") >= 3 && col("m_score") >= 3,
          "champion")
          .when(col("f_score") >= 3, "loyal")
          .when(col("m_score") >= 3, "big_spender")
          .when(col("r_score") <= 2 && col("f_score") >= 2, "at_risk")
          .when(col("r_score") === 1, "dormant")
          .otherwise("casual"))
      .orderBy(col("custkey"))
  }

  val customerRfmSql: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
      |  FROM orders),
      |base AS (
      |  SELECT o_custkey AS custkey,
      |    date_diff('day', MAX(d), (SELECT MAX(d) FROM o)) AS recency_days,
      |    CAST(COUNT(*) AS BIGINT) AS frequency,
      |    CAST(SUM(price_dec) * 100 AS BIGINT) AS monetary_cents
      |  FROM o GROUP BY o_custkey),
      |scored AS (
      |  SELECT *,
      |    CASE WHEN recency_days <= 90 THEN 4 WHEN recency_days <= 180 THEN 3
      |      WHEN recency_days <= 365 THEN 2 ELSE 1 END AS r_score,
      |    CASE WHEN frequency >= 12 THEN 4 WHEN frequency >= 10 THEN 3
      |      WHEN frequency >= 8 THEN 2 ELSE 1 END AS f_score,
      |    CASE WHEN monetary_cents >= 300000000 THEN 4
      |      WHEN monetary_cents >= 240000000 THEN 3
      |      WHEN monetary_cents >= 180000000 THEN 2 ELSE 1 END AS m_score
      |  FROM base)
      |SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
      |  frequency, monetary_cents,
      |  CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm,
      |  CASE WHEN r_score = 4 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
      |    WHEN f_score >= 3 THEN 'loyal'
      |    WHEN m_score >= 3 THEN 'big_spender'
      |    WHEN r_score <= 2 AND f_score >= 2 THEN 'at_risk'
      |    WHEN r_score = 1 THEN 'dormant'
      |    ELSE 'casual' END AS segment
      |FROM scored ORDER BY custkey""".stripMargin

  /** a40: INTER-PURCHASE gap histogram — days between a customer's
    * consecutive orders, bucketed exact through 8 days then by
    * power-of-two floor (t19's spectrum rule: the buckets where
    * reorder-cycle decisions live stay exact, the tail stays
    * log-bounded at any history length). The lag rides ONE custkey
    * exchange (each customer's orders are a bounded group); the
    * bucket rollup is ≤64 rows. Same-day repeat orders land in
    * bucket 0. Deterministic tie-break: orders sort by (day,
    * o_orderkey) within the customer. */
  def interpurchaseGaps(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        col("o_orderkey"))
      .withColumn("prev_d", lag(col("d"), 1).over(byCust))
      .where(col("prev_d").isNotNull)
      .select(col("o_custkey"),
        datediff(col("d"), col("prev_d")).cast("long").as("gap_days"))
    gaps
      .withColumn("bucket",
        when(col("gap_days") <= 8L, col("gap_days"))
          .otherwise(call_function("shiftleft", lit(1L),
            graft.functions.FloorLog2.floorLog2(col("gap_days")).cast("int"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("bucket"))
  }

  val interpurchaseGapsSql: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
      |  FROM orders),
      |gaps AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day',
      |      LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey), d)
      |      AS BIGINT) AS gap_days
      |  FROM o
      |  QUALIFY LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      |    IS NOT NULL)
      |SELECT
      |  CASE WHEN gap_days <= 8 THEN gap_days
      |       ELSE CAST(1 AS BIGINT) << (length(format('{:b}', gap_days)) - 1)
      |  END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
      |FROM gaps GROUP BY 1 ORDER BY bucket""".stripMargin

  /** a38: COHORT REVENUE TRIANGLE over orders — customers grouped by
    * their first-order month (the acquisition cohort), then each
    * cohort's activity rolled per months-since-acquisition: active
    * customers, orders, exact revenue cents. The LTV/retention
    * triangle every growth team reads alongside e7's event retention —
    * this one is purchase-weighted and spans the full order history.
    * Month arithmetic is pure integers (year·12 + month), no interval
    * libm; revenue is DECIMAL summed then cents-cast. Shape: one
    * per-customer min-month agg (map-side combinable), a broadcast-free
    * self-join replaced by a window over the customer's own orders
    * (bounded per customer), then a (cohort, age) rollup — two
    * data-sized exchanges, both on keys a 1000-executor cluster hashes
    * evenly (custkey, then cohort·age ≤ |months|²). */
  def cohortTriangle(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m_idx"),
        col("o_totalprice").cast(Tables.Money).as("price_dec"))
    val byCust = Window.partitionBy(col("o_custkey"))
    o.withColumn("cohort_idx", min(col("m_idx")).over(byCust))
      .groupBy(col("cohort_idx"),
        (col("m_idx") - col("cohort_idx")).as("months_since"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        (sum(col("price_dec")) * 100).cast("long").as("revenue_cents"))
      .select(
        format_string("%04d-%02d", (col("cohort_idx") / lit(12)).cast("int"),
          pmod(col("cohort_idx"), lit(12)).cast("int") + lit(1))
          .as("cohort_month"),
        col("months_since"), col("n_customers"), col("n_orders"),
        col("revenue_cents"))
      .orderBy(col("cohort_month"), col("months_since"))
  }

  /** a39: NEW-vs-REPEAT revenue split per order day — the growth
    * decomposition finance reads next to a38's cohort triangle: how
    * much of each day's bookings came from first-ever customers vs
    * returning ones. A customer's first day is a min over their own
    * orders (bounded per custkey, rides ONE custkey exchange); the
    * day rollup is calendar-bounded. Conditional distincts via
    * NULL-ignoring COUNT(DISTINCT CASE ...) — identical semantics in
    * both engines; revenue stays exact DECIMAL until the cents cast. */
  def newVsRepeat(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_totalprice").cast(Tables.Money).as("price_dec"))
    val byCust = Window.partitionBy(col("o_custkey"))
    o.withColumn("first_d", min(col("d")).over(byCust))
      .withColumn("is_new", col("d") === col("first_d"))
      .groupBy(col("d"))
      .agg(
        countDistinct(when(col("is_new"), col("o_custkey"))).as("new_customers"),
        countDistinct(when(!col("is_new"), col("o_custkey"))).as("repeat_customers"),
        (sum(when(col("is_new"), col("price_dec")).otherwise(lit(0).cast(Tables.Money))) * 100)
          .cast("long").as("new_revenue_cents"),
        (sum(when(!col("is_new"), col("price_dec")).otherwise(lit(0).cast(Tables.Money))) * 100)
          .cast("long").as("repeat_revenue_cents"))
      .orderBy(col("d"))
  }

  val newVsRepeatSql: String =
    """WITH o AS (
      |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
      |  FROM orders),
      |f AS (
      |  SELECT *, d = MIN(d) OVER (PARTITION BY o_custkey) AS is_new
      |  FROM o)
      |SELECT d,
      |  CAST(COUNT(DISTINCT CASE WHEN is_new THEN o_custkey END) AS BIGINT)
      |    AS new_customers,
      |  CAST(COUNT(DISTINCT CASE WHEN NOT is_new THEN o_custkey END) AS BIGINT)
      |    AS repeat_customers,
      |  CAST(SUM(CASE WHEN is_new THEN price_dec
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
      |    AS new_revenue_cents,
      |  CAST(SUM(CASE WHEN NOT is_new THEN price_dec
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
      |    AS repeat_revenue_cents
      |FROM f GROUP BY d ORDER BY d""".stripMargin

  val cohortTriangleSql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS m_idx,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
      |  FROM orders),
      |c AS (
      |  SELECT o_custkey, m_idx, price_dec,
      |    MIN(m_idx) OVER (PARTITION BY o_custkey) AS cohort_idx
      |  FROM o),
      |tri AS (
      |  SELECT cohort_idx, m_idx - cohort_idx AS months_since,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(price_dec) * 100 AS BIGINT) AS revenue_cents
      |  FROM c GROUP BY 1, 2)
      |SELECT printf('%04d-%02d', CAST(cohort_idx // 12 AS INTEGER),
      |    CAST(cohort_idx % 12 AS INTEGER) + 1) AS cohort_month,
      |  months_since, n_customers, n_orders, revenue_cents
      |FROM tri ORDER BY cohort_month, months_since""".stripMargin

  /** a46: CUSTOMER-VALUE DECILES — the lifetime-value decile summary
    * every growth team keeps (bucket floors/ceilings, head-vs-tail
    * revenue concentration). Semantically this is `ntile(10)` over
    * per-customer revenue — but a bare `ntile().over(orderBy(...))`
    * window moves EVERY customer into one partition, so the rank
    * rides [[graft.plans.GlobalRank.withRowNumber]] instead
    * (range-repartition + per-partition offsets: the distributed
    * global-sort shape, no data-sized single-partition stage) and
    * the bucket falls out of [[graft.plans.GlobalRank.ntileOf]]'s
    * exact integer form of the SQL-standard ntile rule — bit-equal
    * to the builtin (GlobalRankSpec) and to DuckDB's `ntile(10)`
    * (this oracle). The order is made TOTAL (revenue desc, custkey
    * asc) so tie placement is engine-independent. */
  def valueDeciles(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.GlobalRank
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast(Tables.Money)) * 100).cast("long")
        .as("rev_cents"))
    val total = rev.agg(count(lit(1)).as("n_total"))
    GlobalRank.withRowNumber(rev, "rk",
        col("rev_cents").desc, col("o_custkey").asc)
      .crossJoin(broadcast(total))
      .withColumn("decile", GlobalRank.ntileOf(col("rk"), col("n_total"), 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_custs"),
        max(col("rev_cents")).as("ceil_cents"),
        min(col("rev_cents")).as("floor_cents"),
        sum(col("rev_cents")).cast("long").as("total_cents"))
      .orderBy(col("decile"))
  }

  /** a47: TRAILING-28-DAY RANGE-FRAME WINDOW — the one window-frame
    * semantic no other key exercises: a VALUE-based frame
    * (`RANGE BETWEEN 27 PRECEDING AND CURRENT ROW` over the day
    * index), which differs from a ROWS frame exactly when a store has
    * gap days — absent days shrink the trailing sum instead of
    * silently stretching the lookback, which is what a
    * calendar-window KPI means. Rides the shared (store, day) silver
    * (dimension-sized), one store exchange for the windows, exact
    * cents arithmetic. */
  def trailingRange(spark: SparkSession, dir: String,
                    days: Int = 28): DataFrame = {
    val base = graft.etl.StoreDaily.rollupDec(spark, dir)
      .select(col("store_id"), col("sale_date"),
        unix_date(to_date(col("sale_date"))).cast("long").as("day_idx"),
        ((col("gross_dec") - col("disc_dec")) * 100).cast("long")
          .as("net_cents"))
    val w = Window.partitionBy(col("store_id")).orderBy(col("day_idx"))
      .rangeBetween(-(days - 1).toLong, 0L)
    base
      .withColumn("trail_cents", sum(col("net_cents")).over(w).cast("long"))
      .withColumn("n_active_days", count(lit(1)).over(w).cast("long"))
      .select(col("store_id"), col("sale_date"), col("net_cents"),
        col("trail_cents"), col("n_active_days"))
      .orderBy(col("store_id"), col("sale_date"))
  }

  def trailingRangeSql(days: Int = 28): String =
    s"""WITH sd AS (
       |  SELECT store_id, sale_date,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(sale_date AS DATE))
       |      AS BIGINT) AS day_idx,
       |    CAST((SUM(line_total) - SUM(discount_amount)) * 100 AS BIGINT)
       |      AS net_cents
       |  FROM (${graft.model.Tables.salesSql})
       |  GROUP BY store_id, sale_date)
       |SELECT store_id, sale_date, net_cents,
       |  CAST(SUM(net_cents) OVER (PARTITION BY store_id ORDER BY day_idx
       |    RANGE BETWEEN ${days - 1} PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS trail_cents,
       |  CAST(COUNT(*) OVER (PARTITION BY store_id ORDER BY day_idx
       |    RANGE BETWEEN ${days - 1} PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS n_active_days
       |FROM sd
       |ORDER BY store_id, sale_date""".stripMargin

  /** a48: PURCHASE-STREAK ISLANDS — gaps-and-islands on the CALENDAR
    * grid: maximal runs of consecutive active months per customer
    * (the "3-month streak" retention metric). The classic island key
    * `m_idx − row_number()` is constant exactly while months are
    * consecutive (distinct months first, so row_number is the rank on
    * the grid); two bounded per-customer aggregates ride ONE custkey
    * exchange — groups are |months-in-corpus|-bounded (~84), never
    * stream-length. Differs from e17's run-collapse (consecutive
    * WINDOW indices of a same-class flag): here the grid is the
    * calendar and gaps are absent months. */
  def orderStreaks(spark: SparkSession, dir: String): DataFrame = {
    val om = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m_idx"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m_idx"))
    val islands = om
      .withColumn("grp", col("m_idx") - row_number().over(w))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("len"), max(col("m_idx")).as("end_idx"))
    islands.groupBy(col("o_custkey"))
      .agg(sum(col("len")).cast("long").as("n_active_months"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).cast("long").as("longest_streak"),
        max(col("end_idx")).as("last_idx"))
      .select(col("o_custkey"), col("n_active_months"), col("n_streaks"),
        col("longest_streak"),
        format_string("%04d-%02d",
          expr("last_idx div 12"), expr("last_idx % 12 + 1"))
          .as("last_active_month"))
      .orderBy(col("o_custkey"))
  }

  val orderStreaksSql: String =
    """WITH om AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS m_idx
      |  FROM orders),
      |isl AS (
      |  SELECT o_custkey,
      |    m_idx - row_number() OVER (PARTITION BY o_custkey ORDER BY m_idx)
      |      AS grp, m_idx
      |  FROM om),
      |runs AS (
      |  SELECT o_custkey, grp,
      |    CAST(COUNT(*) AS BIGINT) AS len,
      |    MAX(m_idx) AS end_idx
      |  FROM isl GROUP BY 1, 2)
      |SELECT o_custkey,
      |  CAST(SUM(len) AS BIGINT) AS n_active_months,
      |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak,
      |  printf('%04d-%02d', CAST(MAX(end_idx) // 12 AS INTEGER),
      |    CAST(MAX(end_idx) % 12 AS INTEGER) + 1) AS last_active_month
      |FROM runs GROUP BY 1
      |ORDER BY o_custkey""".stripMargin

  val valueDecilesSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS rev_cents
      |  FROM orders GROUP BY 1),
      |rk AS (
      |  SELECT rev_cents,
      |    CAST(ntile(10) OVER (ORDER BY rev_cents DESC, o_custkey)
      |      AS BIGINT) AS decile
      |  FROM rev)
      |SELECT decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_custs,
      |  MAX(rev_cents) AS ceil_cents,
      |  MIN(rev_cents) AS floor_cents,
      |  CAST(SUM(rev_cents) AS BIGINT) AS total_cents
      |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin
}
