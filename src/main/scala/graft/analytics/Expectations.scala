package graft.analytics

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k18: DATA-QUALITY EXPECTATION SUITE — the declarative check rubric
  * (Deequ / dbt-test class) a lake runs before promoting a load:
  * uniqueness, completeness, domain membership, range conformance and
  * partition continuity, each scored as an exact per-mille metric and
  * judged against a declared threshold. One row per check:
  * (check_id, metric_milli, threshold_milli, ok). The suite includes a
  * deliberately tight expectation (`li_disc_low`, discount <= 0.05 at
  * >= 990 per-mille) so the fixture exercises the FAIL path — a rubric
  * that can't fail verifies nothing. Referential integrity is its own
  * key (k9) and not repeated here.
  *
  * Scale shape: every metric is a conditional aggregate folded in ONE
  * pass over its grain — the row-level checks ride a single-partition
  * conditional agg per table (map-side partials, 1-row output);
  * uniqueness is the key-grain two-phase fold (groupBy key → count,
  * the only row-sized exchange, map-side combinable); continuity is a
  * month-grain fold. Each 1-row metric frame then EXPLODES into its
  * check rows via stack() — one scan per grain, never one per check. */
object Expectations {

  def expectationSuite(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)

    // row-level orders checks: one conditional pass, 3 check rows
    val ordRow = orders.agg(
        count(lit(1)).as("n"),
        count(col("o_custkey")).as("custkey_nonnull"),
        sum(col("o_orderstatus").isin("O", "F", "P").cast("long")).as("status_ok"),
        sum((col("o_totalprice") > 0d).cast("long")).as("total_pos"))
      .selectExpr(
        """stack(3,
          |  'ord_custkey_complete', custkey_nonnull * 1000 DIV n, 1000L,
          |  'ord_status_domain',    status_ok * 1000 DIV n,       1000L,
          |  'ord_total_positive',   total_pos * 1000 DIV n,       1000L
          |) AS (check_id, metric_milli, threshold_milli)""".stripMargin)

    // uniqueness: two-phase key-grain fold (never COUNT(DISTINCT) —
    // the Expand rewrite doubles the shuffle at scale)
    val ordKey = orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n"))
      .selectExpr("'ord_key_unique' AS check_id",
        "n_keys * 1000 DIV n AS metric_milli", "1000L AS threshold_milli")

    // partition continuity: every month in [min, max] has rows
    val ordMonth = orders
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("m"))
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_months"),
        (max(col("m")) - min(col("m")) + 1).as("span"))
      .selectExpr("'ord_month_continuity' AS check_id",
        "CAST(n_months * 1000 DIV span AS BIGINT) AS metric_milli",
        "1000L AS threshold_milli")

    // row-level lineitem checks: one conditional pass, 4 check rows
    // (incl. the deliberately failing tight-discount expectation)
    val liRow = li.agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").between(1d, 50d).cast("long")).as("qty_ok"),
        sum(col("l_discount").between(0d, 0.10).cast("long")).as("disc_ok"),
        sum((col("l_discount") <= 0.05).cast("long")).as("disc_low"),
        sum((col("l_extendedprice") > 0d).cast("long")).as("price_pos"))
      .selectExpr(
        """stack(4,
          |  'li_qty_range',   qty_ok * 1000 DIV n,    1000L,
          |  'li_disc_range',  disc_ok * 1000 DIV n,   1000L,
          |  'li_disc_low',    disc_low * 1000 DIV n,  990L,
          |  'li_price_positive', price_pos * 1000 DIV n, 1000L
          |) AS (check_id, metric_milli, threshold_milli)""".stripMargin)

    ordRow.unionAll(ordKey).unionAll(ordMonth).unionAll(liRow)
      .withColumn("ok", (col("metric_milli") >= col("threshold_milli"))
        .cast("long"))
      .orderBy(col("check_id"))
  }

  def expectationSuiteSql(): String =
    """WITH ord AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(o_custkey) AS BIGINT) AS custkey_nonnull,
      |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS status_ok,
      |    CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS total_pos
      |  FROM orders),
      |ord_key AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(SUM(cnt) AS BIGINT) AS n
      |  FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY 1)),
      |ord_month AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
      |    CAST(MAX(m) - MIN(m) + 1 AS BIGINT) AS span
      |  FROM (SELECT CAST(date_part('year', o_orderdate) * 12
      |          + date_part('month', o_orderdate) AS BIGINT) AS m,
      |          COUNT(*) AS cnt
      |        FROM orders GROUP BY 1)),
      |li AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS qty_ok,
      |    CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.10 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS disc_ok,
      |    CAST(SUM(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS disc_low,
      |    CAST(SUM(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS price_pos
      |  FROM lineitem),
      |checks AS (
      |  SELECT 'ord_custkey_complete' AS check_id,
      |    custkey_nonnull * 1000 // n AS metric_milli,
      |    CAST(1000 AS BIGINT) AS threshold_milli FROM ord
      |  UNION ALL SELECT 'ord_status_domain', status_ok * 1000 // n, 1000 FROM ord
      |  UNION ALL SELECT 'ord_total_positive', total_pos * 1000 // n, 1000 FROM ord
      |  UNION ALL SELECT 'ord_key_unique', n_keys * 1000 // n, 1000 FROM ord_key
      |  UNION ALL SELECT 'ord_month_continuity', n_months * 1000 // span, 1000
      |    FROM ord_month
      |  UNION ALL SELECT 'li_qty_range', qty_ok * 1000 // n, 1000 FROM li
      |  UNION ALL SELECT 'li_disc_range', disc_ok * 1000 // n, 1000 FROM li
      |  UNION ALL SELECT 'li_disc_low', disc_low * 1000 // n, 990 FROM li
      |  UNION ALL SELECT 'li_price_positive', price_pos * 1000 // n, 1000 FROM li)
      |SELECT check_id, CAST(metric_milli AS BIGINT) AS metric_milli,
      |  CAST(threshold_milli AS BIGINT) AS threshold_milli,
      |  CAST(CASE WHEN metric_milli >= threshold_milli THEN 1 ELSE 0 END
      |    AS BIGINT) AS ok
      |FROM checks
      |ORDER BY check_id""".stripMargin

  /** The candidate functional dependencies k20 audits:
    * (fd_id, table, lhs column, rhs column) — a deliberate mix of
    * key-implied FDs that must HOLD and plausible-looking business
    * rules that FAIL on real data (the profiling signal). */
  private val FdCandidates: Seq[(String, String, String, String)] = Seq(
    ("cust_key_nation", "customer", "c_custkey", "c_nationkey"),
    ("cust_nation_segment", "customer", "c_nationkey", "c_mktsegment"),
    ("ord_key_status", "orders", "o_orderkey", "o_orderstatus"),
    ("ord_cust_priority", "orders", "o_custkey", "o_orderpriority"),
    ("li_part_supp", "lineitem", "l_partkey", "l_suppkey"),
    ("supp_key_nation", "supplier", "s_suppkey", "s_nationkey"))

  /** k20: FUNCTIONAL-DEPENDENCY AUDIT — the profiling pass behind
    * normalization and dedup-key decisions (TANE/Metanome class, here
    * on a fixed candidate list — FD *discovery* enumerates lattices,
    * FD *auditing* is one aggregate per candidate): does column A
    * determine column B? For each candidate A→B: distinct A values,
    * how many carry MORE than one distinct B (violations), the worst
    * variant count, the violation rate in milli, and the verdict.
    * Key-implied FDs (custkey→nationkey) must hold; the
    * plausible-looking business rules (nationkey→segment,
    * partkey→suppkey — TPC-H gives every part 4 suppliers) fail,
    * which is the signal a steward actually reads.
    *
    * Scale shape: one (lhs)-keyed count-distinct aggregate per
    * candidate (two-phase, map-side combinable), then a 1-row rollup
    * each — |candidates| rows out, no joins, each table scanned once
    * per FD on only the two audited columns (column pruning makes
    * this a narrow scan at any width). */
  def fdAudit(spark: SparkSession, dir: String): DataFrame = {
    def table(name: String): DataFrame = name match {
      case "customer" => Tables.customer(spark, dir)
      case "orders"   => Tables.orders(spark, dir)
      case "lineitem" => Tables.lineitem(spark, dir)
      case "supplier" => Tables.supplier(spark, dir)
    }
    FdCandidates.map { case (id, t, lhs, rhs) =>
      table(t)
        .groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs_keys"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).cast("long")
            .as("n_violating_keys"),
          max(col("n_rhs")).as("max_rhs_variants"))
        .select(lit(id).as("fd_id"), lit(t).as("table_name"),
          lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs_keys"), col("n_violating_keys"),
          col("max_rhs_variants"),
          expr("n_violating_keys * 1000 DIV n_lhs_keys")
            .as("violation_milli"),
          (col("n_violating_keys") === 0L).as("holds"))
    }.reduceLeft(_.unionByName(_)).orderBy(col("fd_id"))
  }

  def fdAuditSql(): String =
    FdCandidates.map { case (id, t, lhs, rhs) =>
      s"""SELECT '$id' AS fd_id, '$t' AS table_name, '$lhs' AS lhs,
         |  '$rhs' AS rhs,
         |  CAST(COUNT(*) AS BIGINT) AS n_lhs_keys,
         |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating_keys,
         |  CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_variants,
         |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000 // COUNT(*) AS violation_milli,
         |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
         |    AS holds
         |FROM (SELECT $lhs, CAST(COUNT(DISTINCT $rhs) AS BIGINT) AS n_rhs
         |      FROM $t GROUP BY $lhs) g""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) u ORDER BY fd_id")
}
