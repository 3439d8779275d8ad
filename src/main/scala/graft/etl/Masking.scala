package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k23: PSEUDONYMIZATION + K-ANONYMITY AUDIT — the data-governance
  * pass a lake runs before sharing a customer extract (the structured
  * sibling of t9's free-text PII scrub):
  *
  *  1. FORMAT-PRESERVING masking of the direct identifier: the nine
  *     digits of `c_name` rotate position-wise by offsets drawn from
  *     the house multiplicative hash of the value itself
  *     (d'ᵢ = (dᵢ + ⌊h/10^(i−1)⌋ mod 10) mod 10) — a deterministic PRF
  *     of the value, so equal inputs mask equally (referential
  *     consistency across extracts) while the 'Customer#NNNNNNNNN'
  *     shape survives every downstream parser. A PRF is NOT a cipher:
  *     two values CAN collide, so the audit certifies the observed
  *     collision count instead of assuming zero.
  *  2. GENERALIZATION of the numeric quasi-identifier: `c_acctbal`
  *     coarsens to $500 bands via a sign-explicit FLOOR division of
  *     cents by 50000. Both Spark `DIV` and DuckDB `//` truncate
  *     toward zero, which would make band 0 span (−$500, $500) —
  *     double-width — and merge the ~9% of negative-balance TPC-H
  *     customers with small positive balances; the explicit floor
  *     keeps every band uniformly $500 wide.
  *  3. K-ANONYMITY readout over the released quasi-identifier tuple
  *     (nation, segment, balance band) — Sweeney's k-anonymity: group
  *     sizes, the minimum, and how many ROWS sit in groups below
  *     [[Masking.KAnon]] (the re-identifiable remainder a steward
  *     must suppress or coarsen further).
  *
  * One audit row: customer count, distinct names before/after masking,
  * collisions, masked-format conformance count, quasi-identifier group
  * count, min group size, groups and rows below k, and the suppressed
  * share in milli.
  *
  * Scale shape: masking is a pure map; the audit is one QI-grain
  * aggregate (dimension-sized output) + one 1-row fold; the name
  * distinct counts ride a two-phase key-grain fold (never an Expand).
  * Reference analogue: none ships PII handling — this extends the §2.1
  * ingest/validation family with the governance gate. */
object Masking {

  /** k-anonymity threshold for the audit verdict columns. */
  val KAnon = 5L

  /** The masked nine-digit block of one `Customer#NNNNNNNNN` name. */
  private def maskedDigits(num: Column): Column = {
    val v = num.cast("long")
    val h = (v * 2654435761L) % 1000000007L
    val digits = (1 to 9).map { i =>
      val d = substring(num, i, 1).cast("int")
      val o = (h / math.pow(10, i - 1).toLong).cast("long") % 10
      ((d + o) % 10).cast("string")
    }
    concat(digits: _*)
  }

  private def maskedDigitsSql(num: String): String = {
    val h = s"((CAST($num AS BIGINT) * 2654435761) % 1000000007)"
    val digits = (1 to 9).map { i =>
      val o = s"(($h // ${math.pow(10, i - 1).toLong}) % 10)"
      s"CAST((CAST(substr($num, $i, 1) AS INTEGER) + $o) % 10 AS VARCHAR)"
    }
    digits.mkString("(", " || ", ")")
  }

  def anonymizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
      substring(col("c_name"), 10, 9).as("num"),
      (col("c_acctbal").cast(Tables.Money) * 100).cast("long").as("bal_c"))
    val masked = c
      .withColumn("masked_name",
        concat(lit("Customer#"), maskedDigits(col("num"))))
      .withColumn("band", expr(
        "CASE WHEN bal_c >= 0 THEN bal_c DIV 50000 " +
          "ELSE -((-bal_c + 49999) DIV 50000) END"))
    val names = masked
      .select(col("num"), col("masked_name"))
      .groupBy(col("num")).agg(min(col("masked_name")).as("m"))
      .agg(count(lit(1)).as("distinct_before"),
        countDistinct(col("m")).as("distinct_after"),
        sum(when(col("m").rlike("^Customer#[0-9]{9}$"), 0L)
          .otherwise(1L)).as("format_violations"))
    val qi = masked.groupBy(col("c_nationkey"), col("c_mktsegment"),
        col("band"))
      .agg(count(lit(1)).as("gn"))
      .agg(count(lit(1)).as("n_qi_groups"),
        min(col("gn")).as("min_group_size"),
        sum(when(col("gn") < KAnon, 1L).otherwise(0L)).as("groups_lt_k"),
        coalesce(sum(when(col("gn") < KAnon, col("gn"))), lit(0L))
          .as("rows_lt_k"),
        sum(col("gn")).as("n_customers"))
    qi.crossJoin(broadcast(names))
      .select(col("n_customers"), col("distinct_before"),
        col("distinct_after"),
        (col("distinct_before") - col("distinct_after")).as("collisions"),
        col("format_violations"),
        col("n_qi_groups"), col("min_group_size"), col("groups_lt_k"),
        col("rows_lt_k"),
        expr("CASE WHEN n_customers = 0 THEN NULL " +
          "ELSE rows_lt_k * 1000 DIV n_customers END")
          .as("suppress_share_milli"))
  }

  def anonymizeAuditSql(): String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey, c_mktsegment,
       |    substr(c_name, 10, 9) AS num,
       |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
       |  FROM customer),
       |masked AS (
       |  SELECT *, 'Customer#' || ${maskedDigitsSql("num")} AS masked_name,
       |    CASE WHEN bal_c >= 0 THEN bal_c // 50000
       |      ELSE -((-bal_c + 49999) // 50000) END AS band
       |  FROM c),
       |names AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS distinct_before,
       |    CAST(COUNT(DISTINCT m) AS BIGINT) AS distinct_after,
       |    CAST(SUM(CASE WHEN regexp_matches(m, '^Customer#[0-9]{9}$$')
       |      THEN 0 ELSE 1 END) AS BIGINT) AS format_violations
       |  FROM (SELECT num, MIN(masked_name) AS m FROM masked GROUP BY 1) q),
       |qi AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_qi_groups,
       |    CAST(MIN(gn) AS BIGINT) AS min_group_size,
       |    CAST(SUM(CASE WHEN gn < $KAnon THEN 1 ELSE 0 END) AS BIGINT)
       |      AS groups_lt_k,
       |    CAST(COALESCE(SUM(CASE WHEN gn < $KAnon THEN gn END), 0)
       |      AS BIGINT) AS rows_lt_k,
       |    CAST(SUM(gn) AS BIGINT) AS n_customers
       |  FROM (SELECT c_nationkey, c_mktsegment, band,
       |          CAST(COUNT(*) AS BIGINT) AS gn
       |        FROM masked GROUP BY 1, 2, 3) g)
       |SELECT n_customers, distinct_before, distinct_after,
       |  distinct_before - distinct_after AS collisions, format_violations,
       |  n_qi_groups, min_group_size, groups_lt_k, rows_lt_k,
       |  CASE WHEN n_customers = 0 THEN NULL
       |    ELSE rows_lt_k * 1000 // n_customers END AS suppress_share_milli
       |FROM qi CROSS JOIN names""".stripMargin
}
