package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k16: RIGHT-TO-BE-FORGOTTEN PURGE AUDIT — the planning readout every
  * lake runs before a GDPR/CCPA delete wave: given a deletion cohort
  * (here the deterministic custkey % 97 == 0 sample), how many rows
  * must leave each table, how many physical partitions the rewrite
  * touches, and the WRITE AMPLIFICATION (rows that must be rewritten
  * per row actually deleted — copy-on-write lakes rewrite whole files,
  * so a scattered cohort is vastly more expensive than its row count
  * suggests). Partition proxy = the ingest lake's (month, store)
  * grain for lineitem and order-month for orders ([[graft.ingest
  * .Ingest]] writes year/month/day/store; month × store is the
  * judged-stable prefix at every tested SF).
  *
  * One row per table: rows, purged rows, purge per-mille, partitions,
  * touched partitions, amplification per-mille.
  *
  * Scale shape: the cohort predicate is a pure map on orders (no
  * customer join — o_custkey carries the key); lineitem membership is
  * one orderkey-keyed semi-join decoration (hash, co-keyed, row-sized);
  * each table then folds ONCE into its partition grain (conditional
  * sums — purged and total counted in the same pass, never two scans)
  * and the readout aggregates the partition-grain relation. Nothing
  * wider than the partition dimension ever leaves an executor. */
object Purge {

  def purgeAudit(spark: SparkSession, dir: String, mod: Long = 97L): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("part_month"))
      .withColumn("purge", (pmod(col("o_custkey"), lit(mod)) === 0L).cast("long"))
    val oParts = orders.groupBy(col("part_month"))
      .agg(count(lit(1)).as("n_rows"), sum(col("purge")).as("n_purged"))
    val li = Tables.sales(spark, dir)
      .select(col("l_orderkey"), col("store_id"),
        substring(col("sale_date"), 1, 7).as("part_month"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("purge")),
        Seq("l_orderkey"))
    val lParts = li.groupBy(col("part_month"), col("store_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("purge")).as("n_purged"))
    def readout(name: String, parts: DataFrame): DataFrame =
      parts.agg(
        lit(name).as("table_name"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_purged")).as("n_purged"),
        expr("SUM(n_purged) * 1000 DIV SUM(n_rows)").as("purge_pct_milli"),
        count(lit(1)).as("n_parts"),
        expr("CAST(SUM(CASE WHEN n_purged > 0 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_parts_touched"),
        expr("SUM(CASE WHEN n_purged > 0 THEN n_rows ELSE 0 END) * 1000" +
          " DIV GREATEST(1, SUM(n_purged))").as("amplification_milli"))
    readout("orders", oParts)
      .unionAll(readout("lineitem", lParts))
      .orderBy(col("table_name"))
  }

  def purgeAuditSql(mod: Long = 97L): String =
    s"""WITH o AS (
       |  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS part_month,
       |    CASE WHEN o_custkey % $mod = 0 THEN 1 ELSE 0 END AS purge
       |  FROM orders),
       |o_parts AS (
       |  SELECT part_month, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(purge) AS BIGINT) AS n_purged
       |  FROM o GROUP BY 1),
       |s AS (${Tables.salesSql}),
       |l_parts AS (
       |  SELECT substring(s.sale_date, 1, 7) AS part_month, s.store_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(o.purge) AS BIGINT) AS n_purged
       |  FROM s JOIN o ON s.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2),
       |ro AS (
       |  SELECT 'orders' AS table_name, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       |    CAST(SUM(n_purged) AS BIGINT) AS n_purged,
       |    CAST(SUM(n_purged) AS BIGINT) * 1000 // CAST(SUM(n_rows) AS BIGINT)
       |      AS purge_pct_milli,
       |    CAST(COUNT(*) AS BIGINT) AS n_parts,
       |    CAST(SUM(CASE WHEN n_purged > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_parts_touched,
       |    CAST(SUM(CASE WHEN n_purged > 0 THEN n_rows ELSE 0 END) AS BIGINT)
       |      * 1000 // GREATEST(1, CAST(SUM(n_purged) AS BIGINT))
       |      AS amplification_milli
       |  FROM o_parts),
       |rl AS (
       |  SELECT 'lineitem', CAST(SUM(n_rows) AS BIGINT),
       |    CAST(SUM(n_purged) AS BIGINT),
       |    CAST(SUM(n_purged) AS BIGINT) * 1000 // CAST(SUM(n_rows) AS BIGINT),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(CASE WHEN n_purged > 0 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN n_purged > 0 THEN n_rows ELSE 0 END) AS BIGINT)
       |      * 1000 // GREATEST(1, CAST(SUM(n_purged) AS BIGINT))
       |  FROM l_parts)
       |SELECT * FROM ro UNION ALL SELECT * FROM rl
       |ORDER BY table_name""".stripMargin
}
