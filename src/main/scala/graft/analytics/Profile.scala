package graft.analytics

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational table diagnostics — the profiling passes an engineer (or a
  * cost-based optimizer) runs BEFORE committing a 100 TB job to a join
  * strategy: join-key skew profiling (k2) and per-column ANALYZE-style
  * statistics (x9). The reference pipeline has no explicit analogue —
  * its data volumes never need one — but any user pointing this engine
  * at a lake will; these are the first-class versions of the checks the
  * repo's own scaladoc performs by hand (salting arguments in
  * CorpusPrep, broadcast-side arguments in Dedup).
  */
object Profile {

  /** k2: JOIN-KEY SKEW PROFILE over lineitem's three join keys — the
    * numbers that decide a shuffle-join strategy: rows, distinct keys,
    * the heaviest key's count, mean key size (milli-precision integer),
    * the max/mean skew ratio, and a salt hint = ceil(max/mean) — the
    * bucket count that equalizes the heaviest key group to the mean
    * (the factor the salting trick in CorpusPrep's scaladoc assumes,
    * and what AQE's skew-join split discovers at runtime; profiling it
    * up front is how you pick bucketing/salting BEFORE paying a failed
    * stage at 100 TB).
    *
    * Shape: one stack() fan-out (map-side, no shuffle) so all three key
    * columns profile in a single scan, then a (key_col, key_val) count
    * — map-side-combinable, ONE data-sized exchange — and a 3-row
    * rollup riding on top. All-integer arithmetic; no sorts. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .selectExpr("stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, " +
        "'l_suppkey', l_suppkey) AS (key_col, key_val)")
      .groupBy("key_col", "key_val").agg(count(lit(1)).as("c"))
      .groupBy("key_col").agg(
        sum("c").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("c").as("max_count"))
      .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_count"),
        expr("n_rows * 1000 div n_keys").as("mean_milli"),
        expr("max_count * n_keys * 1000 div n_rows").as("skew_ratio_milli"),
        expr("(max_count * n_keys + n_rows - 1) div n_rows").as("salt_hint"))
      .orderBy("key_col")

  val skewProfileSql: String =
    """WITH kv AS (
      |  SELECT 'l_orderkey' AS key_col, l_orderkey AS key_val FROM lineitem
      |  UNION ALL
      |  SELECT 'l_partkey' AS key_col, l_partkey AS key_val FROM lineitem
      |  UNION ALL
      |  SELECT 'l_suppkey' AS key_col, l_suppkey AS key_val FROM lineitem),
      |per_key AS (
      |  SELECT key_col, key_val, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM kv GROUP BY 1, 2),
      |rolled AS (
      |  SELECT key_col,
      |    CAST(SUM(c) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(MAX(c) AS BIGINT) AS max_count
      |  FROM per_key GROUP BY key_col)
      |SELECT key_col, n_rows, n_keys, max_count,
      |  n_rows * 1000 // n_keys AS mean_milli,
      |  max_count * n_keys * 1000 // n_rows AS skew_ratio_milli,
      |  (max_count * n_keys + n_rows - 1) // n_rows AS salt_hint
      |FROM rolled ORDER BY key_col""".stripMargin
}
