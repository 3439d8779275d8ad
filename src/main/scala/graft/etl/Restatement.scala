package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k13: LATE-DATA INCREMENTAL RESTATEMENT — incremental view
  * maintenance for the (store, day) rollup silver. A late-arriving
  * fact slice (here: the order feed for `l_orderkey % mod == res`,
  * ~1/mod of all lines, spread across existing partitions) lands
  * AFTER the rollup was materialized; the engine restates by MERGING
  * ALGEBRAIC PARTIALS — rollup(base) ⊕ rollup(delta) joined on the
  * grain key, sums/counts added — never by re-reading the base facts.
  * Output = the restated rollup plus a `restated` flag marking
  * exactly the partitions the late slice touched.
  *
  * Reference analog: process_upload.py re-materializes a day's
  * metrics when a file for that day is re-delivered
  * (overwrite-by-day); this is the algebraic generalization that
  * never re-reads the other days.
  *
  * Scale posture (the reason this key exists): at 100 TB the base
  * rollup is a persisted dimension-sized silver (|stores|×|days|
  * rows — [[StoreDaily.rollupDec]]'s cache stands in for it here);
  * the delta aggregate scans ONLY the late increment; the merge is a
  * full-outer join of two dimension-sized relations. Total cost is
  * O(increment) + O(dimension), independent of the lake size —
  * the property that makes daily maintenance feasible. Every measure
  * here is algebraic (sum/count merge by addition); a non-algebraic
  * measure (distinct customers) would instead merge its SKETCH
  * partials — sk1/sk12's HLL registers OR together — which is why
  * the sketch family is first-class in this engine. The oracle
  * recomputes from the full fact table: merge-equals-recompute IS
  * the correctness contract of incremental maintenance. */
object Restatement {

  def lateRestatement(spark: SparkSession, dir: String,
                      mod: Int = 10, res: Int = 7): DataFrame = {
    // grain keys stay the RAW (suppkey, calendar day): store_id is
    // injective in l_suppkey and sale_date in the day, so grouping raw
    // and formatting the ~53k grain rows is bit-identical while the
    // per-fact-row format_string/date_format projection disappears and
    // the exchange carries 2 narrow keys instead of 2 strings
    // (guide §2.3 — the sk13/k17 discipline)
    val money = col("l_extendedprice").cast(Tables.Money)
    val sales = Tables.lineitem(spark, dir).select(
      col("l_suppkey"),
      to_date(col("l_shipdate")).as("d"),
      money.as("line_total"),
      round(money * col("l_discount").cast(Tables.Money), 2)
        .as("discount_amount"),
      col("l_quantity").cast("long").as("quantity"),
      (pmod(col("l_orderkey"), lit(mod)) === lit(res)).as("late"))
    val isLate = col("late")
    // base and delta partials ride ONE grain aggregate as conditional
    // sums (sum-over-empty-when = NULL, exactly the absent-side NULL the
    // full-outer join produced), so the fact table is scanned once and
    // the dimension-sized merge join disappears; the ⊕-merge itself —
    // coalesce + add of the two partial columns — is unchanged below.
    // At 100 TB the base column set is read from the persisted silver;
    // here both derive from the one scan the oracle also recomputes from.
    val merged = sales
      .groupBy(col("l_suppkey"), col("d"))
      .agg(sum(when(!isLate, col("line_total"))).as("gross_b"),
        sum(when(isLate, col("line_total"))).as("gross_d"),
        sum(when(!isLate, col("discount_amount"))).as("disc_b"),
        sum(when(isLate, col("discount_amount"))).as("disc_d"),
        sum(when(!isLate, 1L)).as("txn_b"),
        sum(when(isLate, 1L)).as("txn_d"),
        sum(when(!isLate, col("quantity"))).as("items_b"),
        sum(when(isLate, col("quantity"))).as("items_d"))
    // decimal partials add exactly (order-independent), so the merged
    // rollup is bit-identical to a from-scratch recompute — the oracle
    // asserts exactly that
    merged
      .select(format_string("%04d", col("l_suppkey")).as("store_id"),
        date_format(col("d"), "yyyy-MM-dd").as("sale_date"),
        (coalesce(col("gross_b"), lit(0).cast(Tables.Money)) +
          coalesce(col("gross_d"), lit(0).cast(Tables.Money)))
          .cast("double").as("gross"),
        (coalesce(col("disc_b"), lit(0).cast(Tables.Money)) +
          coalesce(col("disc_d"), lit(0).cast(Tables.Money)))
          .cast("double").as("disc"),
        (coalesce(col("txn_b"), lit(0L)) + coalesce(col("txn_d"), lit(0L)))
          .as("txn"),
        (coalesce(col("items_b"), lit(0L)) + coalesce(col("items_d"), lit(0L)))
          .as("items"),
        col("txn_d").isNotNull.as("restated"))
      .orderBy(col("store_id"), col("sale_date"))
  }

  def lateRestatementSql(mod: Int = 10, res: Int = 7): String =
    s"""WITH sales AS (${Tables.salesSql}),
       |full_roll AS (
       |  SELECT store_id, sale_date,
       |    SUM(line_total) AS gross_dec,
       |    SUM(discount_amount) AS disc_dec,
       |    CAST(COUNT(*) AS BIGINT) AS txn,
       |    CAST(SUM(quantity) AS BIGINT) AS items
       |  FROM sales GROUP BY 1, 2),
       |touched AS (
       |  SELECT DISTINCT store_id, sale_date
       |  FROM sales WHERE l_orderkey % $mod = $res)
       |SELECT f.store_id, f.sale_date,
       |  CAST(f.gross_dec AS DOUBLE) AS gross,
       |  CAST(f.disc_dec AS DOUBLE) AS disc,
       |  f.txn, f.items,
       |  (t.store_id IS NOT NULL) AS restated
       |FROM full_roll f
       |LEFT JOIN touched t
       |  ON f.store_id = t.store_id AND f.sale_date = t.sale_date
       |ORDER BY f.store_id, f.sale_date""".stripMargin

  /** k14: SKETCH-PARTIAL RESTATEMENT — the non-algebraic companion of
    * [[lateRestatement]]: distinct-SKU-per-(store, day) cannot be
    * restated by adding partial sums, so the maintained silver carries
    * a KMV SKETCH per grain (the k smallest distinct SKU hashes,
    * sk13's bijective affine family) and the late slice merges as
    * sketch-state union: merged = k smallest of (base_k ∪ delta_k).
    * The KMV merge theorem makes this EXACTLY lossless for the union's
    * k-minima — the k smallest of A ∪ B all sit inside A's k smallest
    * or B's k smallest — so, uniquely among cardinality sketches, the
    * DuckDB oracle can recompute the sketch FROM SCRATCH over the full
    * fact table and hash-match the merged estimate bit-for-bit:
    * merge-equals-recompute, k13's contract, now for a sketch.
    *
    * Scale shape: two conditional grain-keyed aggregates off one scan
    * (collect_set is bounded: distinct hashes per store-day ≤ catalog
    * size, and the sketch caps at k immediately after); the merge is a
    * dimension-sized full-outer join + array union; estimates are pure
    * projection. At 100 TB the base sketch column is the persisted
    * silver and only the delta aggregate scans new data. */
  def kmvRestatement(spark: SparkSession, dir: String,
                     k: Int = 64, mod: Int = 10, res: Int = 7): DataFrame = {
    val P = 1000003L
    val isLate = pmod(col("l_orderkey"), lit(mod)) === lit(res)
    // raw (suppkey, day) grain keys for the same reason as
    // [[lateRestatement]]: format on the grain rows, not the fact rows
    val hashed = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), to_date(col("l_shipdate")).as("d"),
        ((col("l_partkey") * lit(131L) + lit(911L)) % P).as("h"),
        isLate.as("late"))
    // both sketch partials ride ONE grain aggregate as conditional
    // collect_sets (collect_set skips the NULLs the when() emits for the
    // other side, and yields [] — the coalesce([]) the join form needed
    // — when a side is absent), so the fact table is scanned once and
    // the dimension-sized full-outer join disappears. The KMV merge
    // itself — k smallest of (base_k ∪ delta_k) — is unchanged below;
    // `restated` keeps its exact old meaning (delta side had rows).
    val partials = hashed
      .groupBy(col("l_suppkey"), col("d"))
      .agg(
        slice(array_sort(collect_set(when(!col("late"), col("h")))), 1, k)
          .as("sk_b"),
        slice(array_sort(collect_set(when(col("late"), col("h")))), 1, k)
          .as("sk_d"))
    partials
      .select(format_string("%04d", col("l_suppkey")).as("store_id"),
        date_format(col("d"), "yyyy-MM-dd").as("sale_date"),
        slice(array_sort(array_union(col("sk_b"), col("sk_d"))), 1, k)
          .as("sk"),
        (size(col("sk_d")) > 0).as("restated"))
      .select(col("store_id"), col("sale_date"),
        size(col("sk")).cast("long").as("sk_size"),
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(s"${(k - 1) * P}L div element_at(sk, $k)"))
          .as("kmv_est"),
        col("restated"))
      .orderBy(col("store_id"), col("sale_date"))
  }

  def kmvRestatementSql(k: Int = 64, mod: Int = 10, res: Int = 7): String = {
    val P = 1000003L
    s"""WITH sales AS (${Tables.salesSql}),
       |pairs AS (
       |  SELECT DISTINCT store_id, sale_date,
       |    (sku * 131 + 911) % $P AS h
       |  FROM sales),
       |ranked AS (
       |  SELECT store_id, sale_date, h,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY store_id, sale_date
       |      ORDER BY h ASC) AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY store_id, sale_date) AS BIGINT)
       |      AS n
       |  FROM pairs),
       |touched AS (
       |  SELECT DISTINCT store_id, sale_date
       |  FROM sales WHERE l_orderkey % $mod = $res)
       |SELECT r.store_id, r.sale_date,
       |  LEAST(r.n, $k) AS sk_size,
       |  CASE WHEN r.n < $k THEN r.n
       |    ELSE (${k - 1}) * $P // r.h END AS kmv_est,
       |  (t.store_id IS NOT NULL) AS restated
       |FROM ranked r
       |LEFT JOIN touched t
       |  ON r.store_id = t.store_id AND r.sale_date = t.sale_date
       |WHERE r.rn = LEAST(r.n, $k)
       |ORDER BY r.store_id, r.sale_date""".stripMargin
  }
}
