package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global row numbering — the scale-safe twin of
  * `row_number().over(Window.orderBy(...))`. The windowed form is
  * correct but Spark executes it by moving EVERY row into a single
  * partition (it even logs "No Partition Defined for Window
  * operation! Moving all data to a single partition" on the way) —
  * fine at test SF, fatal at 100 TB. This helper produces
  * bit-identical numbering with no data-sized single-partition
  * stage, via the two-phase construction every distributed engine
  * uses for global ranks:
  *
  *   1. range-repartition on the (total) order key + sort within
  *      partitions — exactly the shape of Spark's own distributed
  *      `orderBy`, embarrassingly parallel;
  *   2. stamp `monotonically_increasing_id()` AFTER the sort: its
  *      layout is `pid << 33 | rowIndexInPartition`, so it encodes
  *      (partition, local position in sorted order) in one narrow,
  *      shuffle-free projection (Catalyst never reorders the
  *      nondeterministic projection across the sort, and within a
  *      sorted partition the iteration order is deterministic — so
  *      the stamped values are stable under task retry);
  *   3. count rows per partition (a |partitions|-row aggregate — the
  *      ONLY thing that crosses the cluster), prefix-sum those
  *      counts into per-partition offsets (a window over ≤ a few
  *      hundred rows — the one SinglePartition stage, carrying one
  *      row per PARTITION, not per datum), broadcast them back;
  *   4. global rank = offset + local index + 1.
  *
  * CORRECTNESS IS PARTITION-INVARIANT: whatever boundaries the range
  * partitioner samples, ranges are disjoint and ordered, so
  * offset + local position reproduces the unique numbering of any
  * TOTAL order. Callers must pass a tie-free ordering (end with a
  * unique key) — with ties the assignment among equal rows would
  * depend on sampled boundaries. GlobalRankSpec asserts bit-parity
  * with the single-partition window form and that the big relation
  * goes through `rangepartitioning`, not `SinglePartition`. */
object GlobalRank {

  private val LocalBits = 33 // monotonically_increasing_id's layout

  /** Append 1-based global `rankCol` under the total order `order`. */
  def withRowNumber(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "GlobalRank needs an ordering")
    val parts = math.max(
      df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val stamped = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__gr_mid", monotonically_increasing_id())
      .withColumn("__gr_pid", shiftright(col("__gr_mid"), LocalBits))
      .withColumn("__gr_local",
        col("__gr_mid").bitwiseAND(lit((1L << LocalBits) - 1)))
    val offsets = stamped
      .groupBy(col("__gr_pid")).agg(count(lit(1)).as("__gr_n"))
      .withColumn("__gr_offset",
        coalesce(
          sum(col("__gr_n")).over(
            Window.orderBy(col("__gr_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__gr_pid").as("__gr_opid"), col("__gr_offset"))
    stamped
      .join(broadcast(offsets), col("__gr_pid") === col("__gr_opid"))
      .withColumn(rankCol,
        (col("__gr_offset") + col("__gr_local") + lit(1L)).cast("long"))
      .drop("__gr_mid", "__gr_pid", "__gr_local", "__gr_opid", "__gr_offset")
  }

  /** SQL-standard `ntile(buckets)` derived from a 1-based total-order
    * rank `rk` over `n` rows, in EXACT integer arithmetic: with
    * q = n div b and r = n mod b, the first r buckets take q+1 rows
    * and the rest take q (the rule Spark's and DuckDB's `ntile`
    * both implement). Lets a decile ride [[withRowNumber]] instead
    * of a single-partition `ntile` window. */
  def ntileOf(rk: Column, n: Column, buckets: Int): Column = {
    // Catalyst's IntegralDivide via its registered SQL name — exact
    // long division, no double round-trip
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val b = lit(buckets.toLong)
    val q = idiv(n, b)
    val r = n % b
    val cut = r * (q + lit(1L)) // rows covered by the wide buckets
    // q = 0 (n < buckets) keeps every row under `cut`, so the
    // div-by-q branch is never evaluated (CaseWhen is lazy per row)
    when(rk <= cut, idiv(rk - 1, q + lit(1L)) + lit(1L))
      .otherwise(r + idiv(rk - cut - lit(1L), q) + lit(1L))
      .cast("long")
  }
}
