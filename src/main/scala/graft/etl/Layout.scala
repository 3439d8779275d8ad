package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k15: Z-ORDER LAYOUT vs LINEAR CLUSTERING — the data-skipping readout
  * behind every lakehouse OPTIMIZE ZORDER BY: interleaving the bits of
  * two filter dimensions gives every file a tight min/max box in BOTH,
  * so a rectangle predicate prunes multiplicatively; lexicographic
  * (sku, supp) clustering prunes only its leading column. The key lays
  * the fact rows out both ways — file = rank DIV rowsPerFile under each
  * total order — computes each file's (sku, supp) min/max footer stats,
  * and reads off how many files the SAME rectangle query must touch
  * under each layout. One output row per layout: files, touched files,
  * touched per-mille, selected rows (identical across layouts — layout
  * changes I/O, never results).
  *
  * Exactness: each dimension is min-max scaled to a common 10-bit
  * budget in exact integer arithmetic (unequal bit-widths would
  * degenerate z to leading-column order), the z-value is pure 64-bit
  * bit-twiddling, file stats are integer min/max, the overlap test
  * integer comparisons — the DuckDB twin hash-matches bit for bit.
  *
  * Scale shape: ranking rides [[graft.plans.GlobalRank.withRowNumber]]
  * (range partitioning + per-partition zipWithIndex — no single-
  * partition window, no second scan); footer stats are one file-keyed
  * aggregate (output = |files| rows); the readout aggregates the stats
  * relation. At 100 TB this IS the write-side OPTIMIZE job shape:
  * range-shuffle on the layout key, stats ride the write. */
object Layout {

  private val ZBits = 10

  /** Bit-interleave a (even lanes) and b (odd lanes), both < 2^10.
    * Inputs are min-max-scaled to this common bit budget first — raw
    * interleaving of dimensions with unequal bit-widths degenerates to
    * leading-column order (the wide dimension's high bits own every
    * high lane), which is exactly the linear layout z-order exists to
    * beat. Lowered to the native [[graft.functions.BitInterleave]]
    * Morton-spread expression (one codegen node vs the 3-nodes-per-bit
    * fold this replaced; BitInterleaveSpec holds bit-parity with the
    * fold, so the k15 oracle value cannot move). */
  private def zValue(a: Column, b: Column): Column =
    graft.functions.BitInterleave.bitInterleave(a, b)

  private def zValueSql(a: String, b: String): String =
    (0 until ZBits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Min-max scale to [0, 1023] in exact integer arithmetic (div by a
    * GREATEST(1, span) so a constant column degenerates to 0, not an
    * error). */
  private def scaled(v: Column, lo: Column, hi: Column): Column =
    call_function("div", (v - lo) * lit((1L << ZBits) - 1),
      greatest(lit(1L), hi - lo))

  def zorderPruning(spark: SparkSession, dir: String, rowsPerFile: Int = 512,
                    skuLo: Long = 100L, skuHi: Long = 500L,
                    suppLo: Long = 10L, suppHi: Long = 30L): DataFrame = {
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("long").as("sku"),
        col("l_suppkey").cast("long").as("supp"),
        col("l_orderkey"), col("l_linenumber"))
    val dom = rows.agg(min(col("sku")).as("sku_lo"), max(col("sku")).as("sku_hi"),
      min(col("supp")).as("supp_lo"), max(col("supp")).as("supp_hi"))
    // materialized once: GlobalRank evaluates its input twice (range
    // sampling + the shuffle itself), so un-checkpointed the scan +
    // bit-interleave lineage re-ran on both passes
    val z = rows.crossJoin(broadcast(dom))
      .withColumn("z", zValue(
        scaled(col("sku"), col("sku_lo"), col("sku_hi")),
        scaled(col("supp"), col("supp_lo"), col("supp_hi"))))
      .select(col("sku"), col("supp"), col("l_orderkey"),
        col("l_linenumber"), col("z"))
      .localCheckpoint()
    // the probe-rectangle row count is layout-independent, so it rides
    // the zorder layout's file-stat aggregate as one conditional sum
    // instead of a third fact pass; the file-grain relation is tiny and
    // feeds two consumers (readout + the selected scalar)
    val zFiles = fileStats(graft.plans.GlobalRank.withRowNumber(
        z, "rk", col("z"), col("l_orderkey"), col("l_linenumber")),
        rowsPerFile, withSel = Some((skuLo, skuHi, suppLo, suppHi)))
      .localCheckpoint()
    val selected = zFiles.agg(sum(col("n_sel")).as("n_rows_selected"))
    val zLayout =
      statsReadout("zorder", zFiles, skuLo, skuHi, suppLo, suppHi)
    val linLayout = {
      val ranked = graft.plans.GlobalRank.withRowNumber(
        rows, "rk", col("sku"), col("supp"), col("l_orderkey"),
        col("l_linenumber"))
      fileReadout("linear", ranked, rowsPerFile, skuLo, skuHi, suppLo, suppHi)
    }
    zLayout.unionAll(linLayout)
      .crossJoin(broadcast(selected))
      .orderBy(col("layout"))
  }

  private def touchedExpr(skuLo: Long, skuHi: Long,
                          suppLo: Long, suppHi: Long): String =
    s"CASE WHEN sku_min <= $skuHi AND sku_max >= $skuLo AND " +
      s"supp_min <= $suppHi AND supp_max >= $suppLo THEN 1 ELSE 0 END"

  /** Per-modelled-file stats of a ranked layout; `withSel` adds the
    * probe-rectangle row count as a conditional sum on the same pass. */
  private def fileStats(ranked: DataFrame, rowsPerFile: Int,
                        withSel: Option[(Long, Long, Long, Long)]): DataFrame = {
    val base = Seq(count(lit(1)).as("n_rows"),
      min(col("sku")).as("sku_min"), max(col("sku")).as("sku_max"),
      min(col("supp")).as("supp_min"), max(col("supp")).as("supp_max"))
    val aggs = base ++ withSel.map { case (sl, sh, pl, ph) =>
      sum(when(col("sku").between(sl, sh) && col("supp").between(pl, ph),
        1L).otherwise(0L)).as("n_sel")
    }
    ranked
      .groupBy(expr(s"(rk - 1) DIV $rowsPerFile").as("file_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private def statsReadout(name: String, stats: DataFrame,
                           skuLo: Long, skuHi: Long,
                           suppLo: Long, suppHi: Long): DataFrame =
    stats.agg(
      lit(name).as("layout"),
      count(lit(1)).as("n_files"),
      expr(s"CAST(SUM(${touchedExpr(skuLo, skuHi, suppLo, suppHi)}) " +
        "AS BIGINT)").as("n_touched"),
      expr(s"SUM(${touchedExpr(skuLo, skuHi, suppLo, suppHi)}) * 1000" +
        " DIV COUNT(*)").as("touched_pct_milli"),
      sum(col("n_rows")).as("n_rows_total"))

  private def fileReadout(name: String, ranked: DataFrame, rowsPerFile: Int,
                          skuLo: Long, skuHi: Long,
                          suppLo: Long, suppHi: Long): DataFrame =
    statsReadout(name, fileStats(ranked, rowsPerFile, withSel = None),
      skuLo, skuHi, suppLo, suppHi)

  def zorderPruningSql(rowsPerFile: Int = 512,
                       skuLo: Long = 100L, skuHi: Long = 500L,
                       suppLo: Long = 10L, suppHi: Long = 30L): String = {
    val touched =
      s"""CASE WHEN sku_min <= $skuHi AND sku_max >= $skuLo
         |  AND supp_min <= $suppHi AND supp_max >= $suppLo
         |  THEN 1 ELSE 0 END""".stripMargin
    def one(name: String, orderBy: String) =
      s"""SELECT '$name' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM($touched) AS BIGINT) AS n_touched,
         |  CAST(SUM($touched) AS BIGINT) * 1000 // COUNT(*) AS touched_pct_milli,
         |  CAST(SUM(n_rows) AS BIGINT) AS n_rows_total
         |FROM (
         |  SELECT (rk - 1) // $rowsPerFile AS file_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    MIN(sku) AS sku_min, MAX(sku) AS sku_max,
         |    MIN(supp) AS supp_min, MAX(supp) AS supp_max
         |  FROM (
         |    SELECT sku, supp,
         |      ROW_NUMBER() OVER (ORDER BY $orderBy) AS rk
         |    FROM rows)
         |  GROUP BY 1)""".stripMargin
    val scale = (v: String, lo: String, hi: String) =>
      s"(($v - $lo) * ${(1L << ZBits) - 1} // GREATEST(1, $hi - $lo))"
    s"""WITH raw AS (
       |  SELECT l_partkey AS sku, l_suppkey AS supp, l_orderkey, l_linenumber
       |  FROM lineitem),
       |dom AS (
       |  SELECT MIN(sku) AS dsku_lo, MAX(sku) AS dsku_hi,
       |    MIN(supp) AS dsupp_lo, MAX(supp) AS dsupp_hi
       |  FROM raw),
       |rows AS (
       |  SELECT sku, supp, l_orderkey, l_linenumber,
       |    ${zValueSql(scale("sku", "dsku_lo", "dsku_hi"),
                        scale("supp", "dsupp_lo", "dsupp_hi"))} AS z
       |  FROM raw CROSS JOIN dom),
       |sel AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_selected FROM rows
       |  WHERE sku BETWEEN $skuLo AND $skuHi
       |    AND supp BETWEEN $suppLo AND $suppHi),
       |layouts AS (
       |  ${one("zorder", "z, l_orderkey, l_linenumber")}
       |  UNION ALL
       |  ${one("linear", "sku, supp, l_orderkey, l_linenumber")})
       |SELECT layout, n_files, n_touched, touched_pct_milli, n_rows_total,
       |  n_rows_selected
       |FROM layouts CROSS JOIN sel
       |ORDER BY layout""".stripMargin
  }

  /** k26: Z-ORDER LAYOUT APPLIED — k15 predicts file-stat pruning
    * under a modeled z-order vs linear rewrite; this EXECUTES both
    * rewrites (one physical parquet file per rowsPerFile-rank window,
    * the exact-file placement discipline of [[LakeApply]]) and
    * re-derives the k15 relation from the REAL files' row-group
    * content: per physical file, min/max(sku, supp) via a
    * `_metadata.file_path` rollup (k4's measurement leg), then the
    * touched-file census under the same probe rectangle. The oracle
    * stays k15's MODEL — a hash match proves the writer placed every
    * row exactly where the plan ranked it, i.e. the OPTIMIZE
    * ZORDER job delivered its promised pruning physically. A larger
    * file size than k15's readout default keeps the applied lake a
    * few hundred files at every SF (the slice-size-independence
    * argument of the other applied keys).
    *
    * Scale shape: the rewrite is GlobalRank (one-RDD zipWithIndex,
    * no global window) + the one-task-per-file shuffle; measurement
    * is one (layout, file)-grain aggregate + a 2-row census. */
  def zorderApplied(spark: SparkSession, dir: String,
                    rowsPerFile: Int = 4096,
                    skuLo: Long = 100L, skuHi: Long = 500L,
                    suppLo: Long = 10L, suppHi: Long = 30L): DataFrame =
    graft.model.Silver.memoize(spark, "k26ZorderApplied", dir) {
      val rows = Tables.lineitem(spark, dir)
        .select(col("l_partkey").cast("long").as("sku"),
          col("l_suppkey").cast("long").as("supp"),
          col("l_orderkey"), col("l_linenumber"))
      val dom = rows.agg(min(col("sku")).as("sku_lo"),
        max(col("sku")).as("sku_hi"),
        min(col("supp")).as("supp_lo"), max(col("supp")).as("supp_hi"))
      val z = rows.crossJoin(broadcast(dom))
        .withColumn("z", zValue(
          scaled(col("sku"), col("sku_lo"), col("sku_hi")),
          scaled(col("supp"), col("supp_lo"), col("supp_hi"))))
        .select(col("sku"), col("supp"), col("l_orderkey"),
          col("l_linenumber"), col("z"))
      def keyed(name: String, ranked: DataFrame): DataFrame =
        ranked.withColumn("layout", lit(name))
          .withColumn("__fk", concat_ws("/", col("layout"),
            expr(s"(rk - 1) DIV $rowsPerFile")))
          .select(col("layout"), col("sku"), col("supp"),
            col("l_orderkey"), col("l_linenumber"), col("__fk"))
      val zRanked = keyed("zorder", graft.plans.GlobalRank.withRowNumber(
        z, "rk", col("z"), col("l_orderkey"), col("l_linenumber")))
      val linRanked = keyed("linear", graft.plans.GlobalRank.withRowNumber(
        rows, "rk", col("sku"), col("supp"), col("l_orderkey"),
        col("l_linenumber")))
      val lakeDir = Scratch.tempDir("k26-lake")
      LakeApply.lakeDirs(("k26", dir)) = lakeDir
      LakeApply.writeExactFiles(zRanked.unionByName(linRanked),
        Seq("layout"), "__fk", lakeDir)
      val schema = org.apache.spark.sql.types.StructType(
        zRanked.drop("__fk", "layout").schema.fields)
        .add("layout", org.apache.spark.sql.types.StringType)
      val lake = spark.read.schema(schema).parquet(lakeDir)
      val fileStats = lake
        .select(col("layout"), col("sku"), col("supp"),
          col("_metadata.file_path").as("fp"))
        .groupBy(col("layout"), col("fp"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("sku")).as("sku_min"), max(col("sku")).as("sku_max"),
          min(col("supp")).as("supp_min"), max(col("supp")).as("supp_max"))
      val selected = lake.filter(col("layout") === "zorder" &&
          col("sku").between(skuLo, skuHi) &&
          col("supp").between(suppLo, suppHi))
        .agg(count(lit(1)).as("n_rows_selected"))
      fileStats.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"),
          expr(s"CAST(SUM(${touchedExpr(skuLo, skuHi, suppLo, suppHi)}) " +
            "AS BIGINT)").as("n_touched"),
          expr(s"SUM(${touchedExpr(skuLo, skuHi, suppLo, suppHi)}) * 1000" +
            " DIV COUNT(*)").as("touched_pct_milli"),
          sum(col("n_rows")).as("n_rows_total"))
        .crossJoin(broadcast(selected))
        .orderBy(col("layout"))
    }

  /** k26's oracle IS k15's model at the applied file size — the whole
    * point: prediction vs physical execution, hash-compared. */
  def zorderAppliedSql(rowsPerFile: Int = 4096): String =
    zorderPruningSql(rowsPerFile = rowsPerFile)

  /** The fixed representative workload k19 scores layouts against —
    * one predicate per query family the engine actually runs (date
    * range / single day / store drill / returns / sku point-lookup).
    * (name, Spark boolean expr == DuckDB boolean expr — dialect-shared
    * on purpose). */
  private val Workload: Seq[(String, String)] = Seq(
    ("w1_date_range", "sale_date BETWEEN '1995-06-01' AND '1995-08-31'"),
    ("w2_single_day", "sale_date = '1995-06-15'"),
    ("w3_store_point", "store_id = '0042'"),
    ("w4_returns", "l_returnflag = 'R'"),
    ("w5_sku_point", "sku = 100"))

  /** The candidate partition keys under evaluation, as
    * (layout_name, Spark string expr == DuckDB string expr). */
  private val Candidates: Seq[(String, String)] = Seq(
    ("by_month", "substring(sale_date, 1, 7)"),
    ("by_store", "store_id"),
    ("by_returnflag", "l_returnflag"),
    ("by_sku_bucket", "sku % 16")) // outer CAST normalizes to string

  /** k19: WORKLOAD-AWARE PARTITION-KEY ADVISOR — the decision k6/k7
    * stop short of: k6 scores synthetic uniform predicates and k7
    * sizes files under a GIVEN layout; k19 scores CANDIDATE partition
    * keys against the engine's OWN workload. For each (candidate,
    * predicate): a Hive partition is scanned iff it contains ≥1
    * matching row (partition pruning skips value-disjoint directories
    * — the row-level proxy that is exact when the predicate is a
    * function of the partition key and conservative otherwise), so
    * rows_scanned = Σ rows of hit partitions and pruned_milli is the
    * scan-cost saving the layout would buy that query family. The
    * by_month row under w1/w2 versus the by_store row under w3 is the
    * classic date-vs-tenant partitioning tradeoff, quantified.
    *
    * Scale shape: ONE fact scan feeds a 4-way layout explode (map-side
    * stack — rows×|layouts|, no shuffle until the agg), then ONE
    * (layout, partition) hash aggregate carrying the 5 predicate flags
    * as MAX-combinable booleans — output is partition-count-sized; the
    * predicate unpivot and the (layout, predicate) rollup run over
    * that dimension-sized relation. The fact table is read once for
    * all 20 (layout × predicate) cells. */
  def layoutAdvisor(spark: SparkSession, dir: String): DataFrame = {
    // ONE agg at the finest cross-grain of all four candidate keys —
    // the fact table is scanned and shuffled exactly once (slim rows:
    // four key parts + five flag longs), and each layout then rolls up
    // from the DIMENSION-sized cell relation (months × stores × flags
    // × buckets — calendar/catalog-bounded at any fact scale). The
    // first cut stacked the fact rows 4× and carried the raw predicate
    // columns through the explode; the r10 sf1.0 section flagged it.
    // Row-level flags survive the two-level rollup because MAX and SUM
    // both re-aggregate losslessly from the finer grain.
    // RAW-COLUMN form of the Workload predicates and candidate keys:
    // semantically identical to the sale-view strings (the oracle runs
    // the string form and certifies the equivalence), but the per-row
    // work is timestamp/long comparisons instead of date_format +
    // format_string on every fact row — store-id formatting happens
    // once per CELL, and the shipdate ranges push into parquet
    // row-group pruning.
    val rawPreds: Seq[(String, String)] = Seq(
      ("w1_date_range", "l_shipdate >= TIMESTAMP_NTZ '1995-06-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP_NTZ '1995-09-01 00:00:00'"),
      ("w2_single_day", "l_shipdate >= TIMESTAMP_NTZ '1995-06-15 00:00:00' " +
        "AND l_shipdate < TIMESTAMP_NTZ '1995-06-16 00:00:00'"),
      ("w3_store_point", "l_suppkey = 42"),
      ("w4_returns", "l_returnflag = 'R'"),
      ("w5_sku_point", "l_partkey = 100"))
    val flagCols = rawPreds.map { case (n, p) =>
      max(expr(p).cast("long")).as(s"hit_$n")
    }
    val cells = Tables.lineitem(spark, dir)
      .select(col("l_shipdate"), col("l_suppkey"), col("l_partkey"),
        col("l_returnflag"))
      .groupBy(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .as("k_month_raw"),
        col("l_suppkey").as("k_store_raw"),
        col("l_returnflag").as("k_flag"),
        pmod(col("l_partkey"), lit(16L)).as("k_bucket"))
      .agg(count(lit(1)).as("n_rows"), flagCols: _*)
      .select(Seq(
        concat(substring(col("k_month_raw").cast("string"), 1, 4),
          lit("-"),
          substring(col("k_month_raw").cast("string"), 5, 2))
          .as("k_month"),
        format_string("%04d", col("k_store_raw")).as("k_store"),
        col("k_flag"), col("k_bucket"), col("n_rows")) ++
        rawPreds.map { case (n, _) => col(s"hit_$n") }: _*)
    // the 4-way layout stack runs over the CELL relation (dimension-
    // sized), not the fact rows — one union-free pass, and the fact
    // aggregate executes exactly once
    val layoutKey: Map[String, String] = Map(
      "by_month" -> "k_month", "by_store" -> "k_store",
      "by_returnflag" -> "k_flag", "by_sku_bucket" -> "k_bucket")
    val stackLayouts = Candidates
      .map { case (n, _) => s"'$n', CAST(${layoutKey(n)} AS STRING)" }
      .mkString(s"stack(${Candidates.size}, ", ", ", ") AS (layout, part_key)")
    val hitNames = Workload.map { case (n, _) => s"hit_$n" }
    val perPart = cells
      .selectExpr(Seq(stackLayouts, "n_rows") ++ hitNames: _*)
      .groupBy(col("layout"), col("part_key"))
      .agg(sum(col("n_rows")).cast("long").as("rows_in_part"),
        hitNames.map(n => max(col(n)).as(n)): _*)
    val stackPreds = Workload
      .map { case (n, _) => s"'$n', hit_$n" }
      .mkString(s"stack(${Workload.size}, ", ", ", ") AS (predicate, hit)")
    perPart
      .selectExpr("layout", "part_key", "rows_in_part", stackPreds)
      .groupBy(col("layout"), col("predicate"))
      .agg(count(lit(1)).as("n_partitions"),
        sum(col("hit")).cast("long").as("n_partitions_scanned"),
        sum(col("rows_in_part")).cast("long").as("rows_total"),
        sum(col("rows_in_part") * col("hit")).cast("long").as("rows_scanned"))
      .withColumn("pruned_milli",
        expr("(rows_total - rows_scanned) * 1000 DIV rows_total"))
      .orderBy(col("layout"), col("predicate"))
  }

  def layoutAdvisorSql(): String = {
    val layoutArms = Candidates.map { case (n, e) =>
      s"SELECT '$n' AS layout, CAST(($e) AS VARCHAR) AS part_key, " +
        Workload.map { case (wn, p) =>
          s"CASE WHEN $p THEN 1 ELSE 0 END AS hit_$wn"
        }.mkString(", ") + " FROM sales"
    }.mkString("\n  UNION ALL ")
    val predArms = Workload.map { case (wn, _) =>
      s"SELECT layout, part_key, rows_in_part, '$wn' AS predicate, " +
        s"hit_$wn AS hit FROM per_part"
    }.mkString("\n  UNION ALL ")
    val hitAggs = Workload.map { case (wn, _) =>
      s"CAST(MAX(hit_$wn) AS BIGINT) AS hit_$wn"
    }.mkString(", ")
    s"""WITH sales AS (${Tables.salesSql}),
       |arms AS (
       |  $layoutArms),
       |per_part AS (
       |  SELECT layout, part_key, CAST(COUNT(*) AS BIGINT) AS rows_in_part,
       |    $hitAggs
       |  FROM arms GROUP BY layout, part_key),
       |cells AS (
       |  $predArms)
       |SELECT layout, predicate, CAST(COUNT(*) AS BIGINT) AS n_partitions,
       |  CAST(SUM(hit) AS BIGINT) AS n_partitions_scanned,
       |  CAST(SUM(rows_in_part) AS BIGINT) AS rows_total,
       |  CAST(SUM(rows_in_part * hit) AS BIGINT) AS rows_scanned,
       |  (CAST(SUM(rows_in_part) AS BIGINT) - CAST(SUM(rows_in_part * hit)
       |    AS BIGINT)) * 1000 // CAST(SUM(rows_in_part) AS BIGINT)
       |    AS pruned_milli
       |FROM cells
       |GROUP BY layout, predicate
       |ORDER BY layout, predicate""".stripMargin
  }
}
