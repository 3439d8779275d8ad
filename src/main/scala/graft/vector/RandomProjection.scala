package graft.vector

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** v35: SPARSE JOHNSON–LINDENSTRAUSS PROJECTION + DISTANCE-PRESERVATION
  * READOUT (Achlioptas 2003, "Database-friendly random projections"):
  * project the d-dim embedding column to k dims through the sparse
  * sign matrix R with entries +1 / −1 each w.p. 1/6 and 0 w.p. 2/3
  * (E[R²] = 1/3, so 3·‖Rx‖²/k is an unbiased estimate of ‖x‖²), then
  * measure what the curation pipeline actually cares about before it
  * swaps full vectors for projections in dedup/ANN prefilters: how
  * well PAIRWISE distances survive. The readout pairs each vector
  * with its (+1) and (+37) neighbor by vec_id — a fixed row-sized
  * pairing, never all-pairs — and reports, per stride, the mean /
  * min / max of the milli ratio 3·dproj²·1000 DIV (k·dorig²) and the
  * fraction of pairs within ±25 % of 1, i.e. the realized JL bound.
  *
  * DETERMINISM: R is not stored — entry (j, k') derives from the
  * multiplicative hash ((j·K + k')·2654435761 mod 1000000007) mod 6
  * (0 → +1, 1 → −1, else 0), so any engine reproduces the identical
  * matrix from the formula alone; inputs milli-quantize exactly as
  * v34 (floor of one IEEE multiply), making every distance an exact
  * BIGINT and the ratios exact truncating divisions.
  *
  * Scale shape: the projection is ONE pass over the long form joined
  * to a broadcast d×k sign relation built from a range — a
  * (row, k')-keyed partial-sum aggregate (map-side combinable); the
  * pairing is two self-joins of the k-sized projected relation on a
  * computed key (hash-partitioned, row-sized); the readout is a
  * 2-row aggregate. No all-pairs anywhere; at 100 TB the projected
  * table is the thing you'd persist (k/d of the bytes) and the eval
  * rides along on the same pass. */
object RandomProjection {

  def jlEval(spark: SparkSession, dir: String, k: Int = 16,
             strides: Seq[Int] = Seq(1, 37)): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val xl = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        expr("CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)").as("xq"))
    // the d×k sign relation, from a range — dimension-sized, broadcast
    val signs = spark.range(0, 64L * k)
      .select(expr(s"id DIV $k").as("j"),
        pmod(col("id"), lit(k.toLong)).as("kk"))
      .withColumn("m",
        pmod(pmod(col("j") * k + col("kk"), lit(1000000007L)) * lit(2654435761L),
          lit(1000000007L)) % 6L)
      .withColumn("r", when(col("m") === 0L, 1L)
        .when(col("m") === 1L, -1L).otherwise(0L))
      .where(col("r") =!= 0L)
      .select(col("j"), col("kk"), col("r"))
    val proj = xl.join(broadcast(signs), "j")
      .groupBy(col("vec_id"), col("kk"))
      .agg(sum(col("r") * col("xq")).as("y"))
      .groupBy(col("vec_id"))
      .agg(collect_list(struct(col("kk"), col("y"))).as("ys"))
      .select(col("vec_id"),
        transform(array_sort(col("ys")), s => s.getField("y")).as("y"))
    val full = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long")).as("xq"))
    // the packed (vec_id, xq, y) relation appears in FOUR join subtrees
    // (lhs/rhs x strides) — materialize it once as a plan leaf or the
    // projection aggregate re-runs per subtree (4x the corpus pass)
    val both = graft.model.Silver.memoize(spark, s"jlPacked:$k", dir) {
      full.join(proj, "vec_id")
    }
    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => {
        val diff = x - y; diff.cast(d19) * diff.cast(d19)
      }), lit(java.math.BigDecimal.ZERO).cast(
        org.apache.spark.sql.types.DecimalType(38, 0)),
        (acc, v) => acc + v)
    val stridesDf = strides.map { st =>
      val lhs = both.select(col("vec_id"), col("xq").as("xa"), col("y").as("ya"))
      val rhs = both.select((col("vec_id") - st).as("vec_id"),
        col("xq").as("xb"), col("y").as("yb"))
      lhs.join(rhs, "vec_id")
        .select(lit(st).as("stride"),
          d2(col("xa"), col("xb")).as("dorig2"),
          d2(col("ya"), col("yb")).as("dproj2"))
        .where(col("dorig2") > 0)
        .select(col("stride"),
          expr(s"CAST((dproj2 * 3000) DIV ($k * dorig2) AS BIGINT)")
            .as("ratio_milli"))
    }.reduce(_ unionAll _)
    stridesDf.groupBy(col("stride"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("SUM(ratio_milli) DIV COUNT(*)").as("mean_ratio_milli"),
        min(col("ratio_milli")).as("min_ratio_milli"),
        max(col("ratio_milli")).as("max_ratio_milli"),
        expr("SUM(CASE WHEN ratio_milli BETWEEN 750 AND 1250 THEN 1 ELSE 0 END)" +
          " * 1000 DIV COUNT(*)").as("within_25pct_milli"))
      .orderBy(col("stride"))
  }

  def jlEvalSql(k: Int = 16, strides: Seq[Int] = Seq(1, 37)): String = {
    val strideSelects = strides.map { st =>
      s"""SELECT $st AS stride, a.vec_id,
         |  (SELECT CAST(SUM(CAST(ax - bx AS HUGEINT) * (ax - bx)) AS HUGEINT)
         |   FROM (SELECT unnest(a.xq) AS ax, unnest(b.xq) AS bx)) AS dorig2,
         |  (SELECT CAST(SUM(CAST(ay - by AS HUGEINT) * (ay - by)) AS HUGEINT)
         |   FROM (SELECT unnest(a.y) AS ay, unnest(b.y) AS by)) AS dproj2
         |FROM packed a JOIN packed b ON b.vec_id = a.vec_id + $st""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH xl AS (
       |  SELECT vec_id, CAST(j AS BIGINT) AS j,
       |    CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS xq
       |  FROM (SELECT vec_id, embedding,
       |          unnest(range(0, len(embedding))) AS j
       |        FROM embeddings)),
       |signs AS (
       |  SELECT (id // $k) AS j, (id % $k) AS kk,
       |    CASE (((id // $k) * $k + (id % $k)) % 1000000007 * 2654435761)
       |      % 1000000007 % 6
       |      WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS r
       |  FROM (SELECT unnest(range(0, ${64L * k})) AS id)
       |  WHERE CASE (((id // $k) * $k + (id % $k)) % 1000000007 * 2654435761)
       |      % 1000000007 % 6 WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END <> 0),
       |proj AS (
       |  SELECT vec_id, kk, CAST(SUM(r * xq) AS BIGINT) AS y
       |  FROM xl JOIN signs USING (j) GROUP BY vec_id, kk),
       |packed AS (
       |  SELECT e.vec_id,
       |    [CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
       |      for x in e.embedding] AS xq,
       |    (SELECT list(p.y ORDER BY p.kk) FROM proj p
       |     WHERE p.vec_id = e.vec_id) AS y
       |  FROM embeddings e),
       |pairs AS (
       |$strideSelects),
       |ratios AS (
       |  SELECT stride,
       |    CAST((dproj2 * 3000) // ($k * dorig2) AS BIGINT) AS ratio_milli
       |  FROM pairs WHERE dorig2 > 0)
       |SELECT stride, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(ratio_milli) AS BIGINT) // COUNT(*) AS mean_ratio_milli,
       |  CAST(MIN(ratio_milli) AS BIGINT) AS min_ratio_milli,
       |  CAST(MAX(ratio_milli) AS BIGINT) AS max_ratio_milli,
       |  CAST(SUM(CASE WHEN ratio_milli BETWEEN 750 AND 1250 THEN 1 ELSE 0 END)
       |    AS BIGINT) * 1000 // COUNT(*) AS within_25pct_milli
       |FROM ratios GROUP BY stride ORDER BY stride""".stripMargin
  }
}
