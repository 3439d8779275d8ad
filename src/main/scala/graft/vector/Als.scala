package graft.vector

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ALS-style matrix factorization HALF-STEP, exactly and distributed:
  * given FIXED rank-2 item (brand) factors, solve every customer's
  * ridge normal equations in closed form and read out the best
  * unpurchased-brand recommendation. This is precisely one alternation
  * of ALS (Koren/Bell/Volinsky's alternating solve — each side's
  * update is an independent per-entity least squares given the other
  * side), which is the part that must scale: per-customer solves are
  * embarrassingly parallel after ONE customer-keyed aggregate, and the
  * item side is a |brands|-sized broadcast. The r2 recommendation
  * family gives co-occurrence heuristics; this is the model-based
  * counterpart.
  *
  * DETERMINISM — no RNG: brand factors are a fixed integer hash of
  * the brand ordinal (f1 = bid·37 mod 101 − 50, f2 = bid·73 mod 101 −
  * 50 — small coprime multipliers give sign-mixed, non-collinear
  * columns), ratings are exact integer quantities, so A = FᵀF + λI
  * and b = Fᵀr are exact integers and the 2×2 Cramer solve is integer
  * arithmetic end-to-end. λ = 1000 > 0 makes det = λ² + λ·ΣfᵢᵀΣfⱼ…
  * strictly positive (A is positive definite), so no zero-division
  * branch exists. Factors come out in milli via the sign-explicit
  * truncating division (both Spark DIV and DuckDB // truncate toward
  * zero — verified: -7 // 2 = -3 in DuckDB — so the sign-explicit form
  * is kept for clarity/defense, not behavioral necessity).
  *
  * SCALE SHAPE — one (customer, brand) rollup of the fact⋈orders⋈part
  * joins (brand side broadcast, orders join co-keyed with the j-family
  * posture), one customer-keyed moment aggregate (5 integers per
  * customer), then the rec scan joins the 25-row brand dimension
  * BROADCAST against per-customer purchased sets — the only row-sized
  * relations that move are (customer × purchased-brand), never
  * customer × catalog. */
object Als {

  private val Lambda = 1000L

  /** Shared integer formulas (valid in both engines). */
  private val detA = "(a11 * a22 - a12 * a12)"
  private val num1 = "(b1 * a22 - b2 * a12)"
  private val num2 = "(b2 * a11 - b1 * a12)"
  private def milli(num: String, den: String, divOp: String): String =
    s"(CASE WHEN ($num < 0) != ($den < 0) THEN -1 ELSE 1 END) * " +
      s"(abs($num) * 1000 $divOp abs($den))"

  private def brandDim(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(substring(col("p_brand"), 7, 8).cast("long").as("bid"))
      .distinct()
      .withColumn("f1", (col("bid") * 37) % 101 - 50)
      .withColumn("f2", (col("bid") * 73) % 101 - 50)

  /** The (customer, brand) → total-quantity rating relation (exposed
    * for the spec's in-process recompute). */
  private[graft] def ratingsForSpec(spark: SparkSession,
                                    dir: String): DataFrame =
    ratingsOf(spark, dir).select(col("custkey"), col("bid"), col("r"))

  /** Memoized silver leaf: the ratings relation feeds the moment agg,
    * the purchased anti-set AND the final stitch — without the leaf,
    * each consumer re-pays the fact⋈orders shuffle join. */
  private def ratingsOf(spark: SparkSession, dir: String): DataFrame =
    graft.model.Silver.memoize(spark, "alsRatings", dir) {
      val partBrand = Tables.part(spark, dir)
        .select(col("p_partkey"),
          substring(col("p_brand"), 7, 8).cast("long").as("bid"))
      val orderCust = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity").cast("long").as("qty"))
        .join(orderCust, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(partBrand), col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_custkey").as("custkey"), col("bid"))
        .agg(sum(col("qty")).as("r"))
        .cache()
    }

  /** v36: per-customer rank-2 factors + best unpurchased brand.
    *
    * ONE custkey exchange (guide §2.4): the purchased set rides the
    * moment aggregate as a `collect_set`, the 25-row brand dimension
    * attaches as a single collected array (1-row broadcast), and the
    * best unpurchased brand is an `array_max` over the scored
    * candidate array — struct comparison is field-by-field, so
    * (score, −bid) max IS the old (score DESC, bid ASC) window pick,
    * and `array_max([]) = NULL` reproduces the left join's NULL rec
    * for a customer who bought every brand. The previous shape paid
    * a (custkey, bid) anti-join exchange, a window exchange and a
    * stitch-back join on top of the solve aggregate — identical
    * output, 4 exchanges fewer. */
  def alsRecs(spark: SparkSession, dir: String): DataFrame = {
    val dim = brandDim(spark, dir)
    val dimArr = dim
      .agg(collect_list(struct(col("bid"), col("f1"), col("f2")))
        .as("brands"))
    val ratings = ratingsOf(spark, dir).join(broadcast(dim), Seq("bid"))
    val solved = ratings.groupBy(col("custkey")).agg(
        count(lit(1)).as("n_brands"),
        (sum(col("f1") * col("f1")) + Lambda).as("a11"),
        sum(col("f1") * col("f2")).as("a12"),
        (sum(col("f2") * col("f2")) + Lambda).as("a22"),
        sum(col("r") * col("f1")).as("b1"),
        sum(col("r") * col("f2")).as("b2"),
        collect_set(col("bid")).as("purchased"))
      .select(col("custkey"), col("n_brands"), col("purchased"),
        expr(milli(num1, detA, "div")).as("u1_milli"),
        expr(milli(num2, detA, "div")).as("u2_milli"))
    solved.crossJoin(broadcast(dimArr))
      .withColumn("pick", array_max(transform(
        filter(col("brands"),
          b => !array_contains(col("purchased"), b("bid"))),
        b => struct(
          (col("u1_milli") * b("f1") + col("u2_milli") * b("f2"))
            .as("score"),
          (-b("bid")).as("neg_bid"), b("bid").as("bid")))))
      .select(col("custkey"), col("n_brands"),
        col("u1_milli"), col("u2_milli"),
        col("pick")("bid").as("rec_brand"),
        col("pick")("score").as("rec_score_milli"))
      .orderBy(col("custkey"))
  }

  def alsRecsSql(): String =
    s"""WITH brand_dim AS (
       |  SELECT DISTINCT CAST(substr(p_brand, 7) AS BIGINT) AS bid
       |  FROM part),
       |factors AS (
       |  SELECT bid, (bid * 37) % 101 - 50 AS f1,
       |    (bid * 73) % 101 - 50 AS f2
       |  FROM brand_dim),
       |ratings AS (
       |  SELECT o.o_custkey AS custkey,
       |    CAST(substr(p.p_brand, 7) AS BIGINT) AS bid,
       |    CAST(SUM(l.l_quantity) AS BIGINT) AS r
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1, 2),
       |solved AS (
       |  SELECT custkey, CAST(cnt AS BIGINT) AS n_brands,
       |    CAST(${milli(num1, detA, "//")} AS BIGINT) AS u1_milli,
       |    CAST(${milli(num2, detA, "//")} AS BIGINT) AS u2_milli
       |  FROM (
       |    SELECT rt.custkey, COUNT(*) AS cnt,
       |      CAST(SUM(f.f1 * f.f1) AS HUGEINT) + $Lambda AS a11,
       |      CAST(SUM(f.f1 * f.f2) AS HUGEINT) AS a12,
       |      CAST(SUM(f.f2 * f.f2) AS HUGEINT) + $Lambda AS a22,
       |      CAST(SUM(rt.r * f.f1) AS HUGEINT) AS b1,
       |      CAST(SUM(rt.r * f.f2) AS HUGEINT) AS b2
       |    FROM ratings rt JOIN factors f ON rt.bid = f.bid
       |    GROUP BY rt.custkey) t),
       |recs AS (
       |  SELECT custkey, bid AS rec_brand,
       |    CAST(score_milli AS BIGINT) AS rec_score_milli
       |  FROM (
       |    SELECT s.custkey, f.bid,
       |      s.u1_milli * f.f1 + s.u2_milli * f.f2 AS score_milli,
       |      ROW_NUMBER() OVER (PARTITION BY s.custkey
       |        ORDER BY s.u1_milli * f.f1 + s.u2_milli * f.f2 DESC,
       |          f.bid ASC) AS rn
       |    FROM solved s CROSS JOIN factors f
       |    WHERE NOT EXISTS (SELECT 1 FROM ratings rt
       |      WHERE rt.custkey = s.custkey AND rt.bid = f.bid))
       |  WHERE rn = 1)
       |SELECT s.custkey, s.n_brands, s.u1_milli, s.u2_milli,
       |  r.rec_brand, r.rec_score_milli
       |FROM solved s LEFT JOIN recs r ON s.custkey = r.custkey
       |ORDER BY s.custkey""".stripMargin
}
