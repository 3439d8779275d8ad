package graft.analytics

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SKYLINE (Pareto-dominance frontier) — the classic multi-criteria
  * operator relational engines lack as a primitive (Börzsönyi et al.,
  * ICDE 2001). A part is ON the frontier of its brand's catalog iff no
  * other part of the brand is at-least-as-cheap AND at-least-as-big
  * with one strict: the "cheapest for its size class" menu a buyer
  * actually chooses from. The reference's analytics stack has the
  * best/worst argmax family (export-to-quicksight's store extremes);
  * the skyline is its multi-criteria generalization.
  *
  * SCALE PATH — dominance WITHOUT the n² self-join: sort each brand by
  * price; a part is dominated iff EITHER
  *   (a) some STRICTLY cheaper part is at least as big — i.e. the
  *       running max size over the strictly-cheaper price range
  *       reaches its size (a RANGE frame ending at -1 makes "strictly
  *       cheaper" exact under price ties), OR
  *   (b) some same-price part is strictly bigger — the per-(brand,
  *       price) max exceeds its size.
  * Two window passes over ONE brand-keyed exchange, O(n log n) overall
  * vs the textbook O(n²) NOT EXISTS — at 100 TB the brand partitions
  * are catalog-sized and independent, so the operator is embarrassingly
  * parallel after one shuffle. The ORACLE deliberately stays the O(n²)
  * NOT EXISTS formulation: an INDEPENDENT derivation of the same set,
  * not a SQL transliteration of the window trick.
  */
object Skyline {

  /** a58: per-brand (price asc, size desc) skyline of the part catalog.
    * Price in exact integer cents (2-dp double → DECIMAL → ×100), so
    * the RANGE frame and the tie semantics are integer-exact in both
    * engines. Output carries the frontier parts with their brand rank
    * by price (a stable, totally-ordered readout). */
  def brandSkyline(spark: SparkSession, dir: String): DataFrame = {
    val priced = Tables.part(spark, dir).select(
      col("p_partkey"), col("p_brand"),
      (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("price_c"),
      col("p_size").cast("long").as("size"))
    val wCheaper = Window.partitionBy(col("p_brand"))
      .orderBy(col("price_c"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSamePrice = Window.partitionBy(col("p_brand"), col("price_c"))
    val flagged = priced
      .withColumn("max_size_cheaper", max(col("size")).over(wCheaper))
      .withColumn("max_size_same", max(col("size")).over(wSamePrice))
      .withColumn("dominated",
        (col("max_size_cheaper").isNotNull &&
          col("max_size_cheaper") >= col("size")) ||
          col("max_size_same") > col("size"))
    val wRank = Window.partitionBy(col("p_brand"))
      .orderBy(col("price_c"), col("p_partkey"))
    flagged.filter(!col("dominated"))
      .withColumn("frontier_rank", row_number().over(wRank))
      .select(col("p_brand"), col("frontier_rank"), col("p_partkey"),
        col("price_c"), col("size"))
      .orderBy(col("p_brand"), col("frontier_rank"))
  }

  /** Independent O(n²) dominance oracle: NOT EXISTS a dominator. */
  def brandSkylineSql(): String =
    """WITH priced AS (
      |  SELECT p_partkey, p_brand,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c,
      |    CAST(p_size AS BIGINT) AS size
      |  FROM part),
      |frontier AS (
      |  SELECT p.* FROM priced p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM priced q
      |    WHERE q.p_brand = p.p_brand
      |      AND ((q.price_c < p.price_c AND q.size >= p.size)
      |        OR (q.price_c <= p.price_c AND q.size > p.size))))
      |SELECT p_brand,
      |  ROW_NUMBER() OVER (PARTITION BY p_brand
      |    ORDER BY price_c, p_partkey) AS frontier_rank,
      |  p_partkey, price_c, size
      |FROM frontier
      |ORDER BY p_brand, frontier_rank""".stripMargin
}
