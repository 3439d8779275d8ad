package graft.llm

import graft.analytics.History
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The LLM seam (SURVEY.md §2.8): the reference calls Bedrock with a
  * metrics prompt and parses fenced JSON back (detect-anomalies:139-194,
  * 280-301). Deterministic feature engineering (the deviations, trend
  * directions, severity rubric) lives in `analytics/` and IS
  * oracle-checked; this module is the pluggable text→JSON column
  * transform that a real model call plugs into — kept off the oracle's
  * value surface by design (temperature>0 output is nondeterministic).
  *
  * Scale posture: a model call is a high-latency per-row side effect —
  * the transform contract is column→column so implementations can batch
  * per partition (connection/session per partition, like
  * [[graft.multimodal.Multimodal.extractFeatures]]); the engine never
  * collects rows to the driver to call a model.
  */
trait InsightTransform {
  /** Map a prompt column to a JSON-string insight column. */
  def apply(prompt: Column): Column
}

/** Deterministic stand-in: "responds" with the rubric's own JSON (the
  * prompt thresholds as code), wrapped in the markdown fences the
  * reference strips — so the parse path is exercised end-to-end. A real
  * implementation replaces ONLY this object. */
object RuleInsight extends InsightTransform {
  override def apply(prompt: Column): Column =
    concat(lit("```json\n"), prompt, lit("\n```"))
}

object Insight {

  val insightSchema: StructType = StructType(Seq(
    StructField("severity", StringType),
    StructField("deviation_pct", DoubleType),
    StructField("store_id", StringType)))

  /** l1: the full LLM round trip with deterministic values — build the
    * "model output" (fenced JSON from the anomaly rubric via
    * [[RuleInsight]]), strip the fences, `from_json` it back
    * (detect-anomalies:280-301's cleanup+parse), and emit the parsed
    * fields. The oracle computes the same values directly — what's
    * verified is that the JSON round trip is lossless. */
  def insightsRoundTrip(spark: SparkSession, dir: String,
                        llm: InsightTransform = RuleInsight): DataFrame = {
    val prompt = to_json(struct(col("severity"), col("deviation_pct"), col("store_id")))
    val raw = llm(prompt)
    val unfenced = regexp_replace(raw, "```(json)?\\n?", "")
    History.anomalies(spark, dir)
      .withColumn("_insight_json", unfenced)
      .withColumn("_parsed", from_json(col("_insight_json"), insightSchema))
      .select(
        col("_parsed.store_id").as("store_id"),
        col("sale_date"),
        col("_parsed.severity").as("severity"),
        col("_parsed.deviation_pct").as("deviation_pct"))
      .orderBy(col("store_id"), col("sale_date"))
  }

  val insightsRoundTripSql: String =
    s"""WITH a AS (${History.anomaliesBodySql})
       |SELECT store_id, sale_date, severity, deviation_pct
       |FROM a
       |ORDER BY store_id, sale_date""".stripMargin
}
