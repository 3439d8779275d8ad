package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c1: the end-to-end training-data corpus filter — the composition the
  * individual operators exist for: per document, the quality score (t2),
  * predicted language (t3), exact-dup verdict (d1) and near-dup cluster
  * verdict (d6, the transitive-closure-correct keeper decision), folded
  * into one kept/rejected decision with reasons.
  *
  * Scale posture: every input is a (doc_id, …) relation hash-partitioned
  * on doc_id — the composition is 4 equi-joins on the same key, which
  * Catalyst plans as one exchange reused across joins. At 100 TB this is
  * the nightly corpus-refresh job; the per-operator tables double as its
  * audit trail (why was this document dropped?). */
object CorpusFilter {

  def corpusFilter(spark: SparkSession, dir: String,
                   minQuality: Long = 50L): DataFrame = {
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val lang = TextAnalysis.langId(spark, dir)
      .select(col("doc_id"), col("lang_pred"))
    val exact = Dedup.exactDedup(spark, dir)
      .select(col("doc_id"), col("is_duplicate").as("is_exact_dup"))
    val clusters = Dedup.dupClusters(spark, dir)
      .select(col("doc_id"),
        (col("cluster_id") =!= col("doc_id")).as("is_near_dup_loser"))
    quality
      .join(lang, Seq("doc_id"))
      .join(exact, Seq("doc_id"))
      .join(clusters, Seq("doc_id"))
      .withColumn("kept",
        col("quality_score") >= minQuality &&
          !col("is_exact_dup") && !col("is_near_dup_loser"))
      .select(col("doc_id"), col("quality_score"), col("lang_pred"),
        col("is_exact_dup"), col("is_near_dup_loser"), col("kept"))
      .orderBy(col("doc_id"))
  }

  def corpusFilterSql(minQuality: Long = 50L): String =
    s"""WITH quality AS (
       |  SELECT doc_id, quality_score FROM (${TextAnalysis.qualityScoreSql})),
       |lang AS (
       |  SELECT doc_id, lang_pred FROM (${TextAnalysis.langIdSql})),
       |exact AS (
       |  SELECT doc_id, is_duplicate AS is_exact_dup FROM (${Dedup.exactDedupSql})),
       |clusters AS (
       |  SELECT doc_id, cluster_id <> doc_id AS is_near_dup_loser
       |  FROM (${Dedup.dupClustersSql()}))
       |SELECT q.doc_id, q.quality_score, l.lang_pred,
       |  e.is_exact_dup, c.is_near_dup_loser,
       |  (q.quality_score >= $minQuality AND NOT e.is_exact_dup
       |    AND NOT c.is_near_dup_loser) AS kept
       |FROM quality q
       |JOIN lang l USING (doc_id)
       |JOIN exact e USING (doc_id)
       |JOIN clusters c USING (doc_id)
       |ORDER BY q.doc_id""".stripMargin
}
