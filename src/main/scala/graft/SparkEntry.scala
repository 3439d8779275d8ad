package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.{StoreDaily, CompanyDaily, ProductDaily, Completeness, Spine}
import graft.analytics.{Kpis, History, Trends, Sketches}
import graft.streaming.EventsBatch
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.vector.Similarity
import graft.export.Flatten

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query keys are SURVEY.md §2 operator ids. Every oracle-checked query
  * follows the parity conventions documented in [[graft.model.Tables]]. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StoreDaily.rollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_store_daily" -> ((s, dir) => StoreDaily.rollup(s, dir)),
    "a2_payment_breakdown" -> ((s, dir) => StoreDaily.paymentBreakdown(s, dir)),
    "a3_top_products" -> ((s, dir) => StoreDaily.topProducts(s, dir)),
    "a4_company_daily" -> ((s, dir) => CompanyDaily.rollup(s, dir)),
    "a5_best_worst_store" -> ((s, dir) => CompanyDaily.bestWorstStore(s, dir)),
    "a6_company_payment" -> ((s, dir) => CompanyDaily.paymentRollup(s, dir)),
    "a7_product_rollup_lossy" -> ((s, dir) => ProductDaily.rollupLossy(s, dir)),
    "a8_top10_products" -> ((s, dir) => ProductDaily.top10Lossy(s, dir)),
    "a9_kpis" -> ((s, dir) => Kpis.kpis(s, dir)),
    "a18_available_dates" -> ((s, dir) => Kpis.availableDates(s, dir)),
    "a19_completeness" -> ((s, dir) => Completeness.completeness(s, dir)),
    "j3_missing_stores" -> ((s, dir) => Completeness.missingStores(s, dir)),
    "product_rollup_exact" -> ((s, dir) => ProductDaily.rollupExact(s, dir)),
    "a10_store_history" -> ((s, dir) => History.storeHistory(s, dir)),
    "a11_anomaly_rules" -> ((s, dir) => History.anomalies(s, dir)),
    "a12_trend_direction" -> ((s, dir) => History.trendDirection(s, dir)),
    "a15_company_history" -> ((s, dir) => History.companyHistory(s, dir)),
    "a16_product_history" -> ((s, dir) => History.productHistory(s, dir)),
    "a22_insight_counts" -> ((s, dir) => History.insightCounts(s, dir)),
    "a13_trend_halves" -> ((s, dir) => Trends.trendHalves(s, dir)),
    "a14_trend_first_last" -> ((s, dir) => Trends.trendFirstLast(s, dir)),
    "a17_product_trends" -> ((s, dir) => Trends.productTrends(s, dir)),
    "a20_pivot_wide" -> ((s, dir) => Trends.pivotWide(s, dir)),
    "a21_store_period_summary" -> ((s, dir) => Trends.storePeriodSummary(s, dir)),
    "j4_date_spine" -> ((s, dir) => Spine.dateSpine(s, dir)),
    "j5_union_ranges" -> ((s, dir) => Spine.unionRanges(s, dir)),
    "s2_filename_parse" -> ((s, dir) => Spine.filenameParse(s, dir)),
    "e1_events_daily" -> ((s, dir) => EventsBatch.dailyByType(s, dir)),
    "e2_events_hourly" -> ((s, dir) => EventsBatch.hourlyWindow(s, dir)),
    "t1_token_stats" -> ((s, dir) => TextAnalysis.tokenStats(s, dir)),
    "t2_quality_score" -> ((s, dir) => TextAnalysis.qualityScore(s, dir)),
    "t3_lang_id" -> ((s, dir) => TextAnalysis.langId(s, dir)),
    "t4_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(s, dir)),
    "d1_exact_dedup" -> ((s, dir) => Dedup.exactDedup(s, dir)),
    "d2_minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(s, dir)),
    "d3_simhash" -> ((s, dir) => Dedup.simhash(s, dir)),
    "d4_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    "d5_minhash_xxhash" -> ((s, dir) => Dedup.minhashPairsXxhash(s, dir)),
    "v1_cosine_topk" -> ((s, dir) => Similarity.cosineTopK(s, dir)),
    "v2_ann_lsh" -> ((s, dir) => Similarity.annLsh(s, dir)),
    "v3_cosine_near_dup" -> ((s, dir) => Similarity.cosineNearDup(s, dir)),
    "j6_explode_products" -> ((s, dir) => Flatten.explodeTopProducts(s, dir)),
    "x1_export_summaries" -> ((s, dir) => Flatten.exportStoreSummariesCsv(s, dir)),
    "k1_kv_keys" -> ((s, dir) => Flatten.kvKeys(s, dir)),
    "r1_report_lines" -> ((s, dir) => Flatten.reportLines(s, dir)),
    "x2_dow_profile" -> ((s, dir) => Trends.dowProfile(s, dir)),
    "e3_props_parse" -> ((s, dir) => EventsBatch.propsParse(s, dir)),
    "e4_sessionize" -> ((s, dir) => EventsBatch.sessionize(s, dir)),
    "e5_sliding_window" -> ((s, dir) => EventsBatch.slidingWindow(s, dir)),
    // sk1/sk2: approximate sketches — no oracle (implementation-defined
    // values); driver records rows-only. Error-bounded in SketchesSpec.
    "sk1_daily_approx" -> ((s, dir) => Sketches.dailyApprox(s, dir)),
    "sk2_store_sku_approx" -> ((s, dir) => Sketches.storeSkuApprox(s, dir)),
    "a23_weekly_rollup" -> ((s, dir) => Kpis.calendarRollup(s, dir, "week")),
    "a24_monthly_rollup" -> ((s, dir) => Kpis.calendarRollup(s, dir, "month")),
    "a25_resolve_date" -> ((s, dir) => Kpis.resolveDate(s, dir)),
    "d6_dup_clusters" -> ((s, dir) => Dedup.dupClusters(s, dir)),
    // store 0007 exists at every scale factor (sf0.001 has only 10 stores)
    "p3_store_filter" -> ((s, dir) => History.storeHistoryFiltered(s, dir, Some("0007"))),
    "l1_insight_roundtrip" -> ((s, dir) => graft.llm.Insight.insightsRoundTrip(s, dir)),
    // s6: Spark _metadata hidden column — no DuckDB analogue; rows-only.
    "s6_file_inventory" -> ((s, dir) => Spine.fileInventory(s, dir)),
    "t5_keywords" -> ((s, dir) => TextAnalysis.keywords(s, dir)),
    "t6_normalize" -> ((s, dir) => TextAnalysis.normalizeText(s, dir)),
    "e6_funnel" -> ((s, dir) => EventsBatch.funnel(s, dir)),
    "d7_lsh_eval" -> ((s, dir) => Dedup.lshEval(s, dir)),
    "d8_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "c1_corpus_filter" -> ((s, dir) => graft.text.CorpusFilter.corpusFilter(s, dir)),
    "a26_rollup_bias" -> ((s, dir) => ProductDaily.rollupBias(s, dir)),
    "a27_rank_movement" -> ((s, dir) => Trends.rankMovement(s, dir)),
    "a28_wow_growth" -> ((s, dir) => Trends.wowGrowth(s, dir)),
    "v4_ivf_ann" -> ((s, dir) => Similarity.ivfAnn(s, dir)),
    "t7_repetition" -> ((s, dir) => TextAnalysis.repetition(s, dir)),
    "e7_retention" -> ((s, dir) => EventsBatch.retention(s, dir)),
    "r2_recommendations" -> ((s, dir) => graft.analytics.Recommendations.recommendations(s, dir)),
    "x3_export_trends" -> ((s, dir) => Flatten.exportTrendsCsv(s, dir)),
    "x4_export_recommendations" -> ((s, dir) => Flatten.exportRecommendationsCsv(s, dir)),
    // d9/d10: xxhash64 scale twins of d4/d6 — rows-only like d5 (no DuckDB
    // xxhash64); value-parity with the dictionary variants is spec-asserted.
    "d9_jaccard_xxhash" -> ((s, dir) => Dedup.ngramJaccardXxhash(s, dir)),
    "d10_clusters_xxhash" -> ((s, dir) => Dedup.dupClustersXxhash(s, dir)),
    "d11_simhash_xxhash" -> ((s, dir) => Dedup.simhashXxhash(s, dir)),
    "t8_fingerprint_xxhash" -> ((s, dir) => TextAnalysis.fingerprintXxhash(s, dir)),
    "t9_pii_scrub" -> ((s, dir) => graft.text.CorpusPrep.piiScrub(s, dir)),
    "p7_split_assign" -> ((s, dir) => graft.text.CorpusPrep.splitAssign(s, dir)),
    "m1_source_mix" -> ((s, dir) => graft.text.CorpusPrep.sourceMix(s, dir)),
    "p9_mix_apply" -> ((s, dir) => graft.text.CorpusPrep.mixApply(s, dir)),
    "t11_length_histogram" -> ((s, dir) => TextAnalysis.lengthHistogram(s, dir)),
    "t12_chunking" -> ((s, dir) => TextAnalysis.chunk(s, dir)),
    "m3_epoch_plan" -> ((s, dir) => graft.text.CorpusPrep.epochPlan(s, dir)),
    "p10_shuffle_order" -> ((s, dir) => graft.text.CorpusPrep.shuffleOrder(s, dir)),
    "d14_split_leakage" -> ((s, dir) => graft.text.CorpusPrep.splitLeakage(s, dir)),
    "d12_contamination" -> ((s, dir) => graft.text.CorpusPrep.contamination(s, dir)),
    "p8_pack_plan" -> ((s, dir) => graft.text.CorpusPrep.packPlan(s, dir)),
    "v5_quantize" -> ((s, dir) => Similarity.quantize(s, dir)),
    "v6_ann_recall" -> ((s, dir) => Similarity.annRecall(s, dir)),
    "c2_corpus_build" -> ((s, dir) => graft.text.CorpusFilter.corpusBuild(s, dir)),
    "t10_corpus_stats" -> ((s, dir) => graft.text.CorpusPrep.corpusStats(s, dir)),
    "v7_quantized_recall" -> ((s, dir) => Similarity.quantizedRecall(s, dir)),
    // m2: multimodal decode-stub features + frame-sample explode — binary
    // decode has no DuckDB analogue; rows-only like s6 (spec-covered in
    // StatefulStreamingSpec/MultimodalSpec shapes).
    "m2_multimodal" -> ((s, dir) => graft.multimodal.Multimodal.multimodalFeatures(s, dir)),
    // d13: xxhash twin of d7 — rows-only like d5/d9/d10; count-algebra
    // parity with d7 is spec-asserted (DedupSimilaritySpec).
    "d13_lsh_eval_xxhash" -> ((s, dir) => Dedup.lshEvalXxhash(s, dir)),
    "e8_asof_attribution" -> ((s, dir) => EventsBatch.asOfAttribution(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a1_store_daily" -> StoreDaily.rollupSql,
    "a2_payment_breakdown" -> StoreDaily.paymentBreakdownSql,
    "a3_top_products" -> StoreDaily.topProductsSql(),
    "a4_company_daily" -> CompanyDaily.rollupSql,
    "a5_best_worst_store" -> CompanyDaily.bestWorstStoreSql,
    "a6_company_payment" -> CompanyDaily.paymentRollupSql,
    "a7_product_rollup_lossy" -> ProductDaily.rollupLossySql,
    "a8_top10_products" -> ProductDaily.top10LossySql,
    "a9_kpis" -> Kpis.kpisSql(),
    "a18_available_dates" -> Kpis.availableDatesSql,
    "a19_completeness" -> Completeness.completenessSql(),
    "j3_missing_stores" -> Completeness.missingStoresSql(),
    "product_rollup_exact" -> ProductDaily.rollupExactSql,
    "a10_store_history" -> History.storeHistorySql,
    "a11_anomaly_rules" -> History.anomaliesSql,
    "a12_trend_direction" -> History.trendDirectionSql,
    "a15_company_history" -> History.companyHistorySql(),
    "a16_product_history" -> History.productHistorySql(),
    "a22_insight_counts" -> History.insightCountsSql,
    "a13_trend_halves" -> Trends.trendHalvesSql(),
    "a14_trend_first_last" -> Trends.trendFirstLastSql(),
    "a17_product_trends" -> Trends.productTrendsSql(),
    "a20_pivot_wide" -> Trends.pivotWideSql(),
    "a21_store_period_summary" -> Trends.storePeriodSummarySql(),
    "j4_date_spine" -> Spine.dateSpineSql(),
    "j5_union_ranges" -> Spine.unionRangesSql,
    "s2_filename_parse" -> Spine.filenameParseSql,
    "e1_events_daily" -> EventsBatch.dailyByTypeSql,
    "e2_events_hourly" -> EventsBatch.hourlyWindowSql,
    "t1_token_stats" -> TextAnalysis.tokenStatsSql,
    "t2_quality_score" -> TextAnalysis.qualityScoreSql,
    "t3_lang_id" -> TextAnalysis.langIdSql,
    "t4_fingerprint" -> TextAnalysis.fingerprintSql,
    "d1_exact_dedup" -> Dedup.exactDedupSql,
    "d2_minhash_lsh" -> Dedup.minhashLshSql,
    "d3_simhash" -> Dedup.simhashSql,
    "d4_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    // d5_minhash_xxhash: deliberately no oracle — xxhash64 has no DuckDB
    // twin; driver records the weaker rows-only check (scale-path variant).
    "v1_cosine_topk" -> Similarity.cosineTopKSql(),
    "v2_ann_lsh" -> Similarity.annLshSql(),
    "v3_cosine_near_dup" -> Similarity.cosineNearDupSql(),
    "j6_explode_products" -> Flatten.explodeTopProductsSql,
    "x1_export_summaries" -> Flatten.exportStoreSummariesCsvSql,
    "k1_kv_keys" -> Flatten.kvKeysSql,
    "r1_report_lines" -> Flatten.reportLinesSql,
    "x2_dow_profile" -> Trends.dowProfileSql,
    "e3_props_parse" -> EventsBatch.propsParseSql,
    "e4_sessionize" -> EventsBatch.sessionizeSql,
    "e5_sliding_window" -> EventsBatch.slidingWindowSql,
    "a23_weekly_rollup" -> Kpis.calendarRollupSql("week"),
    "a24_monthly_rollup" -> Kpis.calendarRollupSql("month"),
    "a25_resolve_date" -> Kpis.resolveDateSql(),
    "d6_dup_clusters" -> Dedup.dupClustersSql(),
    "p3_store_filter" -> History.storeHistoryFilteredSql(Some("0007")),
    "l1_insight_roundtrip" -> graft.llm.Insight.insightsRoundTripSql,
    "t5_keywords" -> TextAnalysis.keywordsSql(),
    "t6_normalize" -> TextAnalysis.normalizeTextSql,
    "e6_funnel" -> EventsBatch.funnelSql,
    "d7_lsh_eval" -> Dedup.lshEvalSql(),
    "d8_simhash_pairs" -> Dedup.simhashPairsSql(),
    "c1_corpus_filter" -> graft.text.CorpusFilter.corpusFilterSql(),
    "a26_rollup_bias" -> ProductDaily.rollupBiasSql,
    "a27_rank_movement" -> Trends.rankMovementSql(),
    "a28_wow_growth" -> Trends.wowGrowthSql,
    "v4_ivf_ann" -> Similarity.ivfAnnSql(),
    "t7_repetition" -> TextAnalysis.repetitionSql,
    "e7_retention" -> EventsBatch.retentionSql,
    "r2_recommendations" -> graft.analytics.Recommendations.recommendationsSql,
    "x3_export_trends" -> Flatten.exportTrendsCsvSql,
    "x4_export_recommendations" -> Flatten.exportRecommendationsCsvSql,
    "t9_pii_scrub" -> graft.text.CorpusPrep.piiScrubSql,
    "p7_split_assign" -> graft.text.CorpusPrep.splitAssignSql,
    "m1_source_mix" -> graft.text.CorpusPrep.sourceMixSql,
    "p9_mix_apply" -> graft.text.CorpusPrep.mixApplySql,
    "t11_length_histogram" -> TextAnalysis.lengthHistogramSql,
    "t12_chunking" -> TextAnalysis.chunkSql(),
    "m3_epoch_plan" -> graft.text.CorpusPrep.epochPlanSql,
    "p10_shuffle_order" -> graft.text.CorpusPrep.shuffleOrderSql(),
    "d14_split_leakage" -> graft.text.CorpusPrep.splitLeakageSql(),
    "d12_contamination" -> graft.text.CorpusPrep.contaminationSql,
    "p8_pack_plan" -> graft.text.CorpusPrep.packPlanSql(),
    "v5_quantize" -> Similarity.quantizeSql,
    "v6_ann_recall" -> Similarity.annRecallSql(),
    "c2_corpus_build" -> graft.text.CorpusFilter.corpusBuildSql(),
    "t10_corpus_stats" -> graft.text.CorpusPrep.corpusStatsSql,
    "v7_quantized_recall" -> Similarity.quantizedRecallSql(),
    "e8_asof_attribution" -> EventsBatch.asOfAttributionSql
  )
}
