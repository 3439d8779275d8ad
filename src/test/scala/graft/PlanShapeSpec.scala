package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gates: the 100 TB posture claims in the scaladoc
  * ("map-side only", "one shuffle", "broadcast, never shuffled") asserted
  * against the ACTUAL physical plans, so a refactor that silently adds an
  * exchange fails here instead of surfacing as a cluster bill. Counts are
  * upper bounds on `Exchange hashpartitioning` occurrences — range
  * exchanges from the deterministic output ORDER BY are excluded on
  * purpose (they are harness-determinism cost, dropped in production
  * writes; hash exchanges are the data-movement that scales with input).
  */
class PlanShapeSpec extends GraftSpec {

  /** Count hash-shuffle nodes by TREE traversal, not string matching:
    * `plan.toString` prints an InMemoryRelation's cached BUILD plan
    * (including its internal exchange) — amortized write-once cost, not
    * this query's data movement — and prints it twice once materialized,
    * which made the count depend on which suite ran first. In the tree,
    * a cached build plan is correctly not a child of the scan node. */
  private def countHash(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    p match {
      case a: AdaptiveSparkPlanExec => countHash(a.executedPlan)
      case s: ShuffleExchangeExec
        if s.outputPartitioning.isInstanceOf[HashPartitioning] =>
        1 + s.children.map(countHash).sum
      case other => other.children.map(countHash).sum
    }
  }

  private def hashExchanges(key: String): Int =
    countHash(SparkEntry.queries(key)(spark, sfDir).queryExecution.executedPlan)

  /** key -> max allowed hash exchanges, with the claim each bound encodes. */
  private val bounds: Seq[(String, Int, String)] = Seq(
    // pure map-side projections: parquet-scan speed, zero data movement
    ("t1_token_stats", 0, "narrow map"),
    ("t2_quality_score", 0, "narrow map"),
    ("t3_lang_id", 0, "narrow map"),
    ("t6_normalize", 0, "narrow map"),
    ("t9_pii_scrub", 0, "narrow map"),
    ("t18_charset_profile", 0, "narrow map: char-class census at scan speed"),
    ("t8_fingerprint_xxhash", 0, "pure map, zero joins"),
    ("p7_split_assign", 1, "map + one small aggregate"),
    ("p9_mix_apply", 2, "both exchanges inside the domain-sized plan build; doc side streams"),
    ("t11_length_histogram", 2, "one 8-row aggregate + 1-row total"),
    // single-shuffle window/agg families
    ("e8_asof_attribution", 1, "as-of lowered to ONE shuffle on user_id"),
    ("e4_sessionize", 1, "one shuffle on user_id, windows ride it"),
    ("a1_store_daily", 1, "one hash agg on (store, day)"),
    // broadcast-side joins: the corpus side must not shuffle to meet the dim
    ("d12_contamination", 2, "benchmark-sized build + one per-doc agg; corpus side streams"),
    // map-side after a driver-collected dimension-sized stats pass
    ("v5_quantize", 0, "stats are broadcast literals; quantize is pure map"),
    ("t12_chunking", 0, "pure per-row explode at scan speed"),
    // bounded-group windows: exactly the one partition shuffle
    ("p8_pack_plan", 1, "windows over bounded (lang, shard) groups"),
    ("p10_shuffle_order", 1, "rank within shard rides one shuffle"),
    ("d1_exact_dedup", 1, "one hash agg on text"),
    ("e6_funnel", 3, "three agg/join rounds on user_id, as documented"),
    // LM fit = one vocab-sized count agg capped by TakeOrdered (no sort
    // exchange); the totals enter as collected literals (1-row driver
    // round-trip); the corpus-sized movement is the doc_id scoring agg
    ("t13_lm_surprisal", 2, "capped vocab fit agg + one doc_id exchange"),
    ("t14_bigram_surprisal", 4,
      "pair-count agg (x2 subtrees: cap + prefix totals) + prev agg + doc_id agg"),
    // h1: the df-cap window rides the word partitioning the posting-list
    // join needs (x2 subtrees: query + index side), then the per-pair
    // candidate agg and the per-query top-k window; embeddings broadcast
    ("h1_hybrid_search", 4,
      "df-capped word index (x2 subtrees) + candidate agg + top-k window"),
    // v14: prefilter is broadcast-q x recon map + top-nCand window; the
    // rerank joins candidates to floats on vec_id (the one hash join)
    ("v14_two_stage", 1,
      "top-nCand window; rerank equi-join rides it, floats broadcast/AQE"),
    ("t15_bm25", 6,
      "tf agg + df window per index subtree (x2) + score agg + top-k window"),
    ("d15_boilerplate", 2, "shingle-df agg + one doc_id rollup; frequent set broadcasts"),
    // PQ encode: codebook is a collected literal, encoding is map-side
    ("v8_pq_codes", 0, "codebook is a broadcast literal; encode is pure map"),
    ("v9_pq_recall", 5, "per-query top-k windows + query-set-sized eval joins"),
    // ADC scoring: LUT broadcast against the map-side code table; only
    // the per-query top-k window moves candidate rows
    ("v10_pq_adc", 1, "broadcast LUT x code table; one top-k window exchange"),
    // IVF-PQ: the cell-assignment window, the assignment<->code join, and
    // the per-query top-k — the index BUILD cost; probing itself is a
    // broadcast join against the cell-partitioned code table
    ("v11_ivf_pq", 3, "assignment window + code join + top-k; probes broadcast"),
    ("v12_lsh_near_dup", 6,
      "bucket-local pairwise at DISTINCT-vector grain: the group " +
        "window, the rep self-join + cross rank window, and the two " +
        "member join-backs all key on (bucket, embedding) — every " +
        "exchange is distinct-vector- or member-row-sized, and the " +
        "quadratic stage no longer scales with duplication"),
    ("v13_residual_pq", 1, "assignment window only; residual codebook is a literal"),
    ("sk3_store_top_sellers", 1, "one store_id agg; MG partials map-side combined"),
    ("sk4_top_sellers_exact", 1, "sk3's plan with the summary sized past the key space"),
    ("m4_frame_dedup", 2, "one frame_hash agg + keeper join; 8-byte shuffle keys"),
    ("d16_dedup_verdict", 2, "bounded-cluster window + keeper join over memoized labels"),
    ("p11_curriculum", 1, "bounded (stage, shard) windows ride one exchange"),
    ("e9_interval_join", 2, "equi-join on user_id carries the range; one exchange pair"),
    ("p12_pack_windows", 2, "plan rides the pack window; one (lang,shard,window) stitch"),
    ("p13_sample", 0, "pure map-side hash predicate at scan speed"),
    ("v15_mips", 1, "v1's broadcast loop ranked by raw dot; one top-k window"),
    ("m5_temperature_mix", 2, "domain agg used twice (groups + totals); broadcast back"),
    ("d18_contamination_span", 3,
      "benchmark broadcast; window + both aggs ride one doc_id exchange + zero-fill join"),
    ("v16_filtered_ann", 1, "label equi-join rides the query broadcast; one top-k window"),
    ("e11_funnel_latency", 6,
      "e6's three user_id aggs + the 2-partition stage window + final agg"),
    ("v17_mips_ann_recall", 5,
      "v15 truth window + bucket top-k window + pair-keyed recall join/agg"),
    ("p14_epoch_apply", 2,
      "both exchanges inside the domain-sized plan build; doc side streams"),
    ("t19_freq_spectrum", 2,
      "map-side-combined vocab agg + log-bounded spectrum rollup"),
    ("e12_latest_state", 1,
      "max(struct) latest-version compaction: one entity-key hash agg, no window sort"),
    ("k2_skew_profile", 2,
      "stack fan-out is map-side: one (key_col, key_val) count + 3-row rollup"),
    ("k3_column_profile", 6,
      "one narrow distinct exchange per column branch (6 pruned scans = " +
        "the table's bytes once; no 6x-row-width Expand shuffle)"),
    ("d19_shared_spans", 5,
      "run-collapse at DISTINCT-CONTENT grain (never quadratic in the " +
        "duplication factor) with BOTH shingle streams broadcast-semi-" +
        "filtered to the verdict-pair doc sets BEFORE their explode " +
        "(r15): the five exchanges — rep-pair distinct, the two " +
        "pair-doc-sized sides of the (container, shingle) meet, the " +
        "rep-pair run window, the metrics join-back — are all pair-set " +
        "or filtered-stream sized; the corpus-wide shingle stream is " +
        "never built, let alone shuffled"),
    ("v18_probe_sweep", 11,
      "2 corpus-sized assignment windows (v4's build shape); all other exchanges are " +
        "query-set x levels eval plumbing; sweep + centroid joins broadcast"),
    ("t16_lexical_diversity", 2,
      "map-side-combined word agg + domain rollup riding its prefix"),
    ("t17_lang_confusion", 2,
      "two tiny aggs over the map-side verdicts; totals broadcast back"),
    ("a29_running_totals", 1,
      "cum + MTD windows both ride one store exchange over the cached silver"),
    ("e10_hourly_anomalies", 2, "e2's hourly agg + one event_type window"),
    ("e13_growth_accounting", 3,
      "distinct + user lag ride the user exchange; day rollup + calendar-bounded day window"),
    ("e14_event_transitions", 3,
      "user-key lead + the |types|^2 rollup + the from-type share window's " +
        "re-key of that |types|^2-row relation (immaterial at any scale)"),
    ("e15_rolling_distinct", 3,
      "one (user,day) distinct + the two-phase distinct agg on window_day; " +
        "7x contribution fan-out stays map-side"),
    ("d20_cross_source", 3,
      "two slim source joins + the |sources|^2 rollup over the cached d4 pair silver"),
    ("v19_sign_recall", 5,
      "v7's eval plumbing: hamming + truth top-k windows, hit join, recall agg; " +
        "codes broadcast"),
    ("m7_scene_cuts", 1,
      "frame features are a narrow flatMap; lag + scene running sum both ride " +
        "the one media_id exchange"),
    ("a30_sales_ols", 1,
      "min-date window + moments rollup both ride one store exchange over " +
        "the cached (store, day) silver"),
    ("e16_mad_outliers", 7,
      "e1's daily rollup + the two rank/median passes and their joins, all " +
        "over the |types|x|days| calendar-bounded relation"),
    ("v20_recall_curve", 8,
      "one truth + one approx ranking pass (windows), then query-set x " +
        "levels sweep plumbing (hit join, cnt agg, spine)"),
    ("e17_burst_detection", 2,
      "lag, both run windows, (user,grp) + per-user rollups and the final " +
        "join all ride the user_id partitioning"),
    ("k5_corr_matrix", 1,
      "one map-combinable moment aggregate + the 1-row gather; the pair " +
        "reshape is an explode of the single result row"),
    ("a31_basket_affinity", 6,
      "basket distinct + order-key pair join/agg + item-count joins over " +
        "the cached basket silver; top-50 is TakeOrdered, no sort exchange"),
    ("a33_rollup_cube", 1,
      "one Expand pass over the cached (store, day) silver: all grouping " +
        "sets combine in a single hash agg"),
    ("e18_lateness_audit", 3,
      "block-decomposed running max: one parallel blk-window exchange + " +
        "the |blocks|-row carry aggregate + the log-bounded bucket " +
        "rollup; the old single-partition arrival gather is gone"),
    ("sk7_cms_estimates", 5,
      "cms cell agg + truth agg + probe/cell join + per-key min + the " +
        "truth join — all over (depth x width)-bounded or key-sized relations"),
    ("sk8_bloom_prune", 2,
      "bitmask probes are literal-array map work; the build distinct and " +
        "the returnflag ledger rollup are the only exchanges"),
    ("k6_zorder_audit", 2,
      "fixed-width file assignment is pure map (no sort, no window): one " +
        "(layout,file) agg + the 6-row span rollup"),
    ("j8_salted_join", 3,
      "both salted sides key-exchange into the shuffled hash join + the " +
        "brand rollup — the documented skew-spread shape"),
    ("a34_exact_percentiles", 1,
      "rank + count windows and the store rollup all ride one store " +
        "exchange over the cached (store, day) silver"),
    ("v24_hard_negatives", 1,
      "broadcast query set against the corpus; one per-query top-k window"),
    ("e19_drift_monitor", 5,
      "one (type, half, bucket) count is the data-sized exchange; totals/" +
        "props/TV rollups are |types|x2x10-bounded"),
    ("k7_partition_planner", 1,
      "one map-combinable documents aggregate; advice is a projection " +
        "over the |partitions|-sized result"),
    ("k8_join_cardinality", 9,
      "per audited join: two key-count aggs + the key-sized equi-join — " +
        "never the data-sized join itself (3 joins x 3)"),
    ("t23_novelty_curve", 3,
      "shingle first-occurrence agg + its first_doc rollup + per-doc " +
        "count; the stitch join is |docs|-sized — no vocabulary-scale " +
        "join-back of the (doc, shingle) stream"),
    ("e20_session_stats", 2,
      "session build rides e4's one user exchange; both per-day rank " +
        "windows AND the day rollup ride one day exchange"),
    ("e21_power_user_curve", 3,
      "(user,day) distinct + per-user day count + histogram rollup; the " +
        "share/cumulative windows touch <=|calendar days| rows"),
    ("t24_good_turing", 0,
      "all corpus-sized movement lives in the cached shingleSpectrum " +
        "silver (built once per session); the query itself is <=64-row " +
        "arithmetic"),
    ("t25_zipf_slope", 3,
      "one (lang, shingle) agg + per-lang spectrum rollup; fit points " +
        "and moments are log-bounded"),
    ("v26_cell_balance", 2,
      "v4's assignment window + the |cells|-sized rollup; centroids broadcast"),
    ("v27_matryoshka_recall", 5,
      "per-level rank windows (x2 subtrees: approx + truth) + the " +
        "semi-join and |levels|-sized rollup; queries broadcast"),
    ("d23_template_passages", 5,
      "shingle-df agg + freq join + run window/agg on doc_id + toks " +
        "re-join + passage rollup; top-N is TakeOrdered, no sort exchange"),
    ("e22_windowed_funnel", 3,
      "e6's three agg/join rounds on user_id with the window bound " +
        "folded into each stage's min"),
    ("t26_domain_surprisal", 3,
      "cap-bounded fit agg (TakeOrdered, no sort exchange) + the " +
        "(lang, source) distinct-doc scoring agg; LM broadcasts"),
    ("p17_budget_select", 2,
      "(lang, level) token agg + its window re-key, both inside the " +
        "domain-sized plan build; per-doc verdicts broadcast-join + map (p9)"),
    ("a35_customer_rfm", 1,
      "one custkey hash agg + a broadcast 1-row high-water date; " +
        "banding is a pure map — no rank window over the customer base"),
    ("h2_rrf_fusion", 10,
      "corpus-sized work stays inside the two parent rankings (t15's 6 " +
        "+ v1's 1); fusion adds only query-set-sized join + window"),
    ("sk11_bloom_sweep", 2,
      "all five masks probe as literal arrays (map-side, sk8's posture " +
        "x5); build distinct + the stacked ledger rollup are the only " +
        "exchanges — zero probe-sized shuffles"),
    ("e23_cusum", 2,
      "one daily-count hash agg is the data-sized exchange; CUSUM " +
        "windows re-key the |types|x|days| calendar-bounded relation"),
    ("e24_ks_drift", 2,
      "one (type, cent) count agg; CDF windows + the max filter re-key " +
        "the cent-domain-bounded relation"),
    ("a36_gini", 2,
      "(day, store) rollup over the cached silver + the per-day moment " +
        "agg; rank windows ride the day partitioning"),
    ("a37_ewma_control", 1,
      "one day rollup over the cached silver; the 8-lag EWMA window is " +
        "a single-partition pass over |calendar days| rows"),
    ("a38_cohort_triangle", 2,
      "custkey window + the (cohort, age) rollup — the two keyed " +
        "exchanges the triangle needs"),
    ("t27_pmi_collocations", 6,
      "bigram pair agg + totals + two unigram aggs + join re-keys, all " +
        "vocab^2-bounded after the first agg; dims broadcast"),
    ("sk13_kmv_sweep", 2,
      "one distinct (store, sku) agg; rank/count windows + the k-explode " +
        "ride the store partitioning"),
    ("k10_sample_calibration", 2,
      "two map-side-combinable store aggs (exact + sampled); the sample " +
        "predicate is a pushable scan filter, no join"),
    ("t28_kneser_ney", 6,
      "bigram-type agg + discount 1-row + left/right/unigram rollups + " +
        "join re-keys — everything vocab-bounded past the first agg"),
    ("e25_path_mining", 2,
      "sessionize rides e4's one user exchange; the |types|^3 census " +
        "agg is the only other keyed move"),
    ("sk14_kmv_set_algebra", 6,
      "one distinct (seg, user) agg is data-sized; every later window/" +
        "agg touches <= 2k sketch rows"),
    ("v29_centroid_geometry", 3,
      "one (label, dim) integer-sum agg over the exploded grid + the " +
        "label-pair join re-keys; quantizer stats are broadcast literals"),
    ("x11_export_drift_cards", 9,
      "the three parent detectors' gated shapes (e19's 5 + e23's 2 + " +
        "e24's 2... shared scan dedup brings it to 9); the card join is " +
        "|types|-bounded"),
    ("x10_export_table_health", 24,
      "k9's 18 + seven metadata-priced count(*) aggregates folded by " +
        "AQE + the per-table rollup"),
    ("k9_fk_integrity", 18,
      "3 per edge x 6: the child key-count agg (the only data-sized " +
        "move) + key-sized distinct/anti-join plumbing — never a " +
        "row-sized anti-join"),
    ("j9_star_join", 5,
      "fact joins orders on orderkey, meets customer on custkey; " +
        "nation/region broadcast; the group agg is |nations|-bounded"),
    ("j10_shipping_priority", 4,
      "segment dim + two pruned scans meet on orderkey/custkey hashes; " +
        "top-k is TakeOrderedAndProject, never a global sort exchange"),
    ("a39_new_vs_repeat", 3,
      "first-day min rides ONE custkey exchange; the conditional " +
        "distincts expand into a two-phase (d, custkey) agg pair " +
        "whose keys are calendar x customer bounded"),
    ("e26_decay_attribution", 2,
      "e9's interval-join exchange pair; the normalization window " +
        "partitions by (user_id, purchase_id) and rides it"),
    ("t29_heldout_surprisal", 3,
      "t13's shape: capped train-split fit agg + broadcast LM join + " +
        "the 3-row split aggregate"),
    ("e27_type_pagerank", 4,
      "edge/node relations are |types|-bounded localCheckpoints; each " +
        "iteration is a rank-edge join + dst agg over tiny inputs"),
    ("g8_personalized_pagerank", 2,
      "iterations truncate into localCheckpoint leaves; the readout " +
        "is one rank-wdeg node-keyed join + TakeOrderedAndProject - " +
        "never a global sort exchange"),
    ("g9_weighted_sssp", 2,
      "relaxation rounds truncate into the dist silver leaf; the " +
        "readout is the node-sized seed distinct + a broadcast seed " +
        "flag join + TakeOrderedAndProject"),
    ("a40_interpurchase_gaps", 3,
      "lag rides ONE custkey exchange; the bucket rollup (with its " +
        "distinct expand) is <=64 rows"),
    ("v30_rocchio_prf", 6,
      "v1's window + the (nQueries*k)-sized feedback agg/joins; the " +
        "rerank is the broadcast loop + one top-k window"),
    ("a41_discount_elasticity", 1,
      "part dimension broadcasts into the fact scan; one " +
        "|brands|-bounded six-moment aggregate"),
    ("v31_multiprobe_lsh", 2,
      "9x-queries probe relation broadcasts against the bucket join; " +
        "one top-k window exchange"),
    ("e28_absorption", 3,
      "one |types|-bounded mass agg per unrolled step; rank/degree " +
        "relations broadcast over localCheckpoints"),
    ("d24_chunk_dedup", 2,
      "chunk-text freq agg + doc rollup; the join-back rides the " +
        "chunk_text exchange"),
    ("x12_export_retrieval_cards", 8,
      "two materialized query-set-sized parents; the card's four " +
        "derivations are (nQueries*k)-row joins/windows"),
    ("e29_nearest_event", 1,
      "e8's lowering with a second frame riding the SAME user sort — " +
        "bidirectional nearest costs the same one shuffle"),
    ("a42_seasonal_index", 2,
      "two bounded rollups of the cached (store, day) silver joined " +
        "on store_id"),
    ("p19_cluster_split", 0,
      "pure projection over the checkpointed d6 label relation — both " +
        "splits are expressions of ids"),
    ("h3_query_likelihood", 11,
      "t15's df-capped word stats (x subtrees: qterms / candidates / " +
        "tf lookup) + candidate distinct + the (query, doc) score agg " +
        "and top-k window — all candidate-bounded after the posting join"),
    ("j11_small_qty_revenue", 2,
      "per-part agg joined back on the SAME partkey hash (co-keyed); " +
        "part dim broadcasts; brand rollup is |brands|-bounded"),
    ("e30_ab_readout", 4,
      "the user-keyed agg + arm rollup appear once per filter subtree " +
        "(A and B sides) — 2x2 exchanges, all but the user agg 2-row"),
    ("j12_pricing_summary", 1,
      "the Q1 shape: partials collapse every partition to <=6 rows " +
        "before the ONE exchange"),
    ("j13_promo_share", 1,
      "part dim broadcasts; one |months|-bounded aggregate"),
    ("a43_fulfillment_backlog", 4,
      "two month-keyed aggregates (ordered side joins orders on " +
        "orderkey) + the |months|-bounded outer join; cumulative " +
        "windows run over the rollup, never rows"),
    ("v32_ood_scores", 1,
      "v4's broadcast-quantizer assignment window + a pure map"),
    ("t30_stopword_profile", 2,
      "one map-side-combinable (word, doc) distinct agg capped by " +
        "TakeOrdered — the vocabulary never sorts globally"),
    ("e31_rate_drift", 1,
      "bounds broadcast; ONE |types|-bounded count aggregate off one " +
        "scan; rates/z are per-row arithmetic on the rollup"),
    ("d25_dup_inflation", 2,
      "memoized checkpointed d6 labels join doc lengths + one 1-row " +
        "aggregate"),
    ("x13_export_corpus_health", 12,
      "five 1-row parent aggregates cross-joined; every parent shape " +
        "is its own gated plan over memoized silvers"),
    ("j14_market_share", 6,
      "both dim chains broadcast; fact meets orders on the orderkey " +
        "hash (x2: nation agg + year-total subtrees); the share join " +
        "is |years|-bounded"),
    ("j15_top_supplier", 2,
      "one per-store agg off the pruned scan (x2: max subtree); the " +
        "1-row max and the name dim broadcast"),
    ("j20_returned_customers", 3,
      "pruned orders meet the returned fact slice on orderkey; the " +
        "custkey agg's top-k is TakeOrdered; dims broadcast after it"),
    ("j21_trade_flows", 3,
      "both nation chains are broadcast decorations; fact meets " +
        "orders on orderkey; the pair-year aggregate is " +
        "|nations|²·|years|-bounded"),
    ("j22_band_revenue", 1,
      "band conjuncts prune the broadcast part dim and the raw " +
        "quantity column; one 3-row aggregate"),
    ("a45_forecast_revenue", 0,
      "the Q6 probe: one pruned scan collapsed map-side; the final " +
        "merge is a 1-row single-partition exchange, not a hash"),
    ("d26_semdedup", 4,
      "cell-local pairwise join over the checkpointed assignment+" +
        "quality silver, one per-doc existence agg, verdict join-back " +
        "— shuffle keys are cell/doc ids, never corpus-quadratic"),
    ("j17_large_orders", 3,
      "one orderkey agg pruned by the threshold; orders meets it " +
        "co-keyed; the customer decoration broadcasts"),
    ("j18_dormant_customers", 3,
      "the scalar average is a broadcast 1-row; NOT EXISTS lowers to " +
        "a custkey anti-join; the nation rollup is |nations|-bounded"),
    ("j19_split_shipments", 3,
      "the EXISTS test rides the orderkey aggregate (no self-join); " +
        "orders meets it co-keyed; the priority grid is 5 rows"),
    ("v33_mmr_diversify", 0,
      "every greedy-step relation is (nQueries·nCand)-bounded and " +
        "checkpoint-truncated; the corpus is touched only by the v1 " +
        "pool scan inside the first checkpoint"),
    ("p20_interleave", 4,
      "within-domain rank rides one bounded-group window exchange; " +
        "the domain dimension (distinct 2-phase + count) broadcasts"),
    ("e32_removal_effect", 4,
      "all removals advance in ONE |types|²-bounded agg per unrolled " +
        "step (checkpoint-truncated); the conv agg appears twice " +
        "(base + effect subtrees); starts ride one user-keyed agg"),
    ("t31_char_entropy", 2,
      "one map-side-combinable (doc, char) aggregate + the doc " +
        "rollup — alphabet-bounded output at scan-speed input"),
    ("j16_supplier_part_counts", 2,
      "part dim broadcasts; the distinct is the standard two-phase " +
        "pair — the (brand, size, suppkey) triple agg collapses " +
        "map-side, then the |cells|-bounded count"),
    ("j23_order_count_histogram", 3,
      "orders collapse to (custkey, count) map-side first; customers " +
        "meet that aggregate co-keyed; the histogram agg is bounded " +
        "by the max per-customer order count"),
    ("j24_profit_by_nation", 3,
      "the part existence leg is a LEFT SEMI (broadcast at test SF); " +
        "nation decorates supplier broadcast-side; the final agg is " +
        "|nations|x|years|-bounded"),
    ("j25_assortment_churn", 2,
      "the r13 five-wide-op EXCEPT/INTERSECT lowering is rewritten to " +
        "the membership form: one (store, sku) flag-fold over the " +
        "union'd year scans + one store-keyed conditional-count rollup " +
        "— the semantics (and the oracle SQL) stay the set-op algebra"),
    ("j26_demand_surplus", 3,
      "exceptAll lowers to signed per-key counts + replicate on the " +
        "(store, sku) hash; one store rollup"),
    ("a47_trailing_range", 2,
      "rides the cached (store, day) silver; one store exchange " +
        "carries both RANGE-frame windows"),
    ("k11_fuzzy_part_names", 2,
      "(brand, size) cell join — broadcast at test SF, co-keyed hash " +
        "at scale; never all-pairs"),
    ("x14_kpi_melt", 2,
      "one 1-row KPI aggregate over the cached payment silver; " +
        "unpivot is a pure Expand, no movement"),
    ("a48_order_streaks", 2,
      "distinct months + both island aggregates ride one custkey " +
        "exchange; groups are |corpus months|-bounded"),
    ("j27_min_cost_supplier", 5,
      "per-(part,supp) price agg + per-part min + the co-keyed " +
        "winner join + supplier meet + |nations| rollup — every " +
        "exchange on partkey/suppkey hashes, nation broadcast"),
    ("j28_null_safe_recon", 4,
      "both year sides pre-aggregate to (supplier, category) before " +
        "the null-safe FULL join; dimension-bounded relations only"),
    ("j29_waiting_suppliers", 1,
      "Q21's two correlated existential legs decorrelate to semi/anti " +
        "joins that BROADCAST at this SF (at scale AQE shuffles them " +
        "on the shared orderkey); the s_name rollup is the only hash " +
        "exchange"),
    ("d27_dup_spans", 6,
      "one window-key posting agg (collect_set, df-capped) + pair " +
        "distinct; stage 2's runs/spans ride one broadcast-pair + " +
        "(doc_b, shingle) meet, the diff window, and the pair rollup " +
        "— never all-pairs"),
    ("r3_daily_report", 8,
      "every section block aggregates an already-leaf silver per " +
        "sale_date; section joins meet on the |days|-sized date key"),
    ("j30_excess_stock", 2,
      "Q20's correlated availqty scalar decorrelates to a SECOND " +
        "(partkey, suppkey) aggregate co-keyed with the first — the " +
        "two partsupp-grain exchanges and nothing else; parts and " +
        "suppliers arrive by broadcast semi legs"),
    ("j31_important_parts", 0,
      "the part-grain aggregate is a materialized leaf; the global " +
        "scalar HAVING reads it 1-row broadcast — no hash exchange " +
        "in the query plan at all (the one fact aggregate ran inside " +
        "the leaf's checkpoint job)"),
    ("j32_priority_classes", 2,
      "Q12: the flag+year filter prunes before the orderkey shuffle " +
        "join; the 2-row conditional-count aggregate rides one more " +
        "exchange"),
    ("e33_scd2_intervals", 1,
      "ONE user_id exchange serves the change-flag/version windows " +
        "AND the (user, version) island groupBy (clustered-subset " +
        "rule); the interval-closing lead rides the versions relation"),
    ("e34_state_cdc", 1,
      "both as-of snapshots come out of ONE scan and ONE user " +
        "exchange as conditional max-of-struct partials; the diff is " +
        "a pure projection — no per-snapshot pass, no outer join"),
    ("e35_cuped_readout", 4,
      "one user-keyed conditional moment agg is the data-sized move; " +
        "arm rollup, pooled-theta rollup and the broadcast-back " +
        "re-key all touch <= 2 rows"),
    ("er1_fs_linkage", 2,
      "blocked candidate joins are co-keyed hash (broadcast at test " +
        "SF); the m/u model is two 1-row broadcasts; scoring is a " +
        "pure projection and the readout a 3-row aggregate"),
    ("k13_late_restatement", 2,
      "two conditional grain-keyed aggregates off ONE scan; the " +
        "base+delta merge is a dimension-sized full-outer join; " +
        "restated totals are pure projection"),
    ("k14_kmv_restatement", 2,
      "k13's shape with KMV partials: collect_set caps at k right " +
        "after each grain agg; merge = dimension-sized array union"),
    ("p21_dsir_select", 0,
      "one-pass bucket model (conditional sums) broadcasts to the " +
        "per-doc scoring join; ranking rides GlobalRank's RANGE " +
        "partitioning — zero hash exchanges"),
    ("sk15_histogram_quantiles", 2,
      "1-row (min,max) domain agg + the (store,bin) cell agg whose " +
        "state is <= |stores|*bins regardless of input rows; " +
        "quantile read-off windows over <= bins rows per store"),
    ("sk16_merged_quantiles", 2,
      "shared cell build + the bins-bounded merge agg; the " +
        "cumulative window runs over <= bins rows"),
    ("t30_gopher_rubric", 3,
      "per-n (doc, gram) counts are map-side-combinable and ride " +
        "doc-keyed exchanges over the tokenize-once silver; the " +
        "4-row-per-doc pivot re-keys dimension-sized data"),
    ("v34_pca_power", 0,
      "the fact-sized long form is localCheckpointed once; iterates/" +
        "rescales/sign broadcast — every per-iteration exchange runs " +
        "inside checkpoint jobs, none in the consumer plan"),
    ("g1_triangle_census", 5,
      "everything downstream of the memoized co-pair leaf is " +
        "EDGE-sized: degree agg, the lo-keyed wedge self-join and the " +
        "(h1,h2) closing semi join; oriented fan-out caps wedge rows " +
        "at O(m^1.5) regardless of hub skew"),
    ("g2_triangle_doulion", 5,
      "g1's shape on the hash-sampled edge subset — the sample " +
        "predicate is map-side on the pair leaf, never a separate pass"),
    ("smp1_stratified_sample", 1,
      "the alloc is a dimension-sized memoized leaf joined by " +
        "broadcast; the only hash exchange is the per-stratum rank " +
        "window, whose rank<=budget filter runs in the heap regime"),
    ("smp3_temperature_mix", 1,
      "smp1's shape under isqrt weights — same single stratum-keyed " +
        "exchange"),
    ("smp2_weighted_sample", 0,
      "ticket min is a fused per-row map; the global k-draw is " +
        "TakeOrderedAndProject (per-partition heaps merged on the " +
        "driver) — zero shuffles"),
    ("er2_golden_record", 4,
      "survivorship is custkey-keyed throughout: name and balance " +
        "rank-1 windows, the (custkey, segment) vote count and its " +
        "custkey window — four row-sized exchanges, assembly joins " +
        "ride them (broadcast at test SF)"),
    ("s9_orc_roundtrip", 2,
      "the ORC read feeds one two-phase distinct-date rollup: " +
        "(store, date) then store"),
    ("sk17_bitmap_distinct", 2,
      "the (store, bucket) bitmap table is a memoized leaf; per-store " +
        "and company grains each re-key it once — bitmap-sized, " +
        "never row-sized"),
    ("g3_assoc_rules", 3,
      "pair and basket relations are memoized leaves; the consumers " +
        "pay one sku-keyed support agg and the two-step basket count; " +
        "support decoration joins broadcast the item dimension and the " +
        "readout is TakeOrderedAndProject"),
    ("k16_purge_audit", 4,
      "cohort flag is a pure map on orders; ONE orderkey-keyed join " +
        "decorates lineitem; each table folds once into its partition " +
        "grain — the readouts aggregate partition-sized relations"),
    ("a50_acf", 3,
      "store-day rollup + the date-grain company fold are the row-" +
        "sized moves; all 14 lags ride ONE calendar-bounded window " +
        "pass and the lag-grain moment agg has 14 output rows"),
    ("a52_changepoint", 3,
      "candidates ARE the calendar-bounded series: one window pass " +
        "builds rank/prefix/totals, gain is a pure map, the argmax a " +
        "1-row sort-limit; the row-sized folds are the two rollups"),
    ("a51_benford_audit", 1,
      "narrow map to the first digit, one 9-group hash agg; total and " +
        "expectation arrive by broadcast"),
    ("er4_blocking_audit", 10,
      "the same two co-keyed blocked joins er1 pays, each reduced to " +
        "a pair-distinct + 1-row count — candidate-set-sized, n^2 " +
        "only ever a denominator"),
    ("k20_fd_audit", 18,
      "three exchanges per FD candidate: the lhs-keyed two-phase " +
        "count-distinct and its 1-row rollup — each bounded by the " +
        "audited table's key cardinality, no joins anywhere"),
    ("a56_remainder_anomalies", 3,
      "runs entirely over the a55 leaf: the two positional medians " +
        "are single-partition rank windows over the calendar-bounded " +
        "series, arriving back as 1-row broadcasts"),
    ("a57_price_index", 4,
      "one (sku, month) rollup of the fact table is the only row-" +
        "sized move; base month is a 1-row broadcast, the matched " +
        "join and index agg are dimension-sized on sku/month"),
    ("a55_seasonal_decompose", 2,
      "the date-grain series agg is the only row-sized move; the MA/" +
        "rank windows are single-partition over the calendar-bounded " +
        "series and the DOW means re-key <= |dates| rows once"),
    ("e36_hazard_table", 5,
      "one user-keyed exchange for the distinct-day lead window (two-" +
        "phase distinct); the duration histogram is <= 31 groups, the " +
        "grid join broadcasts, and the at-risk cumsum runs over the " +
        "31-row grid"),
    ("g4_kcore", 7,
      "edge universe and the peeled core are memoized leaves (peel " +
        "rounds run at build, edge-sized, driver carries only a " +
        "count); the consumer census is degree aggs + two core semi " +
        "joins — all edge- or core-sized, nothing quadratic"),
    ("k19_layout_advisor", 3,
      "one RAW-column fact agg to the finest cross-grain is the only " +
        "row-sized move; the 4-way layout stack, its rollup and the " +
        "(layout, predicate) readout all run over the calendar/" +
        "catalog-bounded cell relation"),
    ("t33_nb_classifier", 14,
      "the only row-sized moves are the train count aggs and the " +
        "test-token tf agg + model join re-key; the rest of the " +
        "exchanges live inside the 5-row class dims, the 1-row " +
        "scalars, the priors and the |langs|^2 confusion rollup — " +
        "all class/vocab-bounded, none fact-bounded"),
    ("a54_theil_sen", 2,
      "everything is store_id-keyed off the silver leaf: the trailing-" +
        "window rank (heap regime via WindowGroupLimit), the pair " +
        "self-join (broadcast at test SF) and the median rank window — " +
        "pairs are calendar-bounded at <=1,770 rows per store"),
    ("t32_readability", 1,
      "per-doc regexp/token counts are a pure map over the tokenize-" +
        "once silver; ONE (source, lang) hash agg with map-side " +
        "partials is the only move"),
    ("er3_entity_clusters", 2,
      "the link edges and the CC labels are memoized leaves (the " +
        "closure's per-round joins run at build, rounds = component " +
        "diameter); the consumer pays two cluster-bounded aggregates"),
    ("k17_compaction_plan", 2,
      "the (day, store) file inventory is the ONLY row-sized fold; " +
        "the pack window and final rollup re-key once to the " +
        "(month, store) partition grain over metadata-sized rows"),
    ("k18_expectation_suite", 2,
      "row-level checks are single-partition conditional aggs " +
        "(map-side partials); the only hash exchanges are the " +
        "uniqueness key-grain fold and the month-grain continuity fold"),
    ("sk19_native_quantiles", 1,
      "the anchor's rank window and the GK+rank-hit agg ride ONE " +
        "store-keyed exchange; GK state is O(1/eps log n) per store"),
    ("sk18_native_hll", 2,
      "one store-keyed sketch agg (fixed 2^lgK state, map-side " +
        "combinable); company direct/union rows are 1-row aggregates; " +
        "the exact column rides sk17's memoized bitmap leaf"),
    ("v35_jl_projection", 5,
      "the packed (vec_id, xq, y) projection is a memoized leaf " +
        "(built once, not once per stride subtree); the stride " +
        "pairings are row-sized self-joins on a computed key + the " +
        "2-row readout agg"),
    ("a58_brand_skyline", 1,
      "skyline WITHOUT the n^2 self-join: one brand-keyed exchange, " +
        "both dominance windows and the frontier rank ride it — " +
        "O(n log n) vs the oracle's NOT EXISTS"),
    ("a59_store_mlr", 1,
      "the 3x3 Cramer solve is pure projection over moment rows: one " +
        "store-keyed exchange carries the day-index window AND the " +
        "9-moment aggregate; no joins, no iteration"),
    ("g5_link_prediction", 4,
      "candidates ONLY through capped wedges (apex self-join + pair " +
        "agg + edge anti join); the node-degree dimension is a " +
        "memoized leaf arriving ONLY by broadcast"),
    ("sk20_ams_f2", 3,
      "12-group tug-of-war partial agg (sketch state = 12 longs " +
        "total, map-side combinable) + the exact-F2 twin's key agg; " +
        "nothing key-cardinality-sized beyond the exact anchor"),
    ("a60_did_promo", 2,
      "all four DiD cells are ONE conditional-agg pass over the " +
        "memoized store-day silver; the pre-trend leg aggregates to " +
        "<= 2x28 group-day rows before its 2-row moment agg"),
    ("k22_profile_drift", 4,
      "the two-month slice shuffles ONCE at (col, batch, value) " +
        "grain; batch stats, distincts, and new/gone all derive from " +
        "that leaf; everything after is 5-row-bounded"),
    ("d29_incremental_dedup", 4,
      "delta probes the snapshot's two bounded indexes: snap-text " +
        "distinct, the two per-doc signature aggregates, and the " +
        "(band, bandkey) index distinct — the indexes then arrive at " +
        "the delta by broadcast semi joins, the corpus never " +
        "self-joins"),
    ("a63_cube_margins", 2,
      "the fact table aggregates ONCE to (store, payment) grain; the " +
        "CUBE's Expand and its grouping-set aggregate run over that " +
        "dimension-bounded relation — cubing the raw fact would 4x " +
        "the shuffle input"),
    ("t34_vocab_growth", 3,
      "one vocab-grain first-occurrence min + two 10-row decile " +
        "aggregates; the cumulative window is a 10-row single " +
        "partition, never a corpus sort"),
    ("v38_delta_index", 3,
      "the snapshot assignment's one vec_id window exchange + the " +
        "probed-cell meet; the delta side-table and the query set " +
        "arrive ONLY by broadcast — neither ever shuffles the corpus"),
    ("p22_domain_reweight", 3,
      "the t13 surprisal pipeline's vocab + per-doc exchanges and ONE " +
        "source-grain rollup (cached: three downstream consumers read " +
        "the 5-row relation, not the corpus); everything after is " +
        "|sources|-sized"),
    ("k28_column_lineage", 0,
      "pure driver-side plan traversal — the lineage relation is a " +
        "local table, zero data read, zero exchanges"),
    ("v36_als_recs", 8,
      "per-customer ridge solves ride the custkey exchanges (ratings " +
        "rollup + moment agg + rec window + final stitch); brand " +
        "factors and the 25-row catalog arrive ONLY by broadcast — " +
        "nothing customer x catalog ever shuffles")
  )

  /** The corpus/doc side must meet its small side via broadcast — a plan
    * that degrades to a shuffled sort-merge join moves the full corpus. */
  Seq("p9_mix_apply", "d12_contamination").foreach { key =>
    test(s"$key: small side arrives by broadcast join") {
      val plan = SparkEntry.queries(key)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$key no longer broadcast-joins its small side")
    }
  }

  bounds.foreach { case (key, max, claim) =>
    test(s"$key: <= $max hash exchange(s) — $claim") {
      val n = hashExchanges(key)
      assert(n <= max,
        s"$key now has $n hash exchanges (claim: $claim) — a shuffle crept in")
    }
  }

  test("j30_excess_stock: the supplier filter is a SEMI join, never an anti-join") {
    val plan = SparkEntry.queries("j30_excess_stock")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      "Q20's IN must lower to a semi join")
    assert(!plan.contains("LeftAnti"),
      "a row-sized anti-join crept into the Q20 shape")
  }
}
