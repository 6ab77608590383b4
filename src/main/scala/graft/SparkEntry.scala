package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator row of SURVEY.md §2;
  * [[oracleSql]] carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01. Column aliases and ORDER BY are kept identical on both
  * sides (see conventions in [[graft.queries.Relational]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The COMPLETE TPC-H Q1 — pushed filter, partial+final hash aggregate,
    * exact-integer money terms. */
  def entry(spark: SparkSession): DataFrame =
    Relational.tpchQ1Full(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> (Relational.filterProject _),
    "q02_agg_groupby"    -> (Relational.aggGroupBy _),
    "q03_join_broadcast" -> (Relational.joinBroadcast _),
    "q04_join_multi"     -> (Relational.joinMulti _),
    "q05_topk"           -> (Relational.topK _),
    "q06_anti_join"      -> (Relational.antiJoin _),
    "q07_semi_join"      -> (Relational.semiJoin _),
    "q08_outer_join"     -> (Relational.outerJoin _),
    "q09_window_lag"     -> (Windows.lagChange _),
    "q10_window_rank"    -> (Windows.rankTopOrders _),
    "q11_window_movavg"  -> (Windows.movingAvg _),
    "q12_window_cumsum"  -> (Windows.cumulativeSum _),
    "q13_union_distinct" -> (SetsAndAggs.unionDistinct _),
    "q14_intersect"      -> (SetsAndAggs.intersectKeys _),
    "q15_except"         -> (SetsAndAggs.exceptKeys _),
    "q16_rollup"         -> (SetsAndAggs.rollupAgg _),
    "q17_cube"           -> (SetsAndAggs.cubeAgg _),
    "q18_count_distinct" -> (SetsAndAggs.countDistinctParts _),
    "q19_approx_distinct" -> (SetsAndAggs.approxDistinct _),
    "q20_percentiles"    -> (SetsAndAggs.percentiles _),
    "q21_conditional_agg" -> (Scalars.conditionalAgg _),
    "q22_date_functions" -> (Scalars.dateFunctions _),
    "q23_string_functions" -> (Scalars.stringFunctions _),
    "q24_json_extract"   -> (Scalars.jsonExtract _),
    "q25_pivot"          -> (Scalars.pivotWide _),
    "q26_math_functions" -> (Scalars.mathFunctions _),
    "q27_asof_join"      -> (Temporal.asOfJoin _),
    "q28_range_join"     -> (Advanced.rangeJoin _),
    "q29_sortmerge_join" -> (Advanced.sortMergeJoin _),
    "q30_upsert_ignore"  -> (Advanced.upsertIgnore _),
    "q31_candle_agg"     -> (Advanced.candleAgg _),
    "q32_explode_tokens" -> (Advanced.explodeTokens _),
    "q33_sessionize"     -> (Temporal.sessionize _),
    "q34_window_tumbling" -> (Temporal.tumblingWindow _),
    "q35_window_sliding" -> (Temporal.slidingWindow _),
    "q36_session_window" -> (Temporal.sessionWindow _),
    "q37_exact_dedup"    -> (NorthStar.exactDedup _),
    "q38_jaccard_pairs"  -> (NorthStar.jaccardPairs _),
    "q39_minhash_lsh"    -> (NorthStar.minhashLsh _),
    "q40_simhash_pairs"  -> (NorthStar.simhashPairs _),
    "q41_cosine_topk"    -> (NorthStar.cosineTopK _),
    "q42_knn_join"       -> (NorthStar.knnJoin _),
    "q43_ann_topk"       -> (NorthStar.annTopK _),
    "q44_lang_id"        -> (NorthStar.langId _),
    "q45_quality_score"  -> (NorthStar.qualityScore _),
    "q46_token_counts"   -> (NorthStar.tokenCounts _),
    "q47_fingerprint"    -> (NorthStar.fingerprint _),
    "q48_multimodal"     -> (NorthStar.multimodalBytes _),
    "q49_grouping_sets"  -> (SqlSurface.groupingSets _),
    "q50_sql_tpch_q3"    -> (SqlSurface.sqlTpchQ3 _),
    "q51_window_range_frame" -> (Windows.rangeFrame _),
    "q52_tfidf"          -> (NorthStar.tfidfTop _),
    "q53_ivf_topk"       -> (NorthStar.ivfTopK _),
    "q54_correlated_subquery" -> (Relational.correlatedSubquery _),
    "q55_scalar_subquery" -> (Relational.scalarSubquery _),
    "q56_decimal_agg"    -> (Relational.decimalAgg _),
    "q57_corpus_funnel"  -> (NorthStar.corpusFunnel _),
    "q58_array_functions" -> (Scalars.arrayFunctions _),
    "q59_unpivot"        -> (Scalars.unpivotLong _),
    "q60_window_first_last" -> (Windows.firstLastValue _),
    "q61_date_arithmetic" -> (Scalars.dateArithmetic _),
    "q62_null_functions" -> (Scalars.nullFunctions _),
    "q63_string_functions2" -> (Scalars.stringFunctions2 _),
    "q64_cc_components"  -> (NorthStar.ccComponents _),
    "q65_label_centroids" -> (NorthStar.labelCentroids _),
    "q66_window_distribution" -> (Windows.distributionFunctions _),
    "q67_tpch_q1_full"   -> (Relational.tpchQ1Full _),
    "q68_map_functions"  -> (Scalars.mapFunctions _),
    "q69_regexp_extract" -> (Scalars.regexpExtract _),
    "q70_histogram"      -> (SetsAndAggs.binnedHistogram _),
    "q71_cosine_pairs"   -> (NorthStar.cosinePairs _),
    "q72_asof_native"    -> (Temporal.asOfJoinNative _),
    "q73_salted_join"    -> (Relational.saltedJoinAgg _),
    "q74_string_agg"     -> (SetsAndAggs.stringAgg _),
    "q75_stats_agg"      -> (SetsAndAggs.statsAgg _),
    "q76_gap_fill"       -> (Temporal.gapFill _),
    "q77_tpch_q5"        -> (Relational.tpchQ5 _),
    "q78_tpch_q7"        -> (Relational.tpchQ7 _),
    "q79_multiset_ops"   -> (SetsAndAggs.multisetOps _),
    "q80_tpch_q9"        -> (Relational.tpchQ9 _),
    "q81_tpch_q18"       -> (Relational.tpchQ18 _),
    "q82_doc_chunks"     -> (NorthStar.docChunks _),
    "q83_quantize_int8"  -> (NorthStar.quantizeEmbeddings _),
    "q84_tpch_q10"       -> (Relational.tpchQ10 _),
    "q85_asof_forward"   -> (Temporal.asOfForwardJoin _),
    "q86_split_assign"   -> (NorthStar.splitAssign _),
    "q87_tpch_q14"       -> (Relational.tpchQ14 _),
    "q88_latest_per_key" -> (Relational.latestPerKey _),
    "q89_tpch_q4"        -> (Relational.tpchQ4 _),
    "q90_tpch_q6"        -> (Relational.tpchQ6 _),
    "q91_tpch_q13"       -> (Relational.tpchQ13 _),
    "q92_event_funnel"   -> (Temporal.eventFunnel _),
    "q93_retention"      -> (Temporal.retentionCurve _),
    "q94_trailing_range" -> (Windows.trailingHourCount _),
    "q95_snapshot_delta" -> (Relational.snapshotDelta _),
    "q96_agg_of_agg"     -> (Relational.aggOfAgg _),
    "q97_fuzzy_match"    -> (Relational.fuzzyMatch _),
    "q98_multi_distinct" -> (SetsAndAggs.multiDistinct _),
    "q99_topk_no_window" -> (SetsAndAggs.topKPerGroupNoWindow _),
    "q100_sql_multi_cte" -> (SqlSurface.sqlMultiCte _),
    "q101_tpch_q8"       -> (Relational.tpchQ8 _),
    "q102_tpch_q12"      -> (Relational.tpchQ12 _),
    "q103_tpch_q17"      -> (Relational.tpchQ17 _),
    "q104_tpch_q19"      -> (Relational.tpchQ19 _),
    "q105_tpch_q21"      -> (Relational.tpchQ21 _),
    "q106_tpch_q22"      -> (Relational.tpchQ22 _),
    "q107_repetition"    -> (NorthStar.repetitionScore _),
    "q108_contamination" -> (NorthStar.contamination _),
    "q109_domain_mix"    -> (NorthStar.domainMixing _),
    "q110_incr_dedup"    -> (NorthStar.incrementalDedup _),
    "q111_bloom_prescreen" -> (NorthStar.bloomShingles _),
    "q112_cms_tokens"    -> (NorthStar.cmsTokenCounts _),
    "q113_zorder_code"   -> (Advanced.zorderCode _),
    "q114_outlier_zscore" -> (SetsAndAggs.outlierZscore _),
    "q115_bigram_lm"     -> (NorthStar.bigramLm _),
    "q116_token_entropy" -> (NorthStar.tokenEntropy _),
    "q117_containment"   -> (NorthStar.containmentPairs _),
    "q118_vocab_coverage" -> (NorthStar.vocabCoverage _),
    "q119_dup_chunks"    -> (NorthStar.dupChunks _),
    "q120_lang_vocab90"  -> (NorthStar.langVocab90 _),
    "q121_domain_cap"    -> (NorthStar.domainCap _),
    "q122_range_bucketed" -> (Temporal.rangeJoinBucketed _),
    "q123_session_overlap" -> (Temporal.sessionOverlap _),
    "q124_doc_perplexity" -> (NorthStar.docPerplexity _),
    "q125_novel_bigrams" -> (NorthStar.novelBigrams _),
    "q126_source_kl"     -> (NorthStar.sourceKl _),
    "q127_pack_bins"     -> (NorthStar.packSequences _),
    "q128_budget_cut"    -> (NorthStar.tokenBudgetCut _),
    "q129_mixture_sample" -> (NorthStar.mixtureSample _),
    "q130_chunk_rewrite" -> (NorthStar.chunkRewrite _),
    "q131_semdedup"      -> (NorthStar.semDedup _),
    "q132_pii_scrub"     -> (NorthStar.piiScrub _),
    "q133_frame_sample"  -> (NorthStar.frameSample _),
    "q134_resize_media"  -> (NorthStar.resizeStub _),
    "q135_gopher_rules"  -> (NorthStar.gopherRules _),
    "q136_kmeans"        -> (NorthStar.kmeans _),
    "q137_semdedup_trained" -> (NorthStar.semDedupTrained _),
    "q138_ivf_kmeans"    -> (NorthStar.ivfKmeans _),
    "q139_sql_functions" -> (SqlSurface.sqlCustomFunctions _),
    "q140_approx_percentile" -> (SetsAndAggs.approxPercentiles _),
    "q141_kmeans_farthest" -> (NorthStar.kmeansFarthest _),
    "q142_kmeans_minibatch" -> (NorthStar.kmeansMiniBatch _),
    "q143_kmeans_pp"     -> (NorthStar.kmeansPlusPlus _),
    "q144_bm25"          -> (NorthStar.bm25Rank _),
    "q145_quality_lr"    -> (NorthStar.qualityLr _),
    "q146_pq_codes"      -> (NorthStar.pqCodes _),
    "q147_bpe_merges"    -> (NorthStar.bpeMerges _),
    "q148_decontaminate" -> (NorthStar.decontaminate _),
    "q149_weighted_sample" -> (NorthStar.weightedSample _),
    "q150_source_quota"  -> (NorthStar.sourceQuota _),
    "q151_stratified_sample" -> (NorthStar.stratifiedSample _),
    "q152_bpe_encode"    -> (NorthStar.bpeEncode _),
    "q153_pagerank"      -> (NorthStar.pageRank _),
    "q154_temp_sample"   -> (NorthStar.temperatureSample _),
    "q155_col_profile"   -> (NorthStar.columnProfile _),
    "q156_ivfpq"         -> (NorthStar.ivfPqTopK _),
    "q157_bpe_tokenize"  -> (NorthStar.bpeTokenize _),
    "q158_semdedup_salted" -> (NorthStar.semDedupSalted _),
    "q159_repeated_spans" -> (NorthStar.repeatedSpans _),
    "q160_kmv_overlap"   -> (NorthStar.kmvOverlap _),
    "q161_curation_pipeline" -> (NorthStar.curationPipeline _),
    "q162_int8_topk"     -> (NorthStar.int8TopK _),
    "q163_chunk_bpe"     -> (NorthStar.chunkBpe _),
    "q164_hybrid_rrf"    -> (NorthStar.hybridRrf _),
    "q165_canonical_reps" -> (NorthStar.canonicalReps _),
    "q166_hard_negatives" -> (NorthStar.hardNegatives _),
    "q167_ivf_recall"    -> (NorthStar.ivfRecall _),
    "q168_bpe_fertility" -> (NorthStar.bpeFertility _),
    "q169_media_knn"     -> (NorthStar.mediaKnn _),
    "q170_balanced_shards" -> (NorthStar.balancedShards _),
    "q171_pq_recall"     -> (NorthStar.pqRecall _),
    "q172_source_overlap" -> (NorthStar.sourceOverlap _),
    "q173_dedup_evidence" -> (NorthStar.dedupEvidence _),
    "q174_lexical_cosine" -> (NorthStar.lexicalCosine _),
    "q175_curriculum"    -> (NorthStar.curriculum _),
    "q176_kmv_merge"     -> (NorthStar.kmvIncremental _),
    "q177_binary_topk"   -> (NorthStar.binaryTopK _),
    "q178_scd2"          -> (NorthStar.scd2Versions _),
    "q179_group_trend"   -> (NorthStar.userTrend _),
    "q180_exact_quantiles" -> (NorthStar.priceQuantiles _),
    "q181_prototype_prune" -> (NorthStar.prototypes _),
    "q182_cohort_retention" -> (NorthStar.retention _),
    "q183_funnel"        -> (NorthStar.signupFunnel _),
    "q184_key_skew"      -> (NorthStar.orderKeySkew _),
    "q185_binary_knn"    -> (NorthStar.binaryKnn _),
    "q186_codebook_drift" -> (NorthStar.codebookDrift _),
    "q187_join_estimate" -> (NorthStar.joinSize _),
    "q188_streaks"       -> (NorthStar.streaks _),
    "q189_rolling_dau"   -> (NorthStar.rollingDau _),
    "q190_stored_quantiles" -> (NorthStar.custkeyQuantiles _),
    "q191_rolling_dau_hll" -> (NorthStar.rollingDauApprox _),
    "q192_scd2_merge"    -> (NorthStar.scd2Merged _),
    "q193_funnel_onepass" -> (NorthStar.funnelOnePass _),
    "q194_zorder_optimize" -> (NorthStar.zorderOptimize _),
    "q195_join_strategy" -> (NorthStar.joinStrategies _),
    "q196_dau_state"     -> (NorthStar.rollingDauState _),
    "q197_embedding_psi" -> (NorthStar.embeddingPsi _),
    "q198_funnel_window" -> (NorthStar.funnelWindow _),
    "q199_attribution"   -> (NorthStar.attribution _),
    "q200_matryoshka"    -> (NorthStar.matryoshkaRecall _),
    "q201_error_cusum"   -> (NorthStar.errorCusum _),
    "q202_data_contract" -> (NorthStar.ordersContract _),
    "q203_frame_dedup"   -> (NorthStar.frameDedupQ _),
    "q204_corr_matrix"   -> (NorthStar.lineitemCorr _),
    "q205_funnel_timing" -> (NorthStar.funnelTimes _),
    "q206_resample_ffill" -> (NorthStar.resampleUsers _),
    "q207_drawdown"      -> (NorthStar.revenueDrawdown _),
    "q208_equi_hist"     -> (NorthStar.partkeyHistogram _),
    "q209_fuzzy_pairs"   -> (NorthStar.fuzzyDups _),
    "q210_ab_test"       -> (NorthStar.abReadout _),
    "q211_rfm_segments"  -> (NorthStar.rfm _),
    "q212_fuzzy_audit"   -> (NorthStar.fuzzyAudit _),
    "q213_ab_test_k"     -> (NorthStar.abReadoutK _),
    "q214_engagement_gini" -> (NorthStar.engagementGini _),
    "q215_lang_source_mi" -> (NorthStar.langSourceMi _),
    "q216_fuzzy_two_sided" -> (NorthStar.fuzzyDupsTwoSided _),
    "q217_revenue_acf"   -> (NorthStar.revenueAcf _),
    "q218_dup_triangles" -> (NorthStar.dupGraphTriangles _),
    "q219_naive_backtest" -> (NorthStar.revenueNaiveBacktest _),
    "q220_group_quantiles" -> (NorthStar.typeValueQuantiles _),
    "q221_event_flow"    -> (NorthStar.eventFlow _),
    "q222_gap_quantiles" -> (NorthStar.eventGapQuantiles _),
    "q223_user_value_sketch" -> (NorthStar.userValueSketch _),
    "q224_stickiness"    -> (NorthStar.dauMauStickiness _),
    "q225_cohort_ltv"    -> (NorthStar.ltvCurve _),
    "q226_mmr_rerank"    -> (NorthStar.mmrPage _),
    "q227_churn_survival" -> (NorthStar.churnSurvival _),
    "q228_theil_sen"     -> (NorthStar.revenueTheilSen _),
    "q229_benford"       -> (NorthStar.orderBenford _),
    "q230_session_paths" -> (NorthStar.sessionPaths _),
    "q231_resample_interp" -> (NorthStar.resampleInterpUsers _),
    "q232_fano_burstiness" -> (NorthStar.typeBurstiness _),
    "q233_type_affinity" -> (NorthStar.typeAffinity _),
    "q234_dup_assortativity" -> (NorthStar.dupGraphAssortativity _),
    "q235_value_sketch_fine" -> (NorthStar.userValueSketchFine _),
    "q236_fuzzy_audit_2s" -> (NorthStar.fuzzyAuditTwoSided _),
    "q237_sorted_neighborhood" -> (NorthStar.sortedNeighborhood _),
    "q238_trimmed_mean"  -> (NorthStar.typeTrimmedMean _),
    "q239_source_hhi"    -> (NorthStar.langSourceHHI _),
    "q240_percent_rank"  -> (NorthStar.docLengthPercentiles _),
    "q241_welch_t"       -> (NorthStar.welchRevenue _),
    "q242_mann_whitney"  -> (NorthStar.mannWhitneyRevenue _),
    "q243_chi_square"    -> (NorthStar.langSourceChi2 _),
    "q244_basket_pairs"  -> (NorthStar.partBasketPairs _),
    "q245_weekday_profile" -> (NorthStar.revenueWeekday _),
    "q246_mad_outliers"  -> (NorthStar.revenueOutlierDays _),
    "q247_funnel_by_arm" -> (NorthStar.funnelArms _),
    "q248_mmr_batch"     -> (NorthStar.mmrServing _),
    "q249_group_mode"    -> (NorthStar.typeValueMode _),
    "q250_dup_kcore"     -> (NorthStar.dupGraphKCore _),
    "q251_ks_test"       -> (NorthStar.ksRevenue _),
    "q252_kendall_tau"   -> (NorthStar.revenueVolumeKendall _),
    "q253_spearman_rho"  -> (NorthStar.revenueVolumeSpearman _),
    "q254_lf_vote"       -> (NorthStar.qualityLfVote _),
    "q255_cohen_kappa"   -> (NorthStar.qualityLfKappa _),
    "q256_auc_exact"     -> (NorthStar.lengthAucEnglish _),
    "q257_calibration"   -> (NorthStar.lengthCalibration _),
    "q258_roc_points"    -> (NorthStar.lengthRocPoints _),
    "q259_fleiss_kappa"  -> (NorthStar.qualityLfFleiss _),
    "q260_snapshot_diff" -> (NorthStar.documentSnapshotDiff _),
    "q261_kruskal"       -> (NorthStar.revenueKruskal _),
    "q262_mcnemar"       -> (NorthStar.qualityLfMcnemar _),
    "q263_cochran_q"     -> (NorthStar.qualityLfCochran _),
    "q264_weighted_vote" -> (NorthStar.qualityLfWeightedVote _),
    "q265_length_psi"    -> (NorthStar.lengthDriftPsi _),
    "q266_winsor_mean"   -> (NorthStar.typeWinsorizedMean _),
    "q267_ivf_append"    -> (NorthStar.ivfAppendServe _),
    "q268_lf_conflicts"  -> (NorthStar.qualityLfConflicts _),
    "q269_revenue_ewma"  -> (NorthStar.revenueEwma _),
    "q270_ewma_append"   -> (NorthStar.revenueEwmaAppend _),
    "q271_cuped"         -> (NorthStar.revenueCuped _),
    "q272_ewma_chart"    -> (NorthStar.revenueEwmaChart _),
    "q273_revenue_holt"  -> (NorthStar.revenueHolt _),
    "q274_ate_stratified" -> (NorthStar.revenueAteStratified _),
    "q275_linkage_weights" -> (NorthStar.customerLinkageWeights _),
    "q276_linkage_pairs" -> (NorthStar.customerLinkagePairs _),
    "q277_holt_append"   -> (NorthStar.revenueHoltAppend _),
    "q278_isotonic_cal"  -> (NorthStar.lengthIsotonic _),
    "q279_linkage_em"    -> (NorthStar.customerLinkageEm _),
    "q280_linkage_entities" -> (NorthStar.customerLinkageEntities _),
    "q281_isotonic_apply" -> (NorthStar.lengthIsotonicApply _),
    "q282_linkage_tf" -> (NorthStar.customerLinkageTf _),
    "q284_block_audit" -> (NorthStar.customerBlockAudit _),
    "q285_krippendorff" -> (NorthStar.qualityKrippendorff _),
    "q286_diff_in_diff" -> (NorthStar.revenueDiffInDiff _),
    "q287_dawid_skene" -> (NorthStar.qualityDawidSkene _),
    "q288_ds_posterior" -> (NorthStar.qualityDsPosterior _),
    "q289_holt_winters" -> (NorthStar.revenueHoltWinters _),
    "q283_hw_backtest" -> (NorthStar.revenueHwBacktest _),
    "q290_hw_append" -> (NorthStar.revenueHwAppend _),
    "q291_linkage_evidence" -> (NorthStar.customerLinkageEvidence _),
    "q292_linkage_leveled" -> (NorthStar.customerLinkageLeveled _),
    "q293_log_rank" -> (NorthStar.churnLogRank _),
    "q294_sprt" -> (NorthStar.purchaseSprt _),
    "q295_changepoint" -> (NorthStar.valueChangepoint _),
    "q296_hits" -> (NorthStar.supplierHits _),
    "q297_ds_state" -> (NorthStar.qualityDsFromState _),
    "q298_lpa_communities" -> (NorthStar.dupCommunities _),
    "q299_vocab_growth" -> (NorthStar.corpusVocabGrowth _),
    "q300_positional_attribution" -> (NorthStar.purchaseAttribution _),
    "q301_rmst" -> (NorthStar.churnRmst _),
    "q302_ranking_metrics" -> (NorthStar.embeddingRankingEval _),
    "q303_bootstrap_ci" -> (NorthStar.orderValueCi _),
    "q304_keyness" -> (NorthStar.sourceKeyness _),
    "q305_ds_multiclass" -> (NorthStar.qualityDawidSkeneMulti _),
    "q306_sprt_append" -> (NorthStar.purchaseSprtAppend _),
    "q307_vocab_state" -> (NorthStar.corpusVocabFromState _),
    "q308_nelson_aalen" -> (NorthStar.churnCumHazard _),
    "q309_ivf_ranking" -> (NorthStar.ivfRankingEval _),
    "q310_fh_logrank" -> (NorthStar.churnWeightedLogRank _),
    "q311_survival_state" -> (NorthStar.churnSurvivalFromState _),
    "q312_mann_kendall" -> (NorthStar.revenueMannKendall _),
    "q313_calibration_error" -> (NorthStar.lengthCalibrationError _),
    "q314_stratified_sample" -> (NorthStar.perLangReviewSample _),
    "q315_zipf_slope" -> (NorthStar.corpusZipfSlope _),
    "q316_hits_capped" -> (NorthStar.supplierHitsCapped _),
    "q317_brier" -> (NorthStar.lengthBrier _),
    "q318_ab_mde" -> (NorthStar.purchaseMde _),
    "q319_ljung_box" -> (NorthStar.revenueLjungBox _),
    "q320_stratified_logrank" -> (NorthStar.churnStratifiedLogRank _),
    "q321_personalized_pagerank" -> (NorthStar.buildingSegmentPpr _),
    "q322_dow_profile" -> (NorthStar.revenueDowProfile _),
    "q323_shot_boundaries" -> (NorthStar.mediaShotBoundaries _),
    "q324_hazard_ratio" -> (NorthStar.churnHazardRatio _),
    "q325_rolling_quantile_state" ->
      (NorthStar.rollingValueQuantileState _),
    "q326_hits_refined" -> (NorthStar.supplierAuthoritiesRefined _),
    "q327_mcc" -> (NorthStar.lengthMcc _),
    "q328_cramers_v" -> (NorthStar.langSourceCramersV _),
    "q329_variance_ratio" -> (NorthStar.revenueVarianceRatio _),
    "q330_local_clustering" -> (NorthStar.dupGraphLocalClustering _),
    "q331_heaps_exponent" -> (NorthStar.vocabHeapsExponent _),
    "q332_range_search" -> (NorthStar.embeddingRangeSearch _),
    "q333_youden_threshold" -> (NorthStar.lengthYouden _),
    "q334_ahash_clusters" -> (NorthStar.mediaAHashClusters _),
    "q335_km_band" -> (NorthStar.churnSurvivalBand _),
    "q336_skyline" -> (NorthStar.docQualitySkyline _),
    "q337_bridge_edges" -> (NorthStar.dupGraphBridges _),
    "q338_mad" -> (NorthStar.orderValueMad _),
    "q339_tukey_outliers" -> (NorthStar.eventValueOutliers _),
    "q340_rolling_quantile_by_key" ->
      (NorthStar.rollingValueQuantileByType _),
    "q341_lsh_audit" -> (NorthStar.lshBlockingAudit _),
    "q342_lsh_curve" -> (NorthStar.lshDetectionGrid _),
    "q343_avg_precision" -> (NorthStar.lengthAveragePrecision _),
    "q344_brown_forsythe" -> (NorthStar.eventValueSpread _),
    "q345_pmi_collocations" -> (NorthStar.corpusCollocations _),
    "q346_js_divergence" -> (NorthStar.srcZeroJsDivergence _),
    "q347_quantile_drift" -> (NorthStar.orderValueQuantileDrift _),
    "q348_cochran_armitage" -> (NorthStar.purchaseTrend _),
    "q349_info_gain" -> (NorthStar.lengthInfoGain _),
    "q350_theil_u" -> (NorthStar.revenueTheilU _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * (Assembled from two literal maps purely to stay under scalac's
    * method-size limits as the suite grows.) */
  def oracleSql: Map[String, String] = oracleSqlBase ++ oracleSqlMore

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       round(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-04-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 4) AS sum_base_price,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 4) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(sum(CAST(round(l_discount * 100) AS BIGINT)) / (100.0 * count(*)), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT p_brand, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q04_join_multi" ->
      """SELECT r_name, n_name,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice,
        |       o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q08_outer_join" ->
      """SELECT c_custkey,
        |       coalesce(n, 0) AS n_orders,
        |       round(coalesce(spend, 0.0), 4) AS spend
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n,
        |                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS spend
        |           FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |           GROUP BY o_custkey) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q09_window_lag" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |       round(o_totalprice, 4) AS price,
        |       round(prev_price, 4) AS prev_price,
        |       round(next_price, 4) AS next_price,
        |       round(o_totalprice - prev_price, 4) AS change
        |FROM (SELECT *,
        |        lag(o_totalprice, 1) OVER w AS prev_price,
        |        lead(o_totalprice, 1) OVER w AS next_price
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
        |       CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
        |       CAST(drnk AS INTEGER) AS drnk,
        |       CAST(quartile AS INTEGER) AS quartile
        |FROM (SELECT *,
        |        row_number() OVER wt AS rn,
        |        rank() OVER wp AS rnk,
        |        dense_rank() OVER wp AS drnk,
        |        ntile(4) OVER wt AS quartile
        |      FROM orders
        |      WINDOW wt AS (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey),
        |             wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC))
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q11_window_movavg" ->
      """SELECT o_custkey, o_orderkey, round(ma7, 4) AS ma7
        |FROM (SELECT *, avg(o_totalprice) OVER
        |        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_window_cumsum" ->
      """SELECT user_id, event_id, round(cum_value, 4) AS cum_value
        |FROM (SELECT *, sum(value) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value
        |      FROM events)
        |ORDER BY user_id, event_id""".stripMargin,
    "q13_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,
    "q14_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY c_custkey""".stripMargin,
    "q15_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin,
    "q16_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q17_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS sum_price,
        |       count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q18_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q19: the sketch value never reaches the output — only the exact
    // distinct count plus the in-query |approx-exact| <= 5% bound boolean,
    // which DuckDB asserts as the constant 1.
    "q19_approx_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS exact_parts,
        |       1 AS hll_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q20_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q21_conditional_agg" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |                  ELSE 0 END) AS uc,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS tc,
        |         count(*) AS n
        |  FROM orders
        |  GROUP BY month)
        |SELECT month, round(uc / 100.0, 4) AS urgent_price,
        |       round(tc / 100.0, 4) AS total_price, n,
        |       round(uc / tc * 100.0, 4) AS urgent_share
        |FROM m
        |ORDER BY month""".stripMargin,
    "q22_date_functions" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |       CAST(month(o_orderdate) AS INTEGER) AS m,
        |       count(*) AS n,
        |       round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |             / (100.0 * count(*)), 4) AS avg_price
        |FROM orders
        |GROUP BY y, q, m
        |ORDER BY y, q, m""".stripMargin,
    "q23_string_functions" ->
      """SELECT c_custkey, upper(c_mktsegment) AS seg_up,
        |       substring(c_name, 1, 9) AS name_head,
        |       CAST(length(c_name) AS INTEGER) AS name_len,
        |       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_norm,
        |       c_mktsegment || ':' || c_name AS seg_name
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q24_json_extract" ->
      """SELECT event_type,
        |       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q25_pivot" ->
      """SELECT l_linestatus,
        |       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS "A",
        |       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS "N",
        |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS "R"
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q26_math_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_extendedprice - l_quantity * 100.0), 4) AS abs_diff,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |       round(sqrt(l_quantity), 4) AS qty_sqrt
        |FROM lineitem
        |WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q27_asof_join" ->
      """SELECT e.user_id, e.event_id, s.ts AS last_signup_ts
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.user_id, e.event_id""".stripMargin,
    "q28_range_join" ->
      """SELECT tier, count(*) AS n_customers,
        |       round(sum(CAST(round(c_acctbal * 100) AS BIGINT))
        |             / (100.0 * count(*)), 4) AS avg_bal
        |FROM customer
        |JOIN (VALUES ('p0_negative', -100000.0, 0.0),
        |             ('p1_low', 0.0, 2500.0),
        |             ('p2_mid', 2500.0, 5000.0),
        |             ('p3_high', 5000.0, 7500.0),
        |             ('p4_top', 7500.0, 100000.0)) t(tier, lo, hi)
        |  ON c_acctbal >= lo AND c_acctbal < hi
        |GROUP BY tier
        |ORDER BY tier""".stripMargin,
    "q29_sortmerge_join" ->
      """SELECT o_orderpriority,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q30_upsert_ignore" ->
      """WITH existing AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
        |     incoming AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
        |     merged AS (SELECT * FROM existing
        |                UNION ALL
        |                SELECT * FROM incoming i
        |                WHERE NOT EXISTS (SELECT 1 FROM existing e
        |                                  WHERE e.o_orderkey = i.o_orderkey))
        |SELECT o_orderstatus, count(*) AS n,
        |       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS sum_price
        |FROM merged
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q31_candle_agg" ->
      """WITH o AS (SELECT *,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn_a,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
        |  FROM orders)
        |SELECT o_custkey,
        |       round(max(CASE WHEN rn_a = 1 THEN o_totalprice END), 4) AS open_price,
        |       round(max(o_totalprice), 4) AS high_price,
        |       round(min(o_totalprice), 4) AS low_price,
        |       round(max(CASE WHEN rn_d = 1 THEN o_totalprice END), 4) AS close_price,
        |       round(sum(o_totalprice), 4) AS total_price,
        |       count(*) AS n
        |FROM o
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q32_explode_tokens" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,
    "q33_sessionize" ->
      """WITH g AS (SELECT *,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, CAST(sum(is_new) OVER
        |        (PARTITION BY user_id ORDER BY ts
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q34_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,
    "q35_window_sliding" ->
      """SELECT make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) * 900
        |                       - k * 900) * 1000000) AS window_start,
        |       event_type, count(*) AS n
        |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) offsets
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q36_session_window" ->
      """WITH g AS (SELECT *,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, sum(is_new) OVER
        |        (PARTITION BY user_id ORDER BY ts
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q37_exact_dedup" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY text
        |ORDER BY keep_id""".stripMargin,
    "q38_jaccard_pairs" -> jaccardOracle,
    // q39 = MinHash+LSH with exact verification; at J>=0.8 its candidate
    // recall is 1-1e-7, so the oracle is identical to the exact query.
    "q39_minhash_lsh" -> jaccardOracle,
    // q40: the fingerprint is engine-specific, but identical text =>
    // identical simhash and the 4x16 banding is pigeonhole-complete for
    // hamming <= 3, so over the clone-doubled corpus the exact-dup recall
    // summary is deterministic: every text-dup pair found at hamming 0.
    "q40_simhash_pairs" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 10000000, text FROM documents),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db
        |      FROM u a JOIN u b
        |        ON a.text = b.text AND a.doc_id < b.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_dup_pairs,
        |       CAST(count(*) AS BIGINT) AS n_found_h0,
        |       1 AS all_found
        |FROM p""".stripMargin,
    "q41_cosine_topk" ->
      s"""SELECT e.vec_id, round($cosSql, 4) AS cos
        |FROM embeddings e, (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |                    FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "q42_knn_join" ->
      s"""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 10),
        |scored AS (SELECT qid, e.vec_id AS nid, round($cosSql, 4) AS cos
        |           FROM embeddings e, qs WHERE e.vec_id >= 10),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY qid ORDER BY cos DESC, nid) AS INTEGER) AS rnk
        |      FROM scored)
        |SELECT qid, nid, rnk, cos FROM r WHERE rnk <= 3
        |ORDER BY qid, rnk""".stripMargin,
    // q43: ANN reduced to its exactness-bound summary (annSummary):
    // deterministic on the fixture (fixed data + seeds; measured overlap
    // 3/10 at sf0.01 and sf0.1, bound >= 2).
    "q43_ann_topk" ->
      """SELECT CAST(0 AS BIGINT) AS qid, CAST(10 AS BIGINT) AS n_results,
        |       1 AS got_k, 1 AS recall_ok""".stripMargin,
    "q44_lang_id" ->
      """WITH t AS (SELECT *, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT *, [
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))),
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','is'))),
        |    len(list_filter(toks, x -> x IN ('el','la','de','y','es'))),
        |    len(list_filter(toks, x -> x IN ('le','la','de','et','est'))),
        |    len(list_filter(toks, x -> x IN ('de','shi','le','zai','he')))] AS scores
        |  FROM t),
        |p AS (SELECT *, (['de','en','es','fr','zh'])[list_position(scores,
        |        list_max(scores))] AS predicted_lang FROM s)
        |SELECT lang, predicted_lang, count(*) AS n
        |FROM p
        |GROUP BY lang, predicted_lang
        |ORDER BY lang, predicted_lang""".stripMargin,
    "q45_quality_score" ->
      """WITH t AS (SELECT *, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |        CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
        |        CAST(length(text) AS INTEGER) AS n_len,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('the','a','of','and','is'))) AS INTEGER) AS n_stop
        |      FROM t)
        |SELECT doc_id, n_tokens, n_unique,
        |       round(n_unique / n_tokens, 4) AS uniq_ratio,
        |       round((n_len - (n_tokens - 1)) / n_tokens, 4) AS mean_tok_len,
        |       round(n_stop / n_tokens, 4) AS stopword_ratio,
        |       round(least(n_tokens / 100.0, 1.0) * 0.4
        |             + (n_unique / n_tokens) * 0.4
        |             + least((n_stop / n_tokens) * 5.0, 1.0) * 0.2, 4) AS quality_score
        |FROM m
        |ORDER BY doc_id""".stripMargin,
    "q46_token_counts" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS word_tokens,
        |       CAST(len(regexp_extract_all(text,
        |         '[a-z]+|[0-9]|[^a-z0-9 ]')) AS INTEGER) AS regex_tokens,
        |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q47_fingerprint" ->
      s"""SELECT doc_id,
        |       ${rollingHashSql("text")} AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q48_multimodal" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       substring(hex(encode(text)), 1, 16) AS head_hex,
        |       'text/plain' AS mime
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q49_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS sum_price,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q50_sql_tpch_q3" ->
      """SELECT l_orderkey,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |       CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q51_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price, n_similar
        |FROM (SELECT *, count(*) OVER
        |        (PARTITION BY o_custkey ORDER BY o_totalprice
        |         RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_similar
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q52_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |       FROM terms WHERE token <> '' GROUP BY doc_id, token),
        |idf AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (SELECT tf.doc_id, tf.token, tf.tf, idf.df,
        |             tf.tf * ln(n.n_docs / idf.df) AS tfidf
        |           FROM tf JOIN idf USING (token), n),
        |ranked AS (SELECT *, row_number() OVER
        |             (PARTITION BY doc_id
        |              ORDER BY round(tfidf, 4) DESC, token) AS rk
        |           FROM scored)
        |SELECT doc_id, token, tf, df, round(tfidf, 4) AS tfidf
        |FROM ranked
        |WHERE rk = 1 AND doc_id < 100
        |ORDER BY doc_id""".stripMargin,
    // q53: IVF probe reduced to its exactness-bound summary (annSummary):
    // measured overlap 4/10 at sf0.01 and sf0.1, bound >= 2.
    "q53_ivf_topk" ->
      """SELECT CAST(0 AS BIGINT) AS qid, CAST(10 AS BIGINT) AS n_results,
        |       1 AS got_k, 1 AS recall_ok""".stripMargin,
    "q54_correlated_subquery" ->
      """WITH b AS (SELECT *, sum(CAST(round(p_retailprice * 100) AS BIGINT))
        |             OVER (PARTITION BY p_brand) AS brand_cents_sum,
        |           count(*) OVER (PARTITION BY p_brand) AS brand_n
        |           FROM part)
        |SELECT p_partkey, p_brand, round(p_retailprice, 4) AS price,
        |       round(brand_cents_sum / (100.0 * brand_n), 4) AS brand_avg
        |FROM b
        |WHERE p_retailprice < brand_cents_sum / (100.0 * brand_n)
        |ORDER BY p_partkey""".stripMargin,
    "q55_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM orders
        |WHERE o_totalprice > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                             / (100.0 * count(*))
        |                      FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q56_decimal_agg" ->
      """SELECT o_orderstatus,
        |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE), 4) AS sum_price,
        |       count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q57_corpus_funnel" ->
      """WITH toks AS (SELECT *, string_split(text, ' ') AS t FROM documents),
        |q AS (SELECT doc_id, text FROM toks
        |      WHERE len(t) >= 20
        |        AND round(len(list_distinct(t)) / len(t), 4) >= 0.3),
        |e AS (SELECT * FROM q
        |      WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY text)),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |          for i in range(1, len(tk) - 1)])) AS shingle
        |       FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM e)
        |       WHERE len(tk) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |losers AS (SELECT DISTINCT doc_b FROM inter
        |           JOIN sizes sa ON doc_a = sa.doc_id
        |           JOIN sizes sb ON doc_b = sb.doc_id
        |           WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.8),
        |nd AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_b FROM losers))
        |SELECT '0_raw' AS stage, (SELECT count(*) FROM documents) AS n_docs
        |UNION ALL SELECT '1_quality', (SELECT count(*) FROM q)
        |UNION ALL SELECT '2_exact_dedup', (SELECT count(*) FROM e)
        |UNION ALL SELECT '3_near_dedup', (SELECT count(*) FROM nd)
        |ORDER BY stage""".stripMargin,
    "q58_array_functions" ->
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv,
        |       CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines,
        |       list_sort(list(l_linenumber))[1] AS first_line,
        |       list_contains(list(l_linenumber), 3) AS has_line3,
        |       array_to_string(list_sort(list(l_linenumber))[1:2], ',') AS first_two_csv
        |FROM lineitem
        |WHERE l_orderkey <= 500
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "q59_unpivot" ->
      """WITH wide AS (
        |  SELECT l_linestatus,
        |         round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS "A",
        |         round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS "N",
        |         round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS "R"
        |  FROM lineitem
        |  GROUP BY l_linestatus)
        |SELECT l_linestatus, returnflag, sum_qty
        |FROM (SELECT l_linestatus, 'A' AS returnflag, "A" AS sum_qty FROM wide
        |      UNION ALL
        |      SELECT l_linestatus, 'N', "N" FROM wide
        |      UNION ALL
        |      SELECT l_linestatus, 'R', "R" FROM wide)
        |WHERE sum_qty IS NOT NULL
        |ORDER BY l_linestatus, returnflag""".stripMargin,
    "q60_window_first_last" ->
      """SELECT o_custkey,
        |       round(max(first_price), 4) AS first_price,
        |       round(max(last_price), 4) AS last_price,
        |       round(max(second_price), 4) AS second_price
        |FROM (SELECT o_custkey,
        |        first_value(o_totalprice) OVER w AS first_price,
        |        last_value(o_totalprice) OVER w AS last_price,
        |        nth_value(o_totalprice, 2) OVER w AS second_price
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING
        |                            AND UNBOUNDED FOLLOWING))
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q61_date_arithmetic" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(o_orderdate AS DATE) + 30 AS due_date,
        |       CAST(datediff('day', DATE '1995-01-01',
        |                     CAST(o_orderdate AS DATE)) AS INTEGER)
        |         AS days_since_epoch_start,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "q62_null_functions" ->
      """SELECT o_orderkey,
        |       round(coalesce(prev, 0.0), 4) AS prev_or_zero,
        |       round(nullif(o_totalprice, o_totalprice), 4) AS always_null,
        |       round(greatest(o_totalprice, coalesce(prev, 0.0)), 4) AS hi,
        |       round(least(o_totalprice, coalesce(prev, 0.0)), 4) AS lo,
        |       prev IS NULL AS is_first
        |FROM (SELECT *, lag(o_totalprice, 1) OVER
        |        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |      FROM orders)
        |WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q63_string_functions2" ->
      """SELECT p_partkey,
        |       lpad(p_brand, 10, '#') AS brand_padded,
        |       rpad(p_type, 12, '.') AS type_padded,
        |       trim('  x  ') AS trimmed,
        |       translate(p_name, 'aeiou', 'AEIOU') AS name_translated,
        |       reverse(p_brand) AS brand_reversed,
        |       regexp_replace(p_name, ' ', '_', 'g') AS name_snake
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    // connected components of the near-dup pair graph: recursive
    // reachability walk carrying source labels; component = min label seen
    "q64_cc_components" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM inter
        |          JOIN sizes sa ON doc_a = sa.doc_id
        |          JOIN sizes sb ON doc_b = sb.doc_id
        |          WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |walk AS (SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges)
        |         UNION
        |         SELECT e.dst AS src, w.lbl FROM walk w
        |         JOIN edges e ON e.src = w.src)
        |SELECT src AS doc_id, min(lbl) AS component
        |FROM walk GROUP BY src ORDER BY doc_id""".stripMargin,
    "q65_label_centroids" ->
      """SELECT label, CAST(pos - 1 AS INTEGER) AS pos,
        |       round(avg(x), 4) + 0.0 AS cx, count(*) AS n
        |FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |             generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,
    "q66_window_distribution" ->
      """SELECT o_orderkey, o_orderpriority,
        |       round(percent_rank() OVER w, 4) AS pr,
        |       round(cume_dist() OVER w, 4) AS cd
        |FROM orders
        |WHERE o_orderkey <= 5000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    // full TPC-H Q1: money terms as exact scaled-integer sums (see
    // graft.functions.Money), charge summed as DECIMAL for headroom
    "q67_tpch_q1_full" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 4)
        |         AS sum_base_price,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |             / 10000.0, 4) AS sum_disc_price,
        |       round(CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |                 * (100 + CAST(round(l_tax * 100) AS BIGINT))
        |                 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0, 4) AS sum_charge,
        |       round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |             / (100.0 * count(*)), 4) AS avg_price,
        |       round(sum(CAST(round(l_discount * 100) AS BIGINT))
        |             / (100.0 * count(*)), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q68_map_functions" ->
      """WITH c AS (SELECT l_linestatus, l_returnflag, count(*) AS n
        |           FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_linestatus,
        |             map_from_entries(list_sort(list((l_returnflag, n)))) AS mp
        |      FROM c GROUP BY 1)
        |SELECT l_linestatus,
        |       array_to_string(map_keys(mp), ',') AS keys_csv,
        |       mp['A'][1] AS n_a,
        |       mp['N'][1] AS n_n,
        |       CAST(cardinality(mp) AS INTEGER) AS n_entries
        |FROM m ORDER BY l_linestatus""".stripMargin,
    "q69_regexp_extract" ->
      """SELECT p_partkey,
        |       regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |       regexp_extract(p_name, '^(\w+) (\w+)$', 1) AS name_adj,
        |       regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS name_noun,
        |       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q70_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS INTEGER) AS bin,
        |       count(*) AS n,
        |       round(min(o_totalprice), 4) AS lo,
        |       round(max(o_totalprice), 4) AS hi
        |FROM orders
        |GROUP BY 1
        |ORDER BY bin""".stripMargin,
    "q71_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_dot_product(a.v, b.v) /
        |             (sqrt(list_dot_product(a.v, a.v)) *
        |              sqrt(list_dot_product(b.v, b.v))), 4) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) /
        |            (sqrt(list_dot_product(a.v, a.v)) *
        |             sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    // same oracle as q27 — identical semantics, different physical operator
    "q72_asof_native" ->
      """SELECT e.user_id, e.event_id, s.ts AS last_signup_ts
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.user_id, e.event_id""".stripMargin,
    // the salted join must equal the PLAIN join — distribution-only change
    "q73_salted_join" ->
      """SELECT o_orderpriority, round(sum(l_quantity), 4) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q74_string_agg" ->
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list(DISTINCT CAST(c_nationkey AS VARCHAR))), ',')
        |         AS nations_csv,
        |       count(*) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q75_stats_agg" ->
      """SELECT o_orderpriority,
        |       round(stddev_samp(o_totalprice / 100000.0), 4) AS sd,
        |       round(var_samp(o_totalprice / 100000.0), 4) AS variance,
        |       round(corr(o_totalprice / 100000.0, o_custkey / 1000.0), 4) AS cor,
        |       round(covar_samp(o_totalprice / 100000.0, o_custkey / 1000.0), 4) AS cov,
        |       count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q76_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        |               FROM events WHERE user_id <= 200 GROUP BY 1, 2),
        |spine AS (SELECT user_id,
        |                 unnest(generate_series(min(day), max(day),
        |                                        INTERVAL 1 DAY)) AS day_ts
        |          FROM daily GROUP BY user_id)
        |SELECT s.user_id, CAST(s.day_ts AS DATE) AS day,
        |       coalesce(d.n, 0) AS n
        |FROM spine s LEFT JOIN daily d
        |  ON s.user_id = d.user_id AND CAST(s.day_ts AS DATE) = d.day
        |ORDER BY s.user_id, day""".stripMargin,
    "q77_tpch_q5" ->
      """SELECT n_name,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |             / 10000.0, 4) AS revenue,
        |       count(*) AS n
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q78_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |             / 10000.0, 4) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_nationkey BETWEEN 1 AND 5 AND n2.n_nationkey BETWEEN 6 AND 10) OR
        |       (n1.n_nationkey BETWEEN 6 AND 10 AND n2.n_nationkey BETWEEN 1 AND 5))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q79_multiset_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT 'except_all' AS op, o_custkey, count(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all', o_custkey, count(*)
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
        |ORDER BY op, o_custkey""".stripMargin,
    "q80_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |             / 10000.0, 4) AS sum_profit,
        |       count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q81_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS o_orderdate,
        |       round(o_totalprice, 4) AS o_totalprice,
        |       round(total_qty, 4) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q82_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 50)
        |SELECT doc_id,
        |       CAST((start - 1) / 10 AS INTEGER) AS chunk_idx,
        |       CAST(start AS INTEGER) AS start,
        |       CAST(len(chunk) AS INTEGER) AS n_chunk_tokens,
        |       array_to_string(chunk, ' ') AS chunk_text
        |FROM (SELECT doc_id, start,
        |             toks[start : least(start + 19, len(toks))] AS chunk
        |      FROM t, LATERAL unnest(range(1, len(toks) + 1, 10)) u(start))
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q83_quantize_int8" ->
      """WITH t AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                 x -> abs(x))) AS mx
        |  FROM embeddings)
        |SELECT vec_id,
        |       round(CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END, 4) + 0.0
        |         AS q_scale,
        |       array_to_string(list_transform(v,
        |         x -> CAST(round(x * (CASE WHEN mx > 0 THEN 127.0 / mx
        |                                   ELSE 0.0 END)) AS INTEGER)), ',')
        |         AS q_csv
        |FROM t
        |ORDER BY vec_id""".stripMargin,
    "q84_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |             / 10000.0, 4) AS revenue,
        |       round(max(c_acctbal), 4) AS c_acctbal,
        |       count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q85_asof_forward" ->
      """SELECT e.user_id, e.event_id, s.ts AS next_signup_ts
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts <= s.ts
        |ORDER BY e.user_id, e.event_id""".stripMargin,
    "q86_split_assign" ->
      s"""WITH h AS (
        |  SELECT doc_id,
        |         CAST(${rollingHashSql("text")}
        |           % 100 AS INTEGER) AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM h
        |ORDER BY doc_id""".stripMargin,
    "q87_tpch_q14" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |       round(100.0 *
        |         (sum(CASE WHEN p_type = 'PROMO'
        |                   THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |                        * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |                   ELSE 0 END) / 10000.0) /
        |         (sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |              * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0),
        |         4) AS promo_pct,
        |       count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY ship_month""".stripMargin,
    "q88_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |       round(o_totalprice, 4) AS o_totalprice
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY o_custkey
        |         ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q89_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1
        |ORDER BY o_orderpriority""".stripMargin,
    "q90_tpch_q6" ->
      """SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * CAST(round(l_discount * 100) AS BIGINT))
        |             / 10000.0, 4) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q91_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q92_event_funnel" ->
      """WITH s AS (SELECT user_id, min(ts) AS signup_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) AS first_purchase_ts
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT s.user_id, signup_ts, first_purchase_ts,
        |             (first_purchase_ts IS NOT NULL AND
        |              first_purchase_ts >= signup_ts) AS converted
        |      FROM s LEFT JOIN p ON s.user_id = p.user_id)
        |SELECT n_signup_users, n_converted,
        |       n_converted * 100.0 / n_signup_users AS conversion_pct,
        |       CAST(sum_us AS DOUBLE) / n_converted / 3600000000.0
        |         AS avg_hours_to_convert
        |FROM (SELECT count(*) AS n_signup_users,
        |             CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_converted,
        |             sum(CASE WHEN converted THEN
        |                   epoch_us(first_purchase_ts) - epoch_us(signup_ts)
        |                 END) AS sum_us
        |      FROM j)""".stripMargin,
    "q93_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS day0 FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, day FROM e),
        |r AS (SELECT DISTINCT f.user_id, datediff('day', day0, day) AS n
        |      FROM f JOIN a ON f.user_id = a.user_id
        |      WHERE datediff('day', day0, day) BETWEEN 1 AND 7)
        |SELECT n AS day_n, count(*) AS n_retained,
        |       round(count(*) / (SELECT count(*) FROM f) * 100, 4) + 0.0
        |         AS retention_pct
        |FROM r
        |GROUP BY n
        |ORDER BY day_n""".stripMargin,
    "q94_trailing_range" ->
      """SELECT user_id, event_id,
        |       count(*) OVER (PARTITION BY user_id ORDER BY ts_sec
        |                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |         AS n_trailing_1h
        |FROM (SELECT user_id, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
        |ORDER BY user_id, event_id""".stripMargin,
    "q95_snapshot_delta" ->
      """WITH old AS (SELECT o_orderkey AS k, o_orderstatus AS old_status
        |             FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
        |neu AS (SELECT o_orderkey AS k,
        |               CASE WHEN o_orderpriority = '1-URGENT' THEN 'R'
        |                    ELSE o_orderstatus END AS new_status
        |        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |          AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT CASE WHEN old_status IS NULL THEN 'inserted'
        |            WHEN new_status IS NULL THEN 'deleted'
        |            WHEN old_status <> new_status THEN 'changed'
        |            ELSE 'unchanged' END AS change,
        |       count(*) AS n
        |FROM old FULL JOIN neu USING (k)
        |GROUP BY 1
        |ORDER BY change""".stripMargin,
    "q96_agg_of_agg" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
        |  FROM orders GROUP BY 1)
        |SELECT n_name AS nation, count(*) AS n_customers,
        |       round(avg(n_orders), 4) AS avg_orders_per_cust,
        |       round(sum(spend_cents) / (100.0 * count(*)), 4)
        |         AS avg_spend_per_cust
        |FROM per_cust
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1
        |ORDER BY nation""".stripMargin,
    "q97_fuzzy_match" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM part a JOIN part b
        |  ON a.p_partkey < b.p_partkey
        | AND levenshtein(a.p_name, b.p_name) <= 2
        |WHERE a.p_partkey <= 200 AND b.p_partkey <= 200
        |ORDER BY id_a, id_b""".stripMargin,
    "q98_multi_distinct" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_custs,
        |       count(DISTINCT year(o_orderdate)) AS n_years,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY 1
        |ORDER BY o_orderpriority""".stripMargin,
    "q99_topk_no_window" ->
      """WITH p AS (SELECT user_id, CAST(value AS DOUBLE) AS v, event_id AS e
        |           FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, v, e,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY v DESC, e DESC) AS rk
        |      FROM p)
        |SELECT user_id,
        |       string_agg(e, ',' ORDER BY rk) AS top_event_ids,
        |       round(sum(v), 4) AS top_value_sum
        |FROM r WHERE rk <= 3
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q100_sql_multi_cte" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS spend_cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT c_custkey, c_nationkey, spend_cents,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY spend_cents DESC, c_custkey)
        |           AS rk
        |  FROM spend JOIN customer ON o_custkey = c_custkey)
        |SELECT n_name AS nation, rk, c_custkey,
        |       spend_cents / 100.0 AS spend
        |FROM ranked JOIN nation ON c_nationkey = n_nationkey
        |WHERE rk <= 3
        |ORDER BY nation, rk""".stripMargin,
    "q101_tpch_q8" ->
      """SELECT o_year,
        |       round(100.0 *
        |         (sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_c ELSE 0 END)
        |          / 10000.0) /
        |         (sum(rev_c) / 10000.0), 4) AS mkt_share,
        |       count(*) AS n
        |FROM (SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
        |             CAST(round(l_extendedprice * 100) AS BIGINT)
        |               * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |               AS rev_c
        |      FROM lineitem
        |      JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |      JOIN region ON n1.n_regionkey = r_regionkey
        |                 AND r_name = 'AMERICA'
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate < TIMESTAMP '1998-01-01')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q102_tpch_q12" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |                                                  '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q103_tpch_q17" ->
      """WITH pk AS (SELECT p_partkey FROM part
        |            WHERE p_brand = 'Brand#4' AND p_size <= 15),
        |pp AS (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
        |       FROM lineitem JOIN pk ON l_partkey = p_partkey
        |       GROUP BY 1)
        |SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS DOUBLE) / 700.0 AS avg_yearly,
        |       count(*) AS n
        |FROM lineitem
        |JOIN pk ON l_partkey = p_partkey
        |JOIN pp ON l_partkey = pp.pk
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q104_tpch_q19" ->
      """SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |             / 10000.0, 4) AS revenue,
        |       count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#8' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q105_tpch_q21" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM base l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM base l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM base l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q106_tpch_q22" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |           FROM customer),
        |t AS (SELECT CAST(sum(bal_c) AS DOUBLE) / count(*) AS thr
        |      FROM c WHERE bal_c > 0)
        |SELECT c_mktsegment,
        |       count(*) AS numcust,
        |       CAST(sum(bal_c) AS DOUBLE) / 100.0 AS totacctbal
        |FROM c, t
        |WHERE CAST(bal_c AS DOUBLE) > thr
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q107_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n_tokens,
        |             len(list_distinct(toks)) AS n_distinct,
        |             [toks[i] || ' ' || toks[i+1]
        |              for i in range(1, len(toks))] AS bigrams
        |      FROM t WHERE len(toks) >= 2)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_distinct AS DOUBLE) / n_tokens AS uniq_token_ratio,
        |       CAST(n_tokens - 1 - len(list_distinct(bigrams)) AS DOUBLE)
        |         / (n_tokens - 1) AS dup_bigram_frac
        |FROM b
        |ORDER BY doc_id""".stripMargin,
    "q108_contamination" ->
      s"""WITH h AS (
        |  SELECT doc_id,
        |         CAST(${rollingHashSql("text")}
        |           % 100 AS INTEGER) AS bucket,
        |         string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |              CASE WHEN bucket < 80 THEN 'train'
        |                   WHEN bucket < 90 THEN 'val'
        |                   ELSE 'test' END AS split,
        |              unnest(list_distinct(
        |                [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                 for i in range(1, len(toks) - 1)])) AS shingle
        |       FROM h WHERE len(toks) >= 3),
        |train AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
        |v AS (SELECT doc_id, count(*) AS n_shingles,
        |             CAST(sum(CASE WHEN shingle IN (SELECT shingle
        |                                            FROM train)
        |                           THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_contaminated
        |      FROM sh WHERE split = 'val'
        |      GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_contaminated,
        |       CAST(n_contaminated AS DOUBLE) / n_shingles
        |         AS contamination_frac
        |FROM v
        |ORDER BY doc_id""".stripMargin,
    "q109_domain_mix" ->
      s"""WITH h AS (
        |  SELECT source, n_chars,
        |         CAST(${rollingHashSql("text")}
        |           % 100 AS INTEGER) AS bucket,
        |         (CAST(coalesce(nullif(regexp_extract(source,
        |                                              '([0-9]+)$$', 1), ''),
        |                        '0') AS INTEGER)
        |          % 5) * 10 + 10 AS rate_pct
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_sampled,
        |       CAST(coalesce(sum(CASE WHEN bucket < rate_pct
        |                              THEN n_chars END), 0) AS BIGINT)
        |         AS chars_sampled,
        |       max(rate_pct) AS rate_pct
        |FROM h
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q110_incr_dedup" ->
      """WITH existing AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        |incoming AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        |ex AS (SELECT i.* FROM incoming i
        |       WHERE NOT EXISTS (SELECT 1 FROM existing e
        |                         WHERE e.text = i.text)),
        |ish AS (SELECT doc_id, unnest(list_distinct(
        |          [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |           for i in range(1, len(toks) - 1)])) AS shingle
        |        FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |              FROM ex)
        |        WHERE len(toks) >= 3),
        |esh AS (SELECT doc_id, unnest(list_distinct(
        |          [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |           for i in range(1, len(toks) - 1)])) AS shingle
        |        FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |              FROM existing)
        |        WHERE len(toks) >= 3),
        |isz AS (SELECT doc_id, count(*) AS n FROM ish GROUP BY 1),
        |esz AS (SELECT doc_id, count(*) AS n FROM esh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS eb, count(*) AS c
        |          FROM ish a JOIN esh b USING (shingle) GROUP BY 1, 2),
        |neardup AS (SELECT DISTINCT ia AS doc_id
        |            FROM inter
        |            JOIN isz ON ia = isz.doc_id
        |            JOIN esz ON eb = esz.doc_id
        |            WHERE c / (isz.n + esz.n - c) >= 0.8)
        |SELECT doc_id, lang, source, n_chars FROM ex
        |WHERE doc_id NOT IN (SELECT doc_id FROM neardup)
        |ORDER BY doc_id""".stripMargin,
    // Bloom positions are Kirsch-Mitzenmacher double hashing on the
    // rolling hash: pos_i = (h mod m + i*(1 + h mod (m-1))) mod m with
    // m = 65536, k = 2 — written out per i below. All operands are
    // non-negative, so DuckDB's % and Spark's pmod agree.
    "q111_bloom_prescreen" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |          for i in range(1, len(toks) - 1)])) AS shingle
        |       FROM t WHERE len(toks) >= 3),
        |exsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 3 <> 0),
        |pos AS (SELECT DISTINCT unnest(
        |          [h % 65536,
        |           (h % 65536 + (1 + h % 65535)) % 65536]) AS pos
        |        FROM (SELECT ${rollingHashSql("shingle")} AS h FROM exsh)),
        |probe AS (SELECT doc_id, shingle,
        |                 h % 65536 AS p0,
        |                 (h % 65536 + (1 + h % 65535)) % 65536 AS p1
        |          FROM (SELECT doc_id, shingle,
        |                       ${rollingHashSql("shingle")} AS h
        |                FROM sh WHERE doc_id % 3 = 0))
        |SELECT doc_id, count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN p0 IN (SELECT pos FROM pos)
        |                      AND p1 IN (SELECT pos FROM pos)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
        |       CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM exsh)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_true
        |FROM probe GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q112_cms_tokens" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |cnt AS (SELECT token, count(*) AS exact_cnt FROM tok GROUP BY token),
        |seeds AS (SELECT unnest([0, 1, 2]) AS seed),
        |hashed AS (SELECT token, exact_cnt, seed,
        |    ${rollingHashSql("'s' || CAST(seed AS VARCHAR) || ' ' || token")}
        |      % 16 AS cell
        |           FROM cnt CROSS JOIN seeds),
        |cells AS (SELECT seed, cell, CAST(sum(exact_cnt) AS BIGINT) AS total
        |          FROM hashed GROUP BY 1, 2),
        |est AS (SELECT token, min(total) AS cms_est
        |        FROM hashed JOIN cells USING (seed, cell)
        |        GROUP BY token)
        |SELECT token, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
        |FROM cnt JOIN est USING (token)
        |ORDER BY exact_cnt DESC, token
        |LIMIT 20""".stripMargin,
    // Morton spread as a 4-step CTE chain — the same magic-mask parallel
    // prefix as Layout.spread16, on BIGINT in both engines.
    "q113_zorder_code" ->
      """WITH base AS (SELECT l_orderkey, l_linenumber,
        |                     l_partkey & 65535 AS x, l_suppkey & 65535 AS y
        |              FROM lineitem WHERE l_orderkey < 300),
        |s1 AS (SELECT l_orderkey, l_linenumber, x AS x0, y AS y0,
        |              (x | (x << 8)) & 16711935 AS x,
        |              (y | (y << 8)) & 16711935 AS y FROM base),
        |s2 AS (SELECT l_orderkey, l_linenumber, x0, y0,
        |              (x | (x << 4)) & 252645135 AS x,
        |              (y | (y << 4)) & 252645135 AS y FROM s1),
        |s3 AS (SELECT l_orderkey, l_linenumber, x0, y0,
        |              (x | (x << 2)) & 858993459 AS x,
        |              (y | (y << 2)) & 858993459 AS y FROM s2),
        |s4 AS (SELECT l_orderkey, l_linenumber, x0, y0,
        |              (x | (x << 1)) & 1431655765 AS x,
        |              (y | (y << 1)) & 1431655765 AS y FROM s3)
        |SELECT l_orderkey, l_linenumber, x0 AS x, y0 AS y,
        |       x | (y << 1) AS zcode
        |FROM s4 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q114_outlier_zscore" ->
      """WITH stats AS (SELECT event_type, avg(value) AS mu,
        |                      stddev_samp(value) AS sd
        |               FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |       round(e.value, 4) + 0.0 AS value,
        |       round((e.value - s.mu) / s.sd, 4) + 0.0 AS z
        |FROM events e JOIN stats s USING (event_type)
        |WHERE abs((e.value - s.mu) / s.sd) > 2.5
        |ORDER BY e.event_id""".stripMargin,
    "q115_bigram_lm" ->
      """WITH pairs AS (
        |  SELECT bg['w1'] AS w1, bg['w2'] AS w2
        |  FROM (SELECT unnest([{'w1': t[i], 'w2': t[i+1]}
        |                      for i in range(1, len(t))]) AS bg
        |        FROM (SELECT string_split(text, ' ') AS t FROM documents)
        |        WHERE len(t) >= 2)),
        |cnt2 AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY 1, 2),
        |cnt1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
        |SELECT w1, w2, cnt, round(cnt / c1, 4) AS p
        |FROM cnt2 JOIN cnt1 USING (w1)
        |ORDER BY cnt DESC, w1, w2
        |LIMIT 50""".stripMargin,
    "q116_token_entropy" ->
      """WITH freq AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w)
        |SELECT doc_id,
        |       round(ln(CAST(sum(c) AS BIGINT)) -
        |             sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 4) + 0.0
        |         AS entropy,
        |       CAST(sum(c) AS BIGINT) AS n_tokens
        |FROM freq
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // Containment denominator is min(|A|,|B|): both engines divide the
    // same exact integers, so raw-threshold + round(…,4) agree.
    "q117_containment" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       round(c / least(sa.n_sh, sb.n_sh), 4) AS containment
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE c / least(sa.n_sh, sb.n_sh) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Integer-exact threshold crossing (cum·100 vs pct·tot) on both
    // sides; cum/tot divides the same integers -> identical doubles.
    "q118_vocab_coverage" ->
      """WITH tf AS (
        |  SELECT token, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM tf),
        |cum AS (SELECT cnt,
        |               CAST(row_number() OVER w AS INTEGER) AS n_tokens,
        |               CAST(sum(cnt) OVER w AS BIGINT) AS cum
        |        FROM tf
        |        WINDOW w AS (ORDER BY cnt DESC, token ASC
        |                     ROWS BETWEEN UNBOUNDED PRECEDING
        |                              AND CURRENT ROW))
        |SELECT pct, n_tokens, round(cum / tot, 4) AS coverage
        |FROM cum, tot, (VALUES (50), (90), (99)) t(pct)
        |WHERE cum * 100 >= pct * tot AND (cum - cnt) * 100 < pct * tot
        |ORDER BY pct""".stripMargin,
    "q119_dup_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id,
        |             md5(array_to_string(
        |               toks[start : least(start + 19, len(toks))], ' '))
        |               AS chunk_md5
        |      FROM t, LATERAL unnest(range(1, len(toks) + 1, 10)) u(start))
        |SELECT chunk_md5, count(*) AS n_occ,
        |       count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
        |FROM c
        |GROUP BY chunk_md5
        |HAVING count(*) > 1
        |ORDER BY chunk_md5""".stripMargin,
    "q120_lang_vocab90" ->
      """WITH tf AS (
        |  SELECT lang, token, count(*) AS cnt
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY lang, token),
        |c AS (SELECT lang, cnt,
        |             CAST(row_number() OVER w AS INTEGER) AS n_tokens,
        |             CAST(sum(cnt) OVER w AS BIGINT) AS cum,
        |             CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |      FROM tf
        |      WINDOW w AS (PARTITION BY lang ORDER BY cnt DESC, token ASC
        |                   ROWS BETWEEN UNBOUNDED PRECEDING
        |                            AND CURRENT ROW))
        |SELECT lang, n_tokens, round(cum / tot, 4) AS coverage
        |FROM c
        |WHERE cum * 10 >= tot * 9 AND (cum - cnt) * 10 < tot * 9
        |ORDER BY lang""".stripMargin,
    s"q121_domain_cap" ->
      s"""WITH r AS (
        |  SELECT source, row_number() OVER
        |    (PARTITION BY source
        |     ORDER BY ${rollingHashSql("text")} ASC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN rk <= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_kept
        |FROM r
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // q122: the oracle is the NAIVE theta join — the bucket rewrite must be
    // invisible in the result. Same exact-integer-µs / single-division
    // discipline as q92.
    "q122_range_bucketed" ->
      """WITH clicks AS (SELECT epoch_us(ts) AS p_us FROM events
        |                WHERE event_type = 'click'),
        |errors AS (SELECT epoch_us(ts) AS lo_us,
        |                  epoch_us(ts) + 300000000 AS hi_us FROM events
        |           WHERE event_type = 'error'),
        |pairs AS (SELECT p_us - lo_us AS lag_us FROM clicks JOIN errors
        |          ON p_us >= lo_us AND p_us < hi_us)
        |SELECT lag_us // 60000000 AS lag_min,
        |       count(*) AS n_pairs,
        |       CAST(CAST(sum(lag_us) AS BIGINT) AS DOUBLE)
        |         / count(*) / CAST(1000000 AS DOUBLE) AS avg_lag_s
        |FROM pairs
        |GROUP BY lag_min
        |ORDER BY lag_min""".stripMargin,
    // q123: naive theta self-join oracle over the q33 session boundaries
    // (same epoch() gap formulation so the islands agree exactly).
    "q123_session_overlap" ->
      """WITH g AS (SELECT user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, sum(is_new) OVER
        |        (PARTITION BY user_id ORDER BY ts
        |         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g),
        |sess AS (SELECT user_id, sid, epoch_us(min(ts)) AS lo,
        |                epoch_us(max(ts)) AS hi
        |         FROM s GROUP BY user_id, sid),
        |p AS (SELECT least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
        |      FROM sess a JOIN sess b
        |      ON a.lo < b.hi AND b.lo < a.hi AND a.user_id < b.user_id)
        |SELECT count(*) AS n_pairs,
        |       CAST(CAST(sum(overlap_us) AS BIGINT) AS DOUBLE)
        |         / count(*) / CAST(1000000 AS DOUBLE) AS avg_overlap_s,
        |       CAST(max(overlap_us) AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |         AS max_overlap_s
        |FROM p""".stripMargin,
    // q124: self-scored bigram-LM perplexity; every observed bigram has
    // p > 0 (trained on the same corpus) so no smoothing term. ln/exp on
    // exact integer counts in both engines; round(4) absorbs fp drift.
    "q124_doc_perplexity" ->
      """WITH dbc AS (
        |  SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2, count(*) AS c
        |  FROM (SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]}
        |                      for i in range(1, len(t))]) AS bg
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents)
        |        WHERE len(t) >= 2)
        |  GROUP BY 1, 2, 3),
        |model AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cnt2
        |          FROM dbc GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(cnt2) AS BIGINT) AS c1
        |        FROM model GROUP BY 1)
        |SELECT doc_id,
        |       round(exp(sum(c * (ln(c1) - ln(cnt2)))
        |                 / CAST(sum(c) AS BIGINT)), 4) + 0.0 AS ppl,
        |       CAST(sum(c) AS BIGINT) AS n_bigrams
        |FROM dbc JOIN model USING (w1, w2) JOIN uni USING (w1)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // q125: novelty = fraction of a doc's bigram occurrences first seen
    // (min doc_id) in this doc. Exact integers until the one division.
    "q125_novel_bigrams" ->
      """WITH dbc AS (
        |  SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2, count(*) AS c
        |  FROM (SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]}
        |                      for i in range(1, len(t))]) AS bg
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents)
        |        WHERE len(t) >= 2)
        |  GROUP BY 1, 2, 3),
        |fd AS (SELECT w1, w2, min(doc_id) AS first_doc
        |       FROM dbc GROUP BY 1, 2)
        |SELECT doc_id,
        |       round(CAST(sum(CASE WHEN doc_id = first_doc THEN c
        |                          ELSE 0 END) AS BIGINT)
        |             / CAST(sum(c) AS BIGINT), 4) + 0.0 AS novelty,
        |       CAST(sum(c) AS BIGINT) AS n_bigrams
        |FROM dbc JOIN fd USING (w1, w2)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // q126: KL(source ‖ corpus) over unigram distributions; all ln args
    // are exact integer counts so both engines see identical inputs.
    "q126_source_kl" ->
      """WITH tok AS (
        |  SELECT source, w, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |corpus AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw
        |           FROM tok GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
        |       FROM tok GROUP BY 1),
        |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n_total FROM corpus)
        |SELECT source,
        |       round(sum(c * (ln(c) - ln(ns) - ln(cw) + ln(n_total)))
        |             / max(ns), 4) + 0.0 AS kl,
        |       max(ns) AS n_tokens
        |FROM tok JOIN corpus USING (w) JOIN ns USING (source) CROSS JOIN n
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // q127: single-partition-window formulation is FINE for the oracle
    // (DuckDB, 60k rows); the Spark side uses the two-level cumsum so the
    // same math runs cliff-free at 100 TB. All-integer -> exact match.
    "q127_pack_bins" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        |           FROM documents WHERE len(string_split(text, ' ')) >= 1),
        |c AS (SELECT doc_id, n_tok,
        |             CAST(sum(n_tok) OVER (ORDER BY doc_id
        |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t),
        |b AS (SELECT doc_id, n_tok, cum, cum - n_tok AS start,
        |             unnest(range(CAST((cum - n_tok) // 256 AS BIGINT),
        |                          CAST((cum - 1) // 256 AS BIGINT) + 1))
        |               AS bin
        |      FROM c)
        |SELECT bin, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN start >= bin * 256
        |                      AND cum <= (bin + 1) * 256
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs,
        |       CAST(sum(least(cum, (bin + 1) * 256) -
        |                greatest(start, bin * 256)) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    // q128: keep the quality-ordered prefix of half the corpus tokens;
    // boundary test (cum - v) * den < tot * num is all-integer.
    "q128_budget_cut" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |             CAST(row_number() OVER w AS BIGINT) AS rn,
        |             CAST(sum(n_tok) OVER (w ROWS UNBOUNDED PRECEDING)
        |               AS BIGINT) AS cum,
        |             CAST(sum(n_tok) OVER () AS BIGINT) AS tot
        |      FROM t WINDOW w AS (ORDER BY n_chars DESC, doc_id))
        |SELECT doc_id, n_tok, rn, cum, tot,
        |       CASE WHEN (cum - n_tok) * 2 < tot * 1 THEN 1 ELSE 0 END
        |         AS kept
        |FROM c ORDER BY doc_id""".stripMargin,
    // q129: threshold_s = ((tot*num) div (den*n_strata) * 2^32) div
    // src_tok; doc sampled iff first-8-hex-digits-of-md5(doc_id) < thr.
    // Integer arithmetic end to end -> engines agree on every doc.
    "q129_mixture_sample" ->
      """WITH t AS (SELECT source AS stratum,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             list_reduce(
        |               [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |                for c in string_split(
        |                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '')],
        |               (a, b) -> a * 16 + b) AS h
        |           FROM documents),
        |strata AS (SELECT stratum, CAST(sum(n_tok) AS BIGINT) AS src_tok
        |           FROM t GROUP BY stratum),
        |g AS (SELECT CAST(sum(src_tok) AS BIGINT) AS tot,
        |             count(*) AS n_strata FROM strata),
        |thr AS (SELECT stratum,
        |               (((tot * 1) // (2 * n_strata)) * 4294967296)
        |                 // src_tok AS thr
        |        FROM strata CROSS JOIN g)
        |SELECT stratum, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_sampled,
        |       CAST(sum(CASE WHEN h < thr THEN n_tok ELSE 0 END) AS BIGINT)
        |         AS tok_sampled
        |FROM t JOIN thr USING (stratum)
        |GROUP BY stratum ORDER BY stratum""".stripMargin,
    // q130: first-occurrence chunk winners (min doc_id, chunk_idx) via
    // row_number over the chunk hash; clean text re-sliced 1-based
    // [i*20+1, i*20+20] exactly as the Spark side does, md5-committed.
    "q130_chunk_rewrite" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, CAST((u.start - 1) // 20 AS BIGINT)
        |               AS chunk_idx,
        |             md5(array_to_string(
        |               toks[u.start : least(u.start + 19, len(toks))], ' '))
        |               AS h
        |      FROM t, LATERAL unnest(range(1, len(toks) + 1, 20)) u(start)),
        |w AS (SELECT doc_id, chunk_idx,
        |             row_number() OVER (PARTITION BY h
        |               ORDER BY doc_id, chunk_idx) AS rk FROM c),
        |k AS (SELECT doc_id, list_sort(list(chunk_idx)) AS kept
        |      FROM w WHERE rk = 1 GROUP BY doc_id)
        |SELECT t.doc_id,
        |       CAST(len(range(1, len(toks) + 1, 20)) AS BIGINT) AS n_chunks,
        |       CAST(coalesce(len(kept), 0) AS BIGINT) AS n_kept,
        |       CAST(len(flatten(
        |         [toks[i * 20 + 1 : least(i * 20 + 20, len(toks))]
        |          for i in coalesce(kept, [])])) AS BIGINT)
        |         AS n_clean_tokens,
        |       md5(coalesce(array_to_string(flatten(
        |         [toks[i * 20 + 1 : least(i * 20 + 20, len(toks))]
        |          for i in coalesce(kept, [])]), ' '), '')) AS clean_md5
        |FROM t LEFT JOIN k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    // q131: within-label SemDeDup keep-first rule — drop iff a smaller-id
    // cell-mate has round(cos, 4) >= 0.35.
    "q131_semdedup" ->
      """WITH e AS (SELECT vec_id, CAST(label AS INTEGER) AS cell,
        |                  CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |d AS (SELECT DISTINCT b.vec_id
        |      FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.v, b.v) /
        |            (sqrt(list_dot_product(a.v, a.v)) *
        |             sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35)
        |SELECT e.vec_id, e.cell,
        |       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM e LEFT JOIN d ON e.vec_id = d.vec_id
        |ORDER BY e.vec_id""".stripMargin,
    // q159: any-alignment repeated spans — stride-1 width-8 windows
    // (same 8-gram idiom as q148), grouped by hash, kept when seen in
    // >= 2 distinct docs; (n_docs DESC, n_occ DESC, h) is total.
    "q159_repeated_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        md5(array_to_string(toks[u.p : u.p + 7], ' ')) AS h
        |      FROM t, LATERAL unnest(range(1, len(toks) - 6)) u(p)
        |      WHERE len(toks) >= 8),
        |a AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |        CAST(count(*) AS BIGINT) AS n_occ
        |      FROM s GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
        |SELECT h, n_docs, n_occ FROM a
        |ORDER BY n_docs DESC, n_occ DESC, h LIMIT 100""".stripMargin,
    // q162: int8-quantized cosine serving — quantization (round half
    // away from zero in both engines), integer dots, one rounded
    // per-row division: the oracle replays the full top-k.
    "q162_int8_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |qz AS (SELECT vec_id,
        |         [CAST(round(x * (127.0 / mx)) AS BIGINT)
        |          for x in v] AS qv
        |       FROM (SELECT vec_id, v,
        |               list_max([abs(x) for x in v]) AS mx
        |             FROM e)
        |       WHERE mx > 0),
        |q AS (SELECT qv AS qq FROM qz WHERE vec_id = 0)
        |SELECT c.vec_id,
        |       round(list_dot_product(c.qv, q.qq) /
        |             (sqrt(list_dot_product(c.qv, c.qv)) *
        |              sqrt(list_dot_product(q.qq, q.qq))), 4) AS cos8
        |FROM qz c CROSS JOIN q
        |WHERE c.vec_id <> 0 AND list_dot_product(c.qv, c.qv) > 0
        |ORDER BY cos8 DESC, c.vec_id LIMIT 10""".stripMargin,
    // q161: the composite admission chain — q135's gopher metrics
    // (rounded mean_word_len, same boundaries) at score >= 4, q37's
    // winner rule, and q128's integer budget boundary, in one statement.
    "q161_curation_pipeline" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, text,
        |  CAST(len(toks) AS INTEGER) AS n_words,
        |  round(CAST(length(text) - (len(toks) - 1) AS DOUBLE)
        |        / len(toks), 4) AS mean_word_len,
        |  CAST(len(regexp_extract_all(text, '#'))
        |       + len(regexp_extract_all(text, '\.\.\.')) AS INTEGER)
        |    AS n_symbols,
        |  CAST(len([w for w in toks if regexp_matches(w, '[A-Za-z]')])
        |       AS INTEGER) AS n_alpha_words,
        |  CAST(len(list_intersect(list_distinct(toks),
        |    ['the','be','to','of','and','that','have','with']))
        |    AS INTEGER) AS n_stop_distinct,
        |  CAST(len(toks) AS BIGINT) AS n_tok
        |  FROM t),
        |q AS (SELECT doc_id, text, n_tok FROM m
        |      WHERE CAST(n_words >= 20 AND n_words <= 100000 AS INTEGER)
        |          + CAST(mean_word_len >= 3.0
        |                 AND mean_word_len <= 10.0 AS INTEGER)
        |          + CAST(n_symbols < n_words * 0.1 AS INTEGER)
        |          + CAST(n_alpha_words >= n_words * 0.8 AS INTEGER)
        |          + CAST(n_stop_distinct >= 2 AS INTEGER) >= 4),
        |w AS (SELECT doc_id, n_tok FROM (
        |        SELECT doc_id, n_tok,
        |          row_number() OVER (PARTITION BY text ORDER BY doc_id)
        |            AS rk
        |        FROM q) WHERE rk = 1),
        |c AS (SELECT doc_id, n_tok,
        |        CAST(row_number() OVER win AS BIGINT) AS rn,
        |        CAST(sum(n_tok) OVER (win ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS cum,
        |        CAST(sum(n_tok) OVER () AS BIGINT) AS tot
        |      FROM w WINDOW win AS (ORDER BY doc_id))
        |SELECT doc_id, n_tok, rn, cum, tot,
        |       CASE WHEN (cum - n_tok) * 2 < tot * 1 THEN 1 ELSE 0 END
        |         AS kept
        |FROM c ORDER BY doc_id""".stripMargin,
    // q163: chunk-level BPE tokenizer — q157's vocab dictionary join
    // applied per 16-token chunk (q119's chunking idiom, non-overlapping);
    // count(n_sym) counts only vocab-matched (non-empty) words, so every
    // chunk row survives with zeros intact.
    "q163_chunk_bpe" ->
      s"""${bpeChainSql(6)},
        |vocab AS (SELECT word,
        |            CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sym
        |          FROM s6),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents),
        |ch AS (SELECT doc_id,
        |         CAST((u.start - 1) // 16 AS INTEGER) AS chunk_idx,
        |         toks[u.start : least(u.start + 15, len(toks))] AS cw
        |       FROM t, LATERAL unnest(range(1, len(toks) + 1, 16)) u(start)),
        |w AS (SELECT doc_id, chunk_idx, unnest(cw) AS word FROM ch),
        |j AS (SELECT w.doc_id, w.chunk_idx, v.n_sym
        |      FROM w LEFT JOIN vocab v USING (word))
        |SELECT doc_id, chunk_idx,
        |       CAST(count(n_sym) AS BIGINT) AS n_words,
        |       CAST(coalesce(sum(n_sym), 0) AS BIGINT) AS n_bpe_tokens
        |FROM j GROUP BY doc_id, chunk_idx
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // q164: RRF hybrid retrieval — the q144 BM25 list and the q41 cosine
    // list, each ranked top-50 in its own total order, fused by the pure
    // INTEGER weight 1e9 // (60 + rank) summed as a long: the fused
    // ranking replays bit-identically with no cross-row float op.
    "q164_hybrid_rrf" ->
      s"""$bm25ChainSql,
        |bmr AS (SELECT doc_id AS id, CAST(row_number() OVER
        |          (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rnk
        |        FROM score),
        |ce AS (SELECT e.vec_id, round($cosSql, 4) AS cos
        |       FROM embeddings e,
        |            (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |             FROM embeddings WHERE vec_id = 0) q
        |       WHERE e.vec_id <> 0),
        |cr AS (SELECT vec_id AS id, CAST(row_number() OVER
        |         (ORDER BY cos DESC, vec_id) AS INTEGER) AS rnk
        |       FROM ce),
        |u AS (SELECT id, rnk, 'bm25' AS src FROM bmr WHERE rnk <= 50
        |      UNION ALL
        |      SELECT id, rnk, 'cos' AS src FROM cr WHERE rnk <= 50),
        |f AS (SELECT id,
        |        coalesce(max(CASE WHEN src = 'bm25' THEN rnk END), 0)
        |          AS bm25_rank,
        |        coalesce(max(CASE WHEN src = 'cos' THEN rnk END), 0)
        |          AS cos_rank,
        |        CAST(count(*) AS INTEGER) AS n_lists,
        |        CAST(sum(1000000000 // (60 + rnk)) AS BIGINT) AS rrf_micro
        |      FROM u GROUP BY id)
        |SELECT id, bm25_rank, cos_rank, n_lists, rrf_micro,
        |       round(rrf_micro / 1000000000.0, 6) AS rrf
        |FROM f ORDER BY rrf_micro DESC, id LIMIT 20""".stripMargin,
    // q165: quality-canonical cluster representatives — the q64 CC walk
    // plus the distinct-token-ratio score; the (q_score DESC, doc_id)
    // argmax per component is a total order (score rounded 6 dp per-row).
    "q165_canonical_reps" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM inter
        |          JOIN sizes sa ON doc_a = sa.doc_id
        |          JOIN sizes sb ON doc_b = sb.doc_id
        |          WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |walk AS (SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges)
        |         UNION
        |         SELECT e.dst AS src, w.lbl FROM walk w
        |         JOIN edges e ON e.src = w.src),
        |comp AS (SELECT src AS doc_id, min(lbl) AS component
        |         FROM walk GROUP BY src),
        |q AS (SELECT doc_id, round(len(list_distinct(toks))
        |        / CAST(len(toks) AS DOUBLE), 6) AS q_score
        |      FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |            FROM documents)),
        |r AS (SELECT component, doc_id, q_score,
        |        row_number() OVER (PARTITION BY component
        |                           ORDER BY q_score DESC, doc_id) AS rn,
        |        CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
        |          AS n_members
        |      FROM comp JOIN q USING (doc_id))
        |SELECT component, doc_id AS canon_id, q_score AS canon_q, n_members
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin,
    // q166: contrastive hard negatives — q42's brute-force scoring with
    // the label-inequality predicate; exact, so every row is pinned.
    "q166_hard_negatives" ->
      s"""WITH qs AS (SELECT vec_id AS qid, label AS qlabel,
        |              CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT qid, e.vec_id AS nid, e.label AS neg_label,
        |             round($cosSql, 4) AS cos
        |           FROM embeddings e, qs WHERE e.label <> qs.qlabel),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY qid ORDER BY cos DESC, nid) AS INTEGER)
        |        AS rnk
        |      FROM scored)
        |SELECT qid, nid, neg_label, rnk, cos FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // q167: IVF recall eval — the q136 trained quantizer (kmeansChainSql:
    // c2 = final centroids, a3 = final assignment) probed at nProbe=2 for
    // 16 anchors; exact and candidate top-10 lists both total-ordered
    // (rounded cosine, nid tiebreak), so recall replays row for row. The
    // ONLY genuinely-verified ANN oracle shape — serving queries
    // (q43/q53/q138/q156) can only pin summary invariants.
    "q167_ivf_recall" ->
      s"""$kmeansChainSql,
        |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 16),
        |probed AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c2.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_dot_product(c2.c, q.qv)
        |        / (sqrt(list_dot_product(c2.c, c2.c))
        |           * sqrt(list_dot_product(q.qv, q.qv))) DESC,
        |        c2.cid) AS rk
        |    FROM c2, qs q) WHERE rk <= 2),
        |scored AS (SELECT q.qid, e.vec_id AS nid, a3.cid,
        |    round(list_dot_product(e.v, q.qv)
        |      / (sqrt(list_dot_product(e.v, e.v))
        |         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
        |  FROM e JOIN a3 USING (vec_id), qs q WHERE e.vec_id <> q.qid),
        |exact AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rk FROM scored) WHERE rk <= 10),
        |cand AS (SELECT s.* FROM scored s
        |         JOIN probed p ON s.qid = p.qid AND s.cid = p.cid),
        |ivf AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rk FROM cand) WHERE rk <= 10),
        |nc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cand
        |       FROM cand GROUP BY qid),
        |h AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS n_hits
        |      FROM exact x JOIN ivf i ON x.qid = i.qid AND x.nid = i.nid
        |      GROUP BY x.qid)
        |SELECT q.qid, coalesce(nc.n_cand, 0) AS n_cand,
        |       coalesce(h.n_hits, 0) AS n_hits,
        |       round(coalesce(h.n_hits, 0) / 10.0, 4) AS recall
        |FROM qs q LEFT JOIN nc USING (qid) LEFT JOIN h USING (qid)
        |ORDER BY q.qid""".stripMargin,
    // q168: tokenizer fertility by language — exact long word/symbol
    // counts per lang from the q147-trained vocab; one per-group division
    // of two exact integers (engine-exact double), rounded 4 dp.
    "q168_bpe_fertility" ->
      s"""${bpeChainSql(6)},
        |vocab AS (SELECT word,
        |            CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sym
        |          FROM s6),
        |w AS (SELECT lang, word FROM
        |        (SELECT lang, unnest(string_split(text, ' ')) AS word
        |         FROM documents)
        |      WHERE word <> '')
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(n_sym) AS BIGINT) AS n_sym,
        |       round(sum(n_sym) / CAST(count(*) AS DOUBLE), 4) AS fertility
        |FROM w JOIN vocab USING (word)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // q169: cross-modal kNN — the decode stub's 8-bin byte histogram is a
    // pure byte function (corpus is ASCII, so ascii(char) == byte, the
    // same identity every rollingHashSql oracle already relies on); the
    // ranking is q42's shape over the replayed features.
    "q169_media_knn" ->
      s"""WITH h AS (SELECT doc_id,
        |        [${(0 until 8).map(k =>
        s"CAST(len([c for c in cs if ascii(c) % 8 = $k]) AS DOUBLE)")
        .mkString(",\n        |         ")}] AS f
        |      FROM (SELECT doc_id, string_split(text, '') AS cs
        |            FROM documents WHERE length(text) > 0)),
        |qs AS (SELECT doc_id AS qid, f AS qf FROM h WHERE doc_id < 8),
        |scored AS (SELECT qid, c.doc_id AS nid,
        |    round(list_dot_product(c.f, qf)
        |      / (sqrt(list_dot_product(c.f, c.f))
        |         * sqrt(list_dot_product(qf, qf))), 4) AS cos
        |  FROM h c, qs WHERE c.doc_id >= 8),
        |r AS (SELECT qid, nid, cos, CAST(row_number() OVER
        |        (PARTITION BY qid ORDER BY cos DESC, nid) AS INTEGER)
        |        AS rnk
        |      FROM scored)
        |SELECT qid, nid, rnk, cos FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // q170: serpentine shard dealing over the (n_tok DESC, doc_id) rank;
    // all-integer (rank, cycle fold, counts, floor-div ideal), so every
    // audit row replays exactly.
    "q170_balanced_shards" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |r AS (SELECT doc_id, n_tok, row_number() OVER
        |        (ORDER BY n_tok DESC, doc_id) AS rn FROM t),
        |s AS (SELECT n_tok, CAST((rn - 1) % 16 AS BIGINT) AS cyc FROM r),
        |a AS (SELECT CAST(CASE WHEN cyc < 8 THEN cyc
        |                  ELSE 15 - cyc END AS INTEGER) AS shard, n_tok
        |      FROM s),
        |g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM a GROUP BY shard),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM g)
        |SELECT shard, n_docs, n_tokens,
        |       CAST(n_tokens - (t // 8) AS BIGINT) AS dev
        |FROM g, tot ORDER BY shard""".stripMargin,
    // q171: flat-PQ ADC recall — the q146 PQ chain (p{j}c1 books, p{j}a2
    // codes) scored by the dot-expansion LUT the Spark side also uses;
    // both rankings total-ordered (rounded score, nid tiebreak), so the
    // per-anchor recall replays row for row.
    "q171_pq_recall" -> {
      def qd(j: Int): String =
        s"(list_dot_product(q$j.v, q$j.v)" +
          s" - 2 * list_dot_product(q$j.v, b$j.c)" +
          s" + list_dot_product(b$j.c, b$j.c))"
      s"""${pqChainSql()},
        |qs AS (SELECT vec_id AS qid FROM e WHERE vec_id < 8),
        |ex AS (SELECT q.qid, v.vec_id AS nid,
        |         round(list_dot_product(v.v, v.v)
        |           - 2 * list_dot_product(v.v, qe.v)
        |           + list_dot_product(qe.v, qe.v), 4) AS d2
        |       FROM e v, qs q JOIN e qe ON qe.vec_id = q.qid
        |       WHERE v.vec_id <> q.qid),
        |exact AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY d2 ASC, nid) AS rk FROM ex) WHERE rk <= 10),
        |adc AS (SELECT q.qid, v.vec_id AS nid,
        |    round(${(1 to 4).map(qd).mkString("\n        |        + ")},
        |      4) AS adc
        |  FROM e v
        |${(1 to 4).map(j =>
          s"  JOIN p${j}a2 a$j ON a$j.vec_id = v.vec_id\n" +
          s"        |  JOIN p${j}c1 b$j ON b$j.cid = a$j.cid")
          .mkString("\n        |")}
        |  , qs q
        |${(1 to 4).map(j =>
          s"  JOIN e$j q$j ON q$j.vec_id = q.qid").mkString("\n        |")}
        |  WHERE v.vec_id <> q.qid),
        |pq AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY adc ASC, nid) AS rk FROM adc) WHERE rk <= 10),
        |h AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS n_hits
        |      FROM exact x JOIN pq p ON x.qid = p.qid AND x.nid = p.nid
        |      GROUP BY x.qid)
        |SELECT q.qid, coalesce(h.n_hits, 0) AS n_hits,
        |       round(coalesce(h.n_hits, 0) / 10.0, 4) AS recall
        |FROM qs q LEFT JOIN h USING (qid) ORDER BY q.qid""".stripMargin
    },
    // q172: exact source-overlap matrix — distinct (source, 8-gram-md5)
    // rows (q148's gram idiom), inverted self-join, full pair matrix
    // with zeros; one rounded division per pair row.
    "q172_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (SELECT DISTINCT source AS src,
        |        md5(array_to_string(toks[u.p : u.p + 7], ' ')) AS h
        |      FROM t, LATERAL unnest(range(1, len(toks) - 6)) u(p)
        |      WHERE len(toks) >= 8),
        |c AS (SELECT src, CAST(count(*) AS BIGINT) AS n_grams
        |      FROM g GROUP BY src),
        |s AS (SELECT a.src AS src_a, b.src AS src_b,
        |        CAST(count(*) AS BIGINT) AS n_shared
        |      FROM g a JOIN g b ON a.h = b.h AND a.src < b.src
        |      GROUP BY 1, 2),
        |p AS (SELECT x.src AS src_a, y.src AS src_b,
        |        x.n_grams AS n_a, y.n_grams AS n_b
        |      FROM c x JOIN c y ON x.src < y.src)
        |SELECT p.src_a, p.src_b, p.n_a, p.n_b,
        |       coalesce(s.n_shared, 0) AS n_shared,
        |       round(coalesce(s.n_shared, 0)
        |         / CAST(p.n_a + p.n_b - coalesce(s.n_shared, 0) AS DOUBLE),
        |         6) AS jacc
        |FROM p LEFT JOIN s USING (src_a, src_b)
        |ORDER BY src_a, src_b""".stripMargin,
    // q173: dedup evidence — the q38 shingle machinery with the full
    // signal row per J >= 0.5 pair; the filter compares the raw ratio
    // (identical exactly-rounded double in both engines), rounding only
    // in the output projection.
    "q173_dedup_evidence" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            CAST(count(*) AS BIGINT) AS n_shared
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       CAST(sa.n_sh AS INTEGER) AS n_a,
        |       CAST(sb.n_sh AS INTEGER) AS n_b, n_shared,
        |       round(n_shared / (sa.n_sh + sb.n_sh - n_shared), 4)
        |         AS jaccard,
        |       round(n_shared / least(sa.n_sh, sb.n_sh), 4) AS containment,
        |       round(least(sa.n_sh, sb.n_sh)
        |         / CAST(greatest(sa.n_sh, sb.n_sh) AS DOUBLE), 4)
        |         AS len_ratio
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE n_shared / (sa.n_sh + sb.n_sh - n_shared) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q174: sparse lexical cosine — tf-idf micro-weights (round-4dp
    // integers), per-doc top-10 terms (micro DESC, token), exact LONG
    // micro-product dot sums; the only float op is the per-pair norm
    // division (row-local, identical both engines).
    "q174_lexical_cosine" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |terms AS (SELECT doc_id,
        |        unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                for i in range(1, len(toks) - 1)]) AS token
        |      FROM t WHERE len(toks) >= 3),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM terms GROUP BY 1, 2),
        |dfx AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        |        FROM tf GROUP BY token),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |      FROM documents),
        |w AS (SELECT tf.doc_id, tf.token,
        |        CAST(round(tf.tf * ln(n.n_docs / CAST(dfx.df AS DOUBLE))
        |          * 10000.0) AS BIGINT) AS micro
        |      FROM tf JOIN dfx USING (token), n),
        |top AS (SELECT doc_id, token, micro FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY micro DESC, token) AS rk
        |    FROM w WHERE micro > 0) WHERE rk <= 10),
        |norms AS (SELECT doc_id, CAST(sum(micro * micro) AS BIGINT) AS n2
        |          FROM top GROUP BY doc_id),
        |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           CAST(sum(a.micro * b.micro) AS BIGINT) AS dot_micro
        |         FROM top a JOIN top b ON a.token = b.token
        |                              AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |        dot_micro / (sqrt(na.n2) * sqrt(nb.n2)) AS cosr
        |      FROM dots
        |      JOIN norms na ON doc_a = na.doc_id
        |      JOIN norms nb ON doc_b = nb.doc_id)
        |SELECT doc_a, doc_b, round(cosr, 4) AS cos FROM j
        |WHERE cosr >= 0.6
        |ORDER BY round(cosr, 4) DESC, doc_a, doc_b LIMIT 50""".stripMargin,
    // q175: curriculum buckets — 6-dp distinct-ratio micro score, global
    // (score DESC, doc_id) rank, bucket = ((rn-1)*10)//tot; counts and
    // min/max/sum are exact integers, the mean is one per-row division.
    "q175_curriculum" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(round(len(list_distinct(toks))
        |          / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS s
        |      FROM t),
        |r AS (SELECT s, row_number() OVER (ORDER BY s DESC, doc_id) AS rn,
        |        count(*) OVER () AS tot
        |      FROM s),
        |b AS (SELECT CAST(((rn - 1) * 10) // tot AS INTEGER) AS bucket, s
        |      FROM r)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(min(s) AS BIGINT) AS min_s,
        |       CAST(max(s) AS BIGINT) AS max_s,
        |       round(sum(s) / CAST(count(*) AS DOUBLE), 6) AS avg_s
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q176: KMV mergeability — both construction paths (full-corpus and
    // merge-of-halves) replayed from the same pure hash; the identity
    // minK(A∪B) == minK(minK(A)∪minK(B)) must hold row for row.
    "q176_kmv_merge" ->
      """WITH b AS (SELECT DISTINCT doc_id, source AS g,
        |             list_reduce(
        |               [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |                for c in string_split(
        |                  substr(md5(text), 1, 8), '')],
        |               (a, b) -> a * 16 + b) AS h
        |           FROM documents),
        |fullb AS (SELECT DISTINCT g, h FROM b),
        |sigf AS (SELECT g, h FROM (
        |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
        |      AS rk FROM fullb) WHERE rk <= 192),
        |ha AS (SELECT DISTINCT g, h FROM b WHERE doc_id % 2 = 0),
        |hb AS (SELECT DISTINCT g, h FROM b WHERE doc_id % 2 <> 0),
        |siga AS (SELECT g, h FROM (
        |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
        |      AS rk FROM ha) WHERE rk <= 192),
        |sigb AS (SELECT g, h FROM (
        |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
        |      AS rk FROM hb) WHERE rk <= 192),
        |u AS (SELECT DISTINCT g, h FROM
        |        (SELECT * FROM siga UNION ALL SELECT * FROM sigb)),
        |sigm AS (SELECT g, h FROM (
        |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
        |      AS rk FROM u) WHERE rk <= 192),
        |nf AS (SELECT g, CAST(count(*) AS BIGINT) AS n_full
        |       FROM sigf GROUP BY g),
        |nm AS (SELECT g, CAST(count(*) AS BIGINT) AS n_merged
        |       FROM sigm GROUP BY g),
        |nx AS (SELECT f.g, CAST(count(*) AS BIGINT) AS n_match
        |       FROM sigf f JOIN sigm m ON f.g = m.g AND f.h = m.h
        |       GROUP BY f.g)
        |SELECT nf.g AS src, nf.n_full, nm.n_merged, nx.n_match,
        |       CAST(nf.n_full = nm.n_merged
        |            AND nm.n_merged = nx.n_match AS INTEGER) AS all_equal
        |FROM nf JOIN nm USING (g) JOIN nx USING (g)
        |ORDER BY src""".stripMargin,
    // q177: binary (sign-bit) quantized serving — Hamming = count of
    // sign mismatches (Spark packs to one long and popcounts the xor;
    // the oracle counts mismatched sign comparisons, same integer), the
    // prescreen boundary is (hd, vec_id)-deterministic, and the rerank
    // cosine is per-row arithmetic rounded at 4 — full-result replay.
    "q177_binary_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |ham AS (SELECT e.vec_id, e.v, q.qv,
        |          CAST(len([i for i in range(1, len(e.v) + 1)
        |                    if (e.v[CAST(i AS INTEGER)] > 0)
        |                       <> (q.qv[CAST(i AS INTEGER)] > 0)])
        |            AS INTEGER) AS hd
        |        FROM e CROSS JOIN q WHERE e.vec_id <> 0),
        |pre AS (SELECT * FROM ham ORDER BY hd, vec_id LIMIT 32)
        |SELECT vec_id, hd,
        |       round(list_dot_product(v, qv) /
        |             (sqrt(list_dot_product(v, v)) *
        |              sqrt(list_dot_product(qv, qv))), 4) + 0.0 AS cos
        |FROM pre ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    // q178: SCD2 — lag change-detect, lead interval-close, identical
    // (ts, event_id) total order in both engines; pure window algebra.
    // Change detection mirrors Upsert.scd2's NULL-SAFE form exactly:
    // rn = 1 keeps each user's first row even when its state is NULL,
    // and IS DISTINCT FROM treats NULL state transitions as changes —
    // so the cross-engine gate exercises the same semantics the unit
    // tests pin (ADVICE r8).
    "q178_scd2" ->
      """WITH o AS (SELECT user_id, event_id, event_type, ts,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id)
        |               AS prev_state,
        |             row_number() OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |           FROM events),
        |r AS (SELECT user_id, event_id, event_type, ts FROM o
        |      WHERE rn = 1 OR prev_state IS DISTINCT FROM event_type)
        |SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        |       lead(ts) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       CASE WHEN lead(ts) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS is_current
        |FROM r ORDER BY user_id, valid_from, event_id""".stripMargin,
    // q179: per-key OLS from integer sufficient statistics — epoch-day
    // x, micro-unit y, all five sums 64-bit exact; slope/mean are
    // per-group arithmetic on those integers (left-to-right division
    // order mirrored), so both engines emit identical doubles.
    "q179_group_trend" ->
      """WITH b AS (SELECT user_id,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
        |             CAST(round(value * 1e6) AS BIGINT) AS y
        |           FROM events),
        |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x * y) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx
        |      FROM b GROUP BY user_id)
        |SELECT user_id, n_obs,
        |       round(CAST(sy AS DOUBLE) / n_obs / 1e6, 6) + 0.0
        |         AS mean_value,
        |       CASE WHEN CAST(n_obs * sxx - sx * sx AS DOUBLE) = 0
        |            THEN NULL
        |            ELSE round(CAST(n_obs * sxy - sx * sy AS DOUBLE)
        |                       / CAST(n_obs * sxx - sx * sx AS DOUBLE)
        |                       / 1e6, 6) + 0.0
        |       END AS slope_per_day
        |FROM a ORDER BY user_id""".stripMargin,
    // q180: exact k-th smallest replayed by ordering — Spark finds the
    // same k = ceil(q*n) value by histogram refinement, never sorting.
    "q180_exact_quantiles" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
        |             AS v FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
        |q AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        |SELECT q.q, n.n, CAST(ceil(q.q * n.n) AS BIGINT) AS k,
        |       (SELECT r.v FROM r
        |        WHERE r.rk = CAST(ceil(q.q * n.n) AS BIGINT)) AS value
        |FROM q, n ORDER BY q.q""".stripMargin,
    // q181: prototype pruning — q136's trained chain (same init/round/
    // tie contract), distance to the ASSIGNED c2 centroid recomputed
    // with the identical fold, rounded at 6, ranked (d2 DESC, vec_id),
    // kept iff rk <= ceil(n_cell * 0.5). Full replay.
    "q181_prototype_prune" ->
      s"""$kmeansChainSql,
        |dd AS (SELECT a3.vec_id, a3.cid,
        |         round(list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c2.c)
        |               + list_dot_product(c2.c, c2.c), 6) + 0.0 AS d2
        |       FROM a3 JOIN e USING (vec_id) JOIN c2 USING (cid)),
        |rr AS (SELECT vec_id, cid, d2,
        |         row_number() OVER
        |           (PARTITION BY cid ORDER BY d2 DESC, vec_id) AS rk,
        |         count(*) OVER (PARTITION BY cid) AS n_cell
        |       FROM dd)
        |SELECT vec_id, cid, d2,
        |       CASE WHEN rk <= ceil(n_cell * 0.5) THEN 1 ELSE 0 END
        |         AS kept
        |FROM rr ORDER BY vec_id""".stripMargin,
    // q182: retention triangle — distinct active (user, epoch-day),
    // min-day cohort, exact distinct-user counts per offset.
    "q182_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |f AS (SELECT u, min(d) AS cohort_day FROM a GROUP BY u)
        |SELECT f.cohort_day, a.d - f.cohort_day AS day_offset,
        |       CAST(count(DISTINCT a.u) AS BIGINT) AS n_users
        |FROM a JOIN f ON a.u = f.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q183: strictly-ordered funnel — first signup, first view AFTER
    // it, first purchase AFTER that; ppm conversion by integer div.
    "q183_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.u
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.u
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY 1),
        |f AS (SELECT s1.u, s1.t1, s2.t2, s3.t3 FROM s1
        |      LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u)
        |SELECT CAST(floor(epoch(t1) / 86400) AS BIGINT) AS cohort_day,
        |       CAST(count(*) AS BIGINT) AS n_step1,
        |       CAST(count(t2) AS BIGINT) AS n_step2,
        |       CAST(count(t3) AS BIGINT) AS n_step3,
        |       CAST(count(t3) * 1000000 // count(*) AS BIGINT) AS conv_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // q184: key-skew diagnostic — per-key counts, integer µ-share and
    // ×100 mean-ratio; (cnt DESC, k) tie-break, all 64-bit exact.
    "q184_key_skew" ->
      """WITH c AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT)
        |             AS cnt FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |        CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT c.k, c.cnt,
        |       CAST(c.cnt * 1000000 // t.total AS BIGINT) AS share_ppm,
        |       CAST(c.cnt * 100 * t.n_keys // t.total AS BIGINT)
        |         AS skew_x100,
        |       t.n_keys, t.total
        |FROM c, t ORDER BY c.cnt DESC, c.k LIMIT 5""".stripMargin,
    // q185: batched binary-quantized kNN — q177's two deterministic
    // boundaries per query id; full-result replay.
    "q185_binary_knn" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e
        |      WHERE vec_id % 100 = 0),
        |ham AS (SELECT q.qid, e.vec_id, e.v, q.qv,
        |          CAST(len([i for i in range(1, len(e.v) + 1)
        |                    if (e.v[CAST(i AS INTEGER)] > 0)
        |                       <> (q.qv[CAST(i AS INTEGER)] > 0)])
        |            AS INTEGER) AS hd
        |        FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |pre AS (SELECT * FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY qid ORDER BY hd, vec_id) AS rk FROM ham)
        |  WHERE rk <= 20),
        |cosd AS (SELECT qid, vec_id, hd,
        |           round(list_dot_product(v, qv) /
        |                 (sqrt(list_dot_product(v, v)) *
        |                  sqrt(list_dot_product(qv, qv))), 4) + 0.0 AS cos
        |         FROM pre)
        |SELECT qid, vec_id, hd, cos FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY qid ORDER BY cos DESC, vec_id) AS crk
        |  FROM cosd)
        |WHERE crk <= 5 ORDER BY qid, cos DESC, vec_id""".stripMargin,
    // q186: codebook drift — a SECOND Lloyd chain trained on the even
    // half (same init/round/tie contract, corpus parameter e2), both
    // codebooks probe the FULL corpus, majority-alignment purity per
    // new cell. Full replay.
    "q186_codebook_drift" ->
      s"""$kmeansChainSql,
        |e2 AS (SELECT * FROM e WHERE vec_id % 2 = 0),
        |c0o AS (SELECT vec_id AS cid, v AS c FROM e2
        |        ORDER BY vec_id LIMIT 8),
        |${kmeansAssignBlock("a1o", "c0o", "e2")},
        |${kmeansUpdateBlock("c1o", "a1o", "e2")},
        |${kmeansAssignBlock("a2o", "c1o", "e2")},
        |${kmeansUpdateBlock("c2o", "a2o", "e2")},
        |${kmeansAssignBlock("a3o", "c2o", "e")},
        |p AS (SELECT a3.vec_id, a3o.cid AS cid_old, a3.cid AS cid_new
        |      FROM a3 JOIN a3o USING (vec_id)),
        |g AS (SELECT cid_new, cid_old, CAST(count(*) AS BIGINT) AS cnt
        |      FROM p GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY cid_new ORDER BY cnt DESC, cid_old) AS rk,
        |        CAST(sum(cnt) OVER (PARTITION BY cid_new) AS BIGINT)
        |          AS n
        |      FROM g)
        |SELECT cid_new, n, cid_old AS major_old_cid, cnt AS n_major,
        |       CAST(cnt * 1000000 // n AS BIGINT) AS purity_ppm
        |FROM r WHERE rk = 1 ORDER BY cid_new""".stripMargin,
    // q187: join-size estimate — Σ cntA·cntB exactly, plus the 1/16
    // k % 16 == 0 sample scaled by 16; integer products, exact replay.
    "q187_join_estimate" ->
      """WITH ca AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT)
        |              AS ca FROM orders GROUP BY 1),
        |cb AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
        |       FROM lineitem GROUP BY 1),
        |p AS (SELECT ca.k, ca.ca * cb.cb AS p FROM ca
        |      JOIN cb ON ca.k = cb.k),
        |s AS (SELECT CAST(sum(p) AS BIGINT) AS exact_rows,
        |        CAST(sum(CASE WHEN k % 16 = 0 THEN p ELSE 0 END) * 16
        |          AS BIGINT) AS est_rows
        |      FROM p)
        |SELECT exact_rows, est_rows,
        |       CASE WHEN exact_rows = 0 THEN CAST(0 AS BIGINT)
        |            ELSE CAST(abs(est_rows - exact_rows) * 1000000
        |                      // exact_rows AS BIGINT) END AS err_ppm
        |FROM s""".stripMargin,
    // q188: gaps-and-islands — d − row_number is constant within a
    // consecutive-day run; exact integer grouping in both engines.
    "q188_streaks" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |g AS (SELECT u, d, d - row_number() OVER
        |        (PARTITION BY u ORDER BY d) AS grp FROM a),
        |i AS (SELECT u, grp, CAST(count(*) AS BIGINT) AS len
        |      FROM g GROUP BY u, grp)
        |SELECT u, CAST(count(*) AS BIGINT) AS n_streaks,
        |       CAST(max(len) AS BIGINT) AS longest,
        |       CAST(sum(len) AS BIGINT) AS active_days
        |FROM i GROUP BY u ORDER BY u""".stripMargin,
    // q189: rolling 7-day distinct users — re-counted per observed end
    // day (distinct is not additive); exact counts.
    "q189_rolling_dau" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |days AS (SELECT DISTINCT d AS end_day FROM a)
        |SELECT days.end_day,
        |       CAST(count(DISTINCT a.u) AS BIGINT) AS n_users
        |FROM a JOIN days ON a.d >= days.end_day - 6
        |               AND a.d <= days.end_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q160: KMV resemblance — the estimate is a pure function of the
    // 32-bit md5-prefix content hash (q149's list_reduce idiom), so the
    // oracle replays est AND exact; integer counts, one rounded division
    // each (per-row arithmetic, engine-exact).
    "q160_kmv_overlap" ->
      """WITH b AS (SELECT DISTINCT source AS g,
        |             list_reduce(
        |               [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |                for c in string_split(
        |                  substr(md5(text), 1, 8), '')],
        |               (a, b) -> a * 16 + b) AS h
        |           FROM documents),
        |sig AS (SELECT g, h FROM (
        |          SELECT g, h,
        |            row_number() OVER (PARTITION BY g ORDER BY h) AS rk
        |          FROM b) WHERE rk <= 192),
        |gs AS (SELECT DISTINCT g FROM b),
        |pairs AS (SELECT x.g AS src_a, y.g AS src_b
        |          FROM gs x JOIN gs y ON x.g < y.g),
        |uni AS (SELECT DISTINCT src_a, src_b, h FROM (
        |          SELECT p.src_a, p.src_b, s.h
        |          FROM pairs p JOIN sig s ON s.g = p.src_a
        |          UNION ALL
        |          SELECT p.src_a, p.src_b, s.h
        |          FROM pairs p JOIN sig s ON s.g = p.src_b)),
        |topu AS (SELECT src_a, src_b, h FROM (
        |           SELECT src_a, src_b, h, row_number() OVER
        |             (PARTITION BY src_a, src_b ORDER BY h) AS rk
        |           FROM uni) WHERE rk <= 192),
        |nb AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_both
        |       FROM topu t
        |       WHERE EXISTS (SELECT 1 FROM sig s
        |                     WHERE s.g = t.src_a AND s.h = t.h)
        |         AND EXISTS (SELECT 1 FROM sig s
        |                     WHERE s.g = t.src_b AND s.h = t.h)
        |       GROUP BY src_a, src_b),
        |nu AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_u
        |       FROM topu GROUP BY src_a, src_b),
        |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY g),
        |it AS (SELECT x.g AS src_a, y.g AS src_b,
        |         CAST(count(*) AS BIGINT) AS n_i
        |       FROM b x JOIN b y ON x.h = y.h AND x.g < y.g
        |       GROUP BY x.g, y.g)
        |SELECT p.src_a, p.src_b,
        |       round(coalesce(nb.n_both, 0) /
        |             CAST(coalesce(nu.n_u, 1) AS DOUBLE), 4) AS kmv_est,
        |       round(coalesce(it.n_i, 0) /
        |             CAST(sa.n + sb.n - coalesce(it.n_i, 0) AS DOUBLE), 4)
        |         AS exact_j
        |FROM pairs p
        |LEFT JOIN nu USING (src_a, src_b)
        |LEFT JOIN nb USING (src_a, src_b)
        |JOIN sz sa ON sa.g = p.src_a
        |JOIN sz sb ON sb.g = p.src_b
        |LEFT JOIN it USING (src_a, src_b)
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    // q158: the SALTED semDedup plan must reproduce q131's decision
    // row-for-row — the oracle is deliberately the UNSALTED pairwise
    // SQL (salting is a physical-plan change, not a semantic one).
    "q158_semdedup_salted" ->
      """WITH e AS (SELECT vec_id, CAST(label AS INTEGER) AS cell,
        |                  CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |d AS (SELECT DISTINCT b.vec_id
        |      FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.v, b.v) /
        |            (sqrt(list_dot_product(a.v, a.v)) *
        |             sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35)
        |SELECT e.vec_id, e.cell,
        |       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM e LEFT JOIN d ON e.vec_id = d.vec_id
        |ORDER BY e.vec_id""".stripMargin,
    // q132: identical PII plant (same doc_id-derived email/IP/phone
    // appends), then the same three regexes — counts on the raw text,
    // replacement in email -> IP -> phone order, 'g' = replace ALL
    // occurrences (DuckDB's default is first-only; Spark replaces all).
    "q132_pii_scrub" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN ' contact u' || CAST(doc_id AS VARCHAR)
        |            || '@mail.example.com' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0
        |       THEN ' host 10.2.' || CAST(doc_id % 250 AS VARCHAR) || '.7'
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0
        |       THEN ' call ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |            || '-555-0199' ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS clean_md5
        |FROM p
        |ORDER BY doc_id""".stripMargin,
    // q133: every 2nd 64-byte frame; checksum = fold (a*31+byte) % 2^31-1
    // over the frame's bytes (ASCII text => ascii(char) == byte).
    "q133_frame_sample" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |f AS (SELECT doc_id, CAST(u.f AS INTEGER) AS frame_no,
        |             CAST(u.f * 64 AS INTEGER) AS off,
        |             substring(text, CAST(u.f * 64 + 1 AS INTEGER), 64)
        |               AS frame
        |      FROM t, LATERAL unnest(
        |        range(0, CAST(ceil(n / 64.0) AS BIGINT), 2)) u(f))
        |SELECT doc_id, frame_no, off,
        |       CAST(length(frame) AS INTEGER) AS n_bytes,
        |       CAST(list_reduce(
        |         [ascii(c) for c in string_split(frame, '')],
        |         (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 2147483647)
        |         AS BIGINT) AS checksum
        |FROM f
        |ORDER BY doc_id, frame_no""".stripMargin,
    // q134: payloads over 200 bytes keep every stride-th byte (0-based
    // index % stride == 0, stride = ceil(n/200)); md5 over the kept bytes.
    "q134_resize_media" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |r AS (SELECT doc_id, n,
        |             CASE WHEN n <= 200 THEN text
        |                  ELSE array_to_string(
        |                    [substring(text, CAST(p AS INTEGER), 1)
        |                     for p in range(1, CAST(n + 1 AS BIGINT),
        |                       CAST(ceil(n / 200.0) AS BIGINT))], '')
        |             END AS out
        |      FROM t)
        |SELECT doc_id,
        |       CAST(length(out) AS INTEGER) AS n_bytes,
        |       CAST(n AS INTEGER) AS orig_bytes,
        |       round(CAST(length(out) AS DOUBLE) / n, 4) AS scale,
        |       md5(out) AS out_md5
        |FROM r
        |ORDER BY doc_id""".stripMargin,
    // q135: five Gopher rules, same int/int arithmetic. Spark arrays and
    // DuckDB lists both count words via string_split on single spaces.
    "q135_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_words,
        |  round(CAST(length(text) - (len(toks) - 1) AS DOUBLE)
        |        / len(toks), 4) AS mean_word_len,
        |  CAST(len(regexp_extract_all(text, '#'))
        |       + len(regexp_extract_all(text, '\.\.\.')) AS INTEGER)
        |    AS n_symbols,
        |  CAST(len([w for w in toks if regexp_matches(w, '[A-Za-z]')])
        |       AS INTEGER) AS n_alpha_words,
        |  CAST(len(list_intersect(list_distinct(toks),
        |    ['the','be','to','of','and','that','have','with']))
        |    AS INTEGER) AS n_stop_distinct
        |  FROM t)
        |SELECT doc_id, n_words, mean_word_len, n_symbols, n_alpha_words,
        |  n_stop_distinct,
        |  CAST(n_words >= 20 AND n_words <= 100000 AS INTEGER)
        |    AS r_word_count,
        |  CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INTEGER)
        |    AS r_word_len,
        |  CAST(n_symbols < n_words * 0.1 AS INTEGER) AS r_symbol,
        |  CAST(n_alpha_words >= n_words * 0.8 AS INTEGER) AS r_alpha,
        |  CAST(n_stop_distinct >= 2 AS INTEGER) AS r_stop,
        |  CAST(n_words >= 20 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND n_symbols < n_words * 0.1
        |    AND n_alpha_words >= n_words * 0.8
        |    AND n_stop_distinct >= 2 AS INTEGER) AS gopher_pass
        |FROM m
        |ORDER BY doc_id""".stripMargin,
    // q136/q137: the k-means chain replays Spark's iterations exactly —
    // same init (k lowest vec_ids), same left-fold dot products, same
    // lowest-cid tie-break, and the same round-to-6-decimals centroid
    // update that makes the FP mean engine-independent.
    "q136_kmeans" ->
      s"""$kmeansChainSql
        |SELECT vec_id, cid FROM a3 ORDER BY vec_id""".stripMargin,
    "q137_semdedup_trained" ->
      s"""$kmeansChainSql,
        |p AS (SELECT DISTINCT ab.vec_id
        |      FROM a3 aa JOIN e ea ON aa.vec_id = ea.vec_id
        |      JOIN a3 ab ON aa.cid = ab.cid AND aa.vec_id < ab.vec_id
        |      JOIN e eb ON ab.vec_id = eb.vec_id
        |      WHERE round(list_dot_product(ea.v, eb.v) /
        |            (sqrt(list_dot_product(ea.v, ea.v)) *
        |             sqrt(list_dot_product(eb.v, eb.v))), 4) >= 0.35)
        |SELECT a3.vec_id, a3.cid,
        |       CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM a3 LEFT JOIN p ON a3.vec_id = p.vec_id
        |ORDER BY a3.vec_id""".stripMargin,
    // q138: IVF-over-trained-kmeans reduced to the annSummary exactness
    // bound (same shape as q43/q53); recall measured on the fixture.
    "q138_ivf_kmeans" ->
      """SELECT CAST(0 AS BIGINT) AS qid, CAST(10 AS BIGINT) AS n_results,
        |       1 AS got_k, 1 AS recall_ok""".stripMargin,
    // q139: rolling_hash replayed via list_reduce (rollingHashSql — the
    // same twin every hash-dependent oracle uses); dot_product of a
    // vector with itself via list_dot_product.
    "q139_sql_functions" ->
      s"""WITH n AS (SELECT count(*) AS cnt FROM embeddings)
        |SELECT d.doc_id,
        |       ${rollingHashSql("d.text")} AS fp,
        |       CAST(${rollingHashSql("d.text")} % 100 AS INTEGER) AS bucket,
        |       round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                              CAST(e.embedding AS DOUBLE[])), 4)
        |         AS self_dot
        |FROM documents d
        |CROSS JOIN n
        |JOIN embeddings e ON e.vec_id = d.doc_id % n.cnt
        |ORDER BY d.doc_id""".stripMargin,
    // q140: the GK sketch value never reaches the output — only the group
    // count and the rank-bracket boolean, which holds by the sketch's
    // guarantee, so DuckDB asserts it as the constant 1.
    "q140_approx_percentile" ->
      """SELECT o_orderpriority, count(*) AS n, 1 AS rank_ok
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // q141: farthest-first seeds (k-center greedy, ties to lowest id),
    // then one Lloyd update + final assignment — same exact-replay rules
    // as q136 (left-fold dots, round-6 means, lowest-cid ties).
    "q141_kmeans_farthest" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |${farthestSeedsSql(4)},
        |${kmeansAssignBlock("a1", "c0")},
        |${kmeansUpdateBlock("c1", "a1")},
        |${kmeansAssignBlock("a2", "c1")}
        |SELECT vec_id, cid FROM a2 ORDER BY vec_id""".stripMargin,
    // q142: updates over the deterministic vec_id % 4 sample (es), final
    // assignment over the full corpus (e) — same exact-replay rules.
    // q143: k-means++ D²-sampling seeds — integer weights round(d2·1e6),
    // window cumsum in vec_id order, threshold (md5-hash · Σw) div 2³² —
    // then one Lloyd update + final assignment, same exact-replay rules
    // as q136.
    "q143_kmeans_pp" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |${ppSeedsSql(4)},
        |${kmeansAssignBlock("a1", "c0")},
        |${kmeansUpdateBlock("c1", "a1")},
        |${kmeansAssignBlock("a2", "c1")}
        |SELECT vec_id, cid FROM a2 ORDER BY vec_id""".stripMargin,
    // q144: BM25 — determinism notes on the shared chain at bm25ChainSql.
    "q144_bm25" ->
      s"""$bm25ChainSql
        |SELECT doc_id, round(bm25, 4) AS bm25 FROM score
        |ORDER BY round(bm25, 4) DESC, doc_id LIMIT 100""".stripMargin,
    // q145: logistic-regression training replayed as a generated CTE
    // chain (w0 -> g1/w1 -> ... -> w3); the only cross-row float op is
    // the gradient sum, done as a LONG sum of micro-gradients in both
    // engines. Feature CTEs reuse the q45 shapes (proven to hash-match).
    "q145_quality_lr" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |        CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
        |        CAST(len(list_filter(toks,
        |          x -> x IN ('the','a','of','and','is'))) AS INTEGER) AS n_stop,
        |        list_contains(toks, 'dup') AS has_dup
        |      FROM t),
        |feat AS (SELECT doc_id,
        |        CAST(least(n_tokens / 100.0, 1.0) AS DOUBLE) AS x1,
        |        round(n_unique / n_tokens, 4) AS x2,
        |        round(n_stop / n_tokens, 4) AS x3,
        |        CAST(CASE WHEN has_dup THEN 1 ELSE 0 END AS DOUBLE) AS y
        |      FROM m),
        |${lrChainSql(3)}
        |SELECT f.doc_id, f.y,
        |       round(1.0 / (1.0 + exp(-($lrZSql))), 4) AS p
        |FROM feat f, w3 w
        |WHERE f.doc_id < 100
        |ORDER BY f.doc_id""".stripMargin,
    // q146: PQ codes — 4 independent subspace Lloyd chains (the q136
    // machinery over list slices); qerr recomputes each subspace's d² to
    // its POST-UPDATE winning centroid, summed in fixed left-assoc order.
    "q146_pq_codes" ->
      s"""${pqChainSql()}
        |SELECT e.vec_id,
        |       p1a2.cid AS c1, p2a2.cid AS c2,
        |       p3a2.cid AS c3, p4a2.cid AS c4,
        |       round(${(1 to 4).map(j =>
                   s"(list_dot_product(e$j.v, e$j.v)" +
                   s" - 2 * list_dot_product(e$j.v, p${j}c1.c)" +
                   s" + list_dot_product(p${j}c1.c, p${j}c1.c))")
                   .mkString("\n        |             + ")}, 4) AS qerr
        |FROM e
        |${(1 to 4).map(j =>
             s"JOIN e$j ON e$j.vec_id = e.vec_id\n" +
             s"        |JOIN p${j}a2 ON p${j}a2.vec_id = e.vec_id\n" +
             s"        |JOIN p${j}c1 ON p${j}c1.cid = p${j}a2.cid")
             .mkString("\n        |")}
        |ORDER BY e.vec_id""".stripMargin,
    // q147: BPE merges — per-round argmax over exact long pair counts is
    // a total order (f DESC, l, r); the merge fold is replayed by
    // list_reduce on the space-joined symbol string.
    "q147_bpe_merges" ->
      s"""${bpeChainSql(6)}
        |${(1 to 6).map(i =>
             s"SELECT CAST($i AS INTEGER) AS round, l AS lhs, r AS rhs," +
             s" CAST(f AS BIGINT) AS freq FROM m$i")
             .mkString("\n        |UNION ALL\n        |")}
        |ORDER BY round""".stripMargin,
    // q148: decontamination — the shared-8-gram count is a count of
    // DISTINCT md5 strings (exact in both engines); zeros are kept via
    // the LEFT JOIN so the report covers every train doc in the window.
    "q148_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |eg AS (SELECT DISTINCT
        |         md5(array_to_string(toks[u.p : u.p + 7], ' ')) AS h
        |       FROM t, LATERAL unnest(range(1, len(toks) - 6)) u(p)
        |       WHERE doc_id % 3 = 0 AND len(toks) >= 8),
        |tg AS (SELECT doc_id,
        |         md5(array_to_string(toks[u.p : u.p + 7], ' ')) AS h
        |       FROM t, LATERAL unnest(range(1, len(toks) - 6)) u(p)
        |       WHERE doc_id % 3 <> 0 AND doc_id < 200
        |         AND len(toks) >= 8),
        |sh AS (SELECT tg.doc_id, count(DISTINCT tg.h) AS n_shared
        |       FROM tg JOIN eg USING (h) GROUP BY tg.doc_id)
        |SELECT d.doc_id, CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared
        |FROM documents d LEFT JOIN sh USING (doc_id)
        |WHERE d.doc_id % 3 <> 0 AND d.doc_id < 200
        |ORDER BY d.doc_id""".stripMargin,
    // q149: A-ES weighted sampling — u and the key are row-local double
    // math (ln + one division), compared as a rounded integer nano-key;
    // the q129 list_reduce idiom replays the 32-bit md5 hash exactly.
    "q149_weighted_sample" ->
      """WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |             list_reduce(
        |               [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |                for c in string_split(
        |                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '')],
        |               (a, b) -> a * 16 + b) AS h
        |           FROM documents WHERE n_chars > 0)
        |SELECT doc_id, w,
        |       CAST(round(ln((h + 1) / 4294967296.0) / w
        |                  * 1000000000.0, 0) AS BIGINT) AS key_nano
        |FROM t ORDER BY key_nano DESC, doc_id LIMIT 25""".stripMargin,
    // q150: per-source quota — row_number over (md5(text), doc_id) is a
    // total order both engines compute identically; 20 sources x cap 10.
    "q150_source_quota" ->
      """WITH r AS (SELECT source AS stratum, doc_id,
        |             row_number() OVER (PARTITION BY source
        |               ORDER BY md5(text), doc_id) AS rk
        |           FROM documents)
        |SELECT stratum, CAST(rk AS BIGINT) AS rk, doc_id
        |FROM r WHERE rk <= 10 ORDER BY stratum, rk""".stripMargin,
    // q151: stratified sampling — bucket thresholds and keep decisions
    // are all integer comparisons; thr = (2^32 * num) div den per stratum
    // (536870912 / 1073741824 / 2147483648 = 1/8, 1/4, 1/2).
    "q151_stratified_sample" ->
      """WITH t AS (SELECT CASE WHEN n_chars < 214 THEN '1_short'
        |                       WHEN n_chars < 375 THEN '2_medium'
        |                       ELSE '3_long' END AS stratum,
        |             list_reduce(
        |               [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |                for c in string_split(
        |                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '')],
        |               (a, b) -> a * 16 + b) AS h,
        |             CAST(doc_id AS BIGINT) AS id
        |           FROM documents),
        |k AS (SELECT stratum, h, id,
        |        CASE stratum WHEN '1_short' THEN 536870912
        |                     WHEN '2_medium' THEN 1073741824
        |                     ELSE 2147483648 END AS thr
        |      FROM t)
        |SELECT stratum, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_kept,
        |       CAST(sum(CASE WHEN h < thr THEN id ELSE 0 END) AS BIGINT)
        |         AS kept_id_sum
        |FROM k GROUP BY stratum ORDER BY stratum""".stripMargin,
    // q152: BPE application — the q147 chain's final seqs table s6 IS
    // the encoded vocabulary; the merge fold is the same list_reduce.
    "q152_bpe_encode" ->
      s"""${bpeChainSql(6)}
        |SELECT word, CAST(freq AS BIGINT) AS freq,
        |       CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sym, seq
        |FROM s6 ORDER BY word""".stripMargin,
    // q157: corpus BPE tokenizer pass — per-doc word + BPE-symbol
    // counts via the encoded-vocab dictionary join; the LEFT JOIN keeps
    // empty docs at 0, mirroring the Spark side's total report.
    "q157_bpe_tokenize" ->
      s"""${bpeChainSql(6)},
        |vocab AS (SELECT word,
        |            CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sym
        |          FROM s6),
        |w AS (SELECT doc_id, word FROM
        |        (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |         FROM documents)
        |      WHERE word <> ''),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |          CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
        |        FROM w JOIN vocab USING (word) GROUP BY doc_id)
        |SELECT d.doc_id,
        |       coalesce(agg.n_words, 0) AS n_words,
        |       coalesce(agg.n_bpe_tokens, 0) AS n_bpe_tokens
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // q153: integer PageRank — every update is 64-bit integer math
    // (div = floor division), so the CTE chain replays the exact ranks;
    // DuckDB integer sums go HUGEINT and must be CAST back to BIGINT.
    "q153_pagerank" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey + 1000000000 AS BIGINT) AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.dst AS node, CAST(sum(r.r // od.outdeg) AS BIGINT) AS s
        |       FROM e JOIN od USING (src) JOIN r0 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.node, CAST(150000 +
        |         (850000 * coalesce(c1.s, 0)) // 1000000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.dst AS node, CAST(sum(r.r // od.outdeg) AS BIGINT) AS s
        |       FROM e JOIN od USING (src) JOIN r1 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.node, CAST(150000 +
        |         (850000 * coalesce(c2.s, 0)) // 1000000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.dst AS node, CAST(sum(r.r // od.outdeg) AS BIGINT) AS s
        |       FROM e JOIN od USING (src) JOIN r2 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.node, CAST(150000 +
        |         (850000 * coalesce(c3.s, 0)) // 1000000 AS BIGINT) AS r
        |       FROM n LEFT JOIN c3 USING (node))
        |SELECT node, r FROM r3 ORDER BY r DESC, node LIMIT 50""".stripMargin,
    // q154: temperature sampling — the micro-weight round(share^0.5·1e6)
    // is the only float step (6-dp rounding, ulp-flip measure-zero); the
    // target and threshold arithmetic is the q129 integer machinery.
    "q154_temp_sample" ->
      """WITH t AS (SELECT source AS stratum,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             list_reduce(
        |               [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |                for c in string_split(
        |                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '')],
        |               (a, b) -> a * 16 + b) AS h
        |           FROM documents),
        |strata AS (SELECT stratum, CAST(sum(n_tok) AS BIGINT) AS src_tok
        |           FROM t GROUP BY stratum),
        |g AS (SELECT CAST(sum(src_tok) AS BIGINT) AS tot FROM strata),
        |ww AS (SELECT stratum, src_tok, tot,
        |         CAST(round(pow(src_tok / CAST(tot AS DOUBLE), 0.5)
        |           * 1000000.0, 0) AS BIGINT) AS w
        |       FROM strata CROSS JOIN g),
        |gw AS (SELECT CAST(sum(w) AS BIGINT) AS w_sum FROM ww),
        |thr AS (SELECT stratum,
        |          (((tot * 1 * w) // (2 * w_sum)) * 4294967296) // src_tok
        |            AS thr
        |        FROM ww CROSS JOIN gw)
        |SELECT stratum, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_sampled,
        |       CAST(sum(CASE WHEN h < thr THEN n_tok ELSE 0 END) AS BIGINT)
        |         AS tok_sampled
        |FROM t JOIN thr USING (stratum)
        |GROUP BY stratum ORDER BY stratum""".stripMargin,
    // q156: IVF-PQ serving reduced to the annSummary exactness bound —
    // deterministic on the fixture (measured ADC overlap vs exact L2
    // top-10: 4/10 at sf0.01, 3/10 at sf0.1; bound >= 2). NOTE (ADVICE
    // r6): this oracle pins only the summary invariants, like the other
    // three ANN oracle sites (q19/q43/q53) — DuckDB verifies nothing
    // about the ADC arithmetic itself; NorthStarSpec's hand-traced ADC
    // scores carry the real computation verification.
    "q156_ivfpq" ->
      """SELECT CAST(0 AS BIGINT) AS qid, CAST(10 AS BIGINT) AS n_results,
        |       1 AS got_k, 1 AS recall_ok""".stripMargin,
    // q155: column profile — count/nulls/distinct/min/max are exact in
    // both engines; min/max aggregate TYPED then cast to VARCHAR (same
    // order as Spark), so '104949.5'-style renders agree.
    "q155_col_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_discount' AS col_name, count(l_discount) AS n_non_null,
        |    count(CASE WHEN l_discount IS NULL THEN 1 END) AS n_nulls,
        |    count(DISTINCT l_discount) AS n_distinct,
        |    CAST(min(l_discount) AS VARCHAR) AS min_val,
        |    CAST(max(l_discount) AS VARCHAR) AS max_val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(l_extendedprice),
        |    count(CASE WHEN l_extendedprice IS NULL THEN 1 END),
        |    count(DISTINCT l_extendedprice),
        |    CAST(min(l_extendedprice) AS VARCHAR),
        |    CAST(max(l_extendedprice) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', count(l_linestatus),
        |    count(CASE WHEN l_linestatus IS NULL THEN 1 END),
        |    count(DISTINCT l_linestatus),
        |    CAST(min(l_linestatus) AS VARCHAR),
        |    CAST(max(l_linestatus) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(l_quantity),
        |    count(CASE WHEN l_quantity IS NULL THEN 1 END),
        |    count(DISTINCT l_quantity),
        |    CAST(min(l_quantity) AS VARCHAR),
        |    CAST(max(l_quantity) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(l_returnflag),
        |    count(CASE WHEN l_returnflag IS NULL THEN 1 END),
        |    count(DISTINCT l_returnflag),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
        |) ORDER BY col_name""".stripMargin,
    "q142_kmeans_minibatch" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |es AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 0),
        |c0 AS (SELECT vec_id AS cid, v AS c FROM es
        |       ORDER BY vec_id LIMIT 8),
        |${kmeansAssignBlock("a1", "c0", "es")},
        |${kmeansUpdateBlock("c1", "a1", "es")},
        |${kmeansAssignBlock("a2", "c1", "es")},
        |${kmeansUpdateBlock("c2", "a2", "es")},
        |${kmeansAssignBlock("a3", "c2", "e")}
        |SELECT vec_id, cid FROM a3 ORDER BY vec_id""".stripMargin,
    // q190: exact k-th smallest of the STORED o_custkey column — same
    // replay-by-ordering oracle as q180; the Spark side's refinement
    // rounds carry literal range predicates that reach the parquet
    // scan as PushedFilters (the stored-column pruning demonstration).
    "q190_stored_quantiles" ->
      """WITH v AS (SELECT CAST(o_custkey AS BIGINT) AS v FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
        |q AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        |SELECT q.q, n.n, CAST(ceil(q.q * n.n) AS BIGINT) AS k,
        |       (SELECT r.v FROM r
        |        WHERE r.rk = CAST(ceil(q.q * n.n) AS BIGINT)) AS value
        |FROM q, n ORDER BY q.q""".stripMargin,
    // q191: rolling DAU sketch validation — the oracle replays the
    // exact end-day counts and pins the HLL-vs-exact envelope flag ≡ 1
    // (the raw approx value is engine-internal; q156's summary-
    // invariant pattern). The spec asserts the same envelope in-engine.
    "q191_rolling_dau_hll" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |days AS (SELECT DISTINCT d AS end_day FROM a)
        |SELECT days.end_day,
        |       CAST(count(DISTINCT a.u) AS BIGINT) AS n_users,
        |       CAST(1 AS INTEGER) AS within_bound
        |FROM a JOIN days ON a.d >= days.end_day - 6
        |               AND a.d <= days.end_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q192: incremental SCD2 — Spark merges the Jan-16 time-split
    // (existing versions + suffix batch, never rescanning the log);
    // the oracle is the FULL-LOG rebuild, so a hash match IS the
    // merge(split) == rebuild(full) proof.
    // (null-safe change detection as in q178 — the gate pins the same
    // rn=1 + IS DISTINCT FROM semantics Upsert.scd2 implements)
    "q192_scd2_merge" ->
      """WITH o AS (SELECT user_id, event_id, event_type, ts,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id)
        |               AS prev_state,
        |             row_number() OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |           FROM events),
        |r AS (SELECT user_id, event_id, event_type, ts FROM o
        |      WHERE rn = 1 OR prev_state IS DISTINCT FROM event_type)
        |SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        |       lead(ts) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       CASE WHEN lead(ts) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS is_current
        |FROM r ORDER BY user_id, valid_from, event_id""".stripMargin,
    // q193: single-pass funnel — ONE event-log scan (per-user sorted
    // (ts, stage) fold); the oracle is q183's per-stage join form, so
    // the hash match proves the two funnel plans equal.
    "q193_funnel_onepass" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.u
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.u
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY 1),
        |f AS (SELECT s1.u, s1.t1, s2.t2, s3.t3 FROM s1
        |      LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u)
        |SELECT CAST(floor(epoch(t1) / 86400) AS BIGINT) AS cohort_day,
        |       CAST(count(*) AS BIGINT) AS n_step1,
        |       CAST(count(t2) AS BIGINT) AS n_step2,
        |       CAST(count(t3) AS BIGINT) AS n_step3,
        |       CAST(count(t3) * 1000000 // count(*) AS BIGINT) AS conv_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // q194: OPTIMIZE ZORDER — the Spark side rewrites a manifest table
    // as Morton-clustered files and reads a stats-pruned box; a plain
    // WHERE on the raw parquet replays it, proving the cluster rewrite
    // preserved every row and pruning dropped none.
    "q194_zorder_optimize" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 10 AND 60 AND l_suppkey BETWEEN 1 AND 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // q195: join-strategy auto-pick — per-side row/key counts, exact
    // join cardinality, hottest-key skew_x100, and the broadcast /
    // salted / shuffle CASE — all integer arithmetic, so the DECISION
    // replays, not just the inputs.
    "q195_join_strategy" ->
      """WITH ca1 AS (SELECT n_regionkey AS k, CAST(count(*) AS BIGINT)
        |               AS c FROM nation GROUP BY 1),
        |cb1 AS (SELECT r_regionkey AS k, CAST(count(*) AS BIGINT) AS c
        |        FROM region GROUP BY 1),
        |ca2 AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
        |        FROM orders GROUP BY 1),
        |cb2 AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
        |        FROM lineitem GROUP BY 1),
        |ca3 AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS c
        |        FROM customer GROUP BY 1),
        |cb3 AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
        |        FROM orders GROUP BY 1),
        |s1 AS (SELECT 'nation_region' AS pair,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM ca1) AS rows_a,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM cb1) AS rows_b,
        |         (SELECT CAST(count(*) AS BIGINT) FROM ca1) AS keys_a,
        |         (SELECT CAST(count(*) AS BIGINT) FROM cb1) AS keys_b,
        |         (SELECT CAST(coalesce(sum(ca1.c * cb1.c), 0) AS BIGINT)
        |          FROM ca1 JOIN cb1 USING (k)) AS est_rows,
        |         (SELECT CAST(max(c) * 100 * count(*) // sum(c)
        |            AS BIGINT) FROM ca1) AS skew_x100_a,
        |         (SELECT CAST(max(c) * 100 * count(*) // sum(c)
        |            AS BIGINT) FROM cb1) AS skew_x100_b),
        |s2 AS (SELECT 'orders_lineitem' AS pair,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM ca2) AS rows_a,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM cb2) AS rows_b,
        |         (SELECT CAST(count(*) AS BIGINT) FROM ca2) AS keys_a,
        |         (SELECT CAST(count(*) AS BIGINT) FROM cb2) AS keys_b,
        |         (SELECT CAST(coalesce(sum(ca2.c * cb2.c), 0) AS BIGINT)
        |          FROM ca2 JOIN cb2 USING (k)) AS est_rows,
        |         (SELECT CAST(max(c) * 100 * count(*) // sum(c)
        |            AS BIGINT) FROM ca2) AS skew_x100_a,
        |         (SELECT CAST(max(c) * 100 * count(*) // sum(c)
        |            AS BIGINT) FROM cb2) AS skew_x100_b),
        |s3 AS (SELECT 'customer_orders' AS pair,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM ca3) AS rows_a,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM cb3) AS rows_b,
        |         (SELECT CAST(count(*) AS BIGINT) FROM ca3) AS keys_a,
        |         (SELECT CAST(count(*) AS BIGINT) FROM cb3) AS keys_b,
        |         (SELECT CAST(coalesce(sum(ca3.c * cb3.c), 0) AS BIGINT)
        |          FROM ca3 JOIN cb3 USING (k)) AS est_rows,
        |         (SELECT CAST(max(c) * 100 * count(*) // sum(c)
        |            AS BIGINT) FROM ca3) AS skew_x100_a,
        |         (SELECT CAST(max(c) * 100 * count(*) // sum(c)
        |            AS BIGINT) FROM cb3) AS skew_x100_b),
        |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3)
        |SELECT pair, rows_a, rows_b, keys_a, keys_b, est_rows,
        |       skew_x100_a, skew_x100_b,
        |       CASE WHEN least(rows_a, rows_b) <= 1000 THEN 'broadcast'
        |            WHEN greatest(skew_x100_a, skew_x100_b) >= 200
        |              THEN 'salted'
        |            ELSE 'shuffle' END AS strategy
        |FROM u ORDER BY pair""".stripMargin,
    // q196: rolling DAU from the persisted per-day HLL state — the
    // oracle replays the exact counts and pins the envelope flag ≡ 1
    // (q191's pattern; the sketch value itself is engine-internal).
    "q196_dau_state" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |days AS (SELECT DISTINCT d AS end_day FROM a)
        |SELECT days.end_day,
        |       CAST(count(DISTINCT a.u) AS BIGINT) AS n_users,
        |       CAST(1 AS INTEGER) AS within_bound
        |FROM a JOIN days ON a.d >= days.end_day - 6
        |               AND a.d <= days.end_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q197: per-dimension PSI drift, even-id snapshot vs full corpus —
    // exact power-of-two bucketing, integer-ppm Laplace-smoothed
    // shares, per-bucket nano-PSI rounded to integers BEFORE the
    // per-dim sum (64-bit exact), so every row replays.
    "q197_embedding_psi" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |xa AS (SELECT CAST(i AS INTEGER) AS dim,
        |         least(7, greatest(0, CAST(floor(
        |           (v[CAST(i + 1 AS INTEGER)] + 0.5) / 0.125)
        |           AS INTEGER))) AS bin
        |       FROM e, range(64) t(i) WHERE vec_id % 2 = 0),
        |xb AS (SELECT CAST(i AS INTEGER) AS dim,
        |         least(7, greatest(0, CAST(floor(
        |           (v[CAST(i + 1 AS INTEGER)] + 0.5) / 0.125)
        |           AS INTEGER))) AS bin
        |       FROM e, range(64) t(i)),
        |ca AS (SELECT dim, bin, CAST(count(*) AS BIGINT) AS ca
        |       FROM xa GROUP BY 1, 2),
        |cb AS (SELECT dim, bin, CAST(count(*) AS BIGINT) AS cb
        |       FROM xb GROUP BY 1, 2),
        |sc AS (SELECT CAST(a.i AS INTEGER) AS dim,
        |         CAST(b.j AS INTEGER) AS bin
        |       FROM range(64) a(i), range(8) b(j)),
        |j AS (SELECT sc.dim, sc.bin, coalesce(ca.ca, 0) AS ca,
        |        coalesce(cb.cb, 0) AS cb
        |      FROM sc LEFT JOIN ca USING (dim, bin)
        |      LEFT JOIN cb USING (dim, bin)),
        |tt AS (SELECT dim, CAST(sum(ca) AS BIGINT) AS n_a,
        |         CAST(sum(cb) AS BIGINT) AS n_b
        |       FROM j GROUP BY 1),
        |p AS (SELECT j.dim, tt.n_a, tt.n_b,
        |        greatest(1, (j.ca + 1) * 1000000 // (tt.n_a + 8))
        |          AS pa_ppm,
        |        greatest(1, (j.cb + 1) * 1000000 // (tt.n_b + 8))
        |          AS pb_ppm
        |      FROM j JOIN tt ON j.dim = tt.dim)
        |SELECT dim, n_a, n_b,
        |       CAST(sum(CAST(round((pa_ppm - pb_ppm) *
        |         ln(CAST(pa_ppm AS DOUBLE) / pb_ppm) * 1000, 0)
        |         AS BIGINT)) AS BIGINT) AS psi_nano
        |FROM p GROUP BY 1, 2, 3 ORDER BY dim""".stripMargin,
    // q198: windowed funnel — each next step must land strictly after
    // the previous AND within 1 day of it; exact interval arithmetic.
    "q198_funnel_window" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.u
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1
        |         AND e.ts <= s1.t1 + INTERVAL 86400 SECONDS
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.u
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |         AND e.ts <= s2.t2 + INTERVAL 86400 SECONDS
        |       GROUP BY 1),
        |f AS (SELECT s1.u, s1.t1, s2.t2, s3.t3 FROM s1
        |      LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u)
        |SELECT CAST(floor(epoch(t1) / 86400) AS BIGINT) AS cohort_day,
        |       CAST(count(*) AS BIGINT) AS n_step1,
        |       CAST(count(t2) AS BIGINT) AS n_step2,
        |       CAST(count(t3) AS BIGINT) AS n_step3,
        |       CAST(count(t3) * 1000000 // count(*) AS BIGINT) AS conv_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // q199: last-touch attribution — latest click/view (by ts, event_id)
    // carried forward per user; purchases within the 7-day lookback
    // credit that touch's channel; integer cents.
    "q199_attribution" ->
      """WITH b AS (SELECT user_id AS u, ts AS t, event_id AS tk,
        |             event_type AS et,
        |             CASE WHEN event_type IN ('click', 'view') THEN
        |               CAST(regexp_extract(props, '[0-9]+') AS INTEGER)
        |             END AS ch,
        |             value
        |           FROM events
        |           WHERE event_type IN ('click', 'view', 'purchase')),
        |c AS (SELECT *,
        |        last_value(CASE WHEN ch IS NOT NULL THEN t END
        |          IGNORE NULLS) OVER
        |          (PARTITION BY u ORDER BY t, tk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS touch_t,
        |        last_value(ch IGNORE NULLS) OVER
        |          (PARTITION BY u ORDER BY t, tk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS touch_ch
        |      FROM b)
        |SELECT touch_ch AS channel, CAST(count(*) AS BIGINT) AS n_conv,
        |       CAST(count(DISTINCT u) AS BIGINT) AS n_users,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM c
        |WHERE et = 'purchase' AND touch_t IS NOT NULL
        |  AND touch_t >= t - INTERVAL 604800 SECONDS
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q200: matryoshka truncation recall — first-16-dims ranking vs the
    // full-dim exact top-10; slices + the same left-fold dot product in
    // both engines, every row replays.
    "q200_matryoshka" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |b AS (SELECT vec_id, v, v[1:16] AS tv FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, tv AS tqv FROM b
        |      WHERE vec_id < 8),
        |sc AS (SELECT q.qid, b.vec_id AS nid,
        |         round(list_dot_product(b.v, q.qv) /
        |           (sqrt(list_dot_product(b.v, b.v)) *
        |            sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos,
        |         round(list_dot_product(b.tv, q.tqv) /
        |           (sqrt(list_dot_product(b.tv, b.tv)) *
        |            sqrt(list_dot_product(q.tqv, q.tqv))), 4) AS tcos
        |       FROM b CROSS JOIN q WHERE b.vec_id <> q.qid),
        |ex AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rk FROM sc) WHERE rk <= 10),
        |tr AS (SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY tcos DESC, nid) AS rk FROM sc) WHERE rk <= 10),
        |h AS (SELECT ex.qid, CAST(count(*) AS BIGINT) AS n_hits
        |      FROM ex JOIN tr ON ex.qid = tr.qid AND ex.nid = tr.nid
        |      GROUP BY 1)
        |SELECT q.qid, coalesce(h.n_hits, 0) AS n_hits,
        |       round(coalesce(h.n_hits, 0) / 10.0, 4) AS recall
        |FROM q LEFT JOIN h ON q.qid = h.qid ORDER BY q.qid""".stripMargin,
    // q201: CUSUM drift monitor — the max(0, S+x) recurrence replayed
    // closed-form as P_d − min(0, running_min(P)); integer ppm terms,
    // exact 64-bit windows in both engines.
    "q201_error_cusum" ->
      """WITH daily AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
        |                 AS d,
        |                 CAST(count(*) AS BIGINT) AS n_events,
        |                 CAST(sum(CASE WHEN event_type = 'error'
        |                   THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |               FROM events GROUP BY 1),
        |b AS (SELECT CAST(sum(n_flagged) * 1000000 // sum(n_events)
        |        AS BIGINT) AS baseline_ppm FROM daily),
        |x AS (SELECT daily.*, b.baseline_ppm,
        |        CAST(n_flagged * 1000000 // n_events AS BIGINT)
        |          AS rate_ppm
        |      FROM daily, b),
        |p AS (SELECT *,
        |        CAST(sum(rate_ppm - baseline_ppm - 10000) OVER
        |          (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           CURRENT ROW) AS BIGINT) AS pp
        |      FROM x),
        |c AS (SELECT *, pp - least(CAST(0 AS BIGINT), CAST(min(pp) OVER
        |        (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
        |         CURRENT ROW) AS BIGINT)) AS cusum
        |      FROM p)
        |SELECT d, n_events, n_flagged, rate_ppm, baseline_ppm, cusum,
        |       CASE WHEN cusum >= 50000 THEN 1 ELSE 0 END AS alarm
        |FROM c ORDER BY d""".stripMargin,
    // q202: data-contract gate — violation COUNTS per expectation;
    // the o_orderpriority list is intentionally partial so the report
    // proves it counts, not just flags.
    "q202_data_contract" ->
      """SELECT 'accepted_values:o_orderpriority' AS check_name,
        |       CAST(count(CASE WHEN o_orderpriority IS NOT NULL
        |         AND o_orderpriority NOT IN
        |           ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |         THEN 1 END) AS BIGINT) AS n_violations
        |FROM orders
        |UNION ALL
        |SELECT 'accepted_values:o_orderstatus',
        |       CAST(count(CASE WHEN o_orderstatus IS NOT NULL
        |         AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
        |         AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'fk:o_custkey->c_custkey',
        |       CAST(count(*) AS BIGINT)
        |FROM orders WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'not_null:o_custkey',
        |       CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END)
        |         AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'not_null:o_orderkey',
        |       CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END)
        |         AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'unique:o_orderkey',
        |       CAST(coalesce(sum(cnt - 1), 0) AS BIGINT)
        |FROM (SELECT o_orderkey, count(*) AS cnt FROM orders
        |      GROUP BY 1) WHERE cnt > 1
        |ORDER BY 1""".stripMargin,
    // q203: cross-media duplicate frames — q133's rolling checksum on
    // EVERY 64-byte frame, grouped corpus-wide; >= 2 distinct docs.
    "q203_frame_dedup" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |f AS (SELECT doc_id,
        |             substring(text, CAST(u.f * 64 + 1 AS INTEGER), 64)
        |               AS frame
        |      FROM t, LATERAL unnest(
        |        range(0, CAST(ceil(n / 64.0) AS BIGINT), 1)) u(f)),
        |c AS (SELECT doc_id,
        |        CAST(length(frame) AS INTEGER) AS n_bytes,
        |        CAST(list_reduce(
        |          [ascii(ch) for ch in string_split(frame, '')],
        |          (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 2147483647)
        |          AS BIGINT) AS checksum
        |      FROM f)
        |SELECT checksum, n_bytes,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_frames,
        |       CAST(min(doc_id) AS BIGINT) AS min_doc,
        |       CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM c GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY 1, 2""".stripMargin,
    // q204: Pearson correlation matrix from cent-quantized 128-bit
    // integer sums (DuckDB hugeint == Spark decimal(38)); every sum is
    // exact, each converted to double BEFORE the per-pair arithmetic
    // in the same order as the Spark side; one rounded division.
    "q204_corr_matrix" ->
      """WITH qv AS (SELECT
        |    CAST(round(l_quantity * 100) AS HUGEINT) AS x0,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS x1,
        |    CAST(round(l_discount * 100) AS HUGEINT) AS x2,
        |    CAST(round(l_tax * 100) AS HUGEINT) AS x3
        |  FROM lineitem),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x0) AS DOUBLE) AS s0, CAST(sum(x0*x0) AS DOUBLE) AS ss0,
        |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x1*x1) AS DOUBLE) AS ss1,
        |    CAST(sum(x2) AS DOUBLE) AS s2, CAST(sum(x2*x2) AS DOUBLE) AS ss2,
        |    CAST(sum(x3) AS DOUBLE) AS s3, CAST(sum(x3*x3) AS DOUBLE) AS ss3,
        |    CAST(sum(x0*x1) AS DOUBLE) AS p01,
        |    CAST(sum(x0*x2) AS DOUBLE) AS p02,
        |    CAST(sum(x0*x3) AS DOUBLE) AS p03,
        |    CAST(sum(x1*x2) AS DOUBLE) AS p12,
        |    CAST(sum(x1*x3) AS DOUBLE) AS p13,
        |    CAST(sum(x2*x3) AS DOUBLE) AS p23
        |  FROM qv)
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, nn AS n,
        |  round((n*p01 - s0*s1) / sqrt((n*ss0 - s0*s0)*(n*ss1 - s1*s1)), 6)
        |    + 0.0 AS corr FROM a
        |UNION ALL SELECT 'l_quantity', 'l_discount', nn,
        |  round((n*p02 - s0*s2) / sqrt((n*ss0 - s0*s0)*(n*ss2 - s2*s2)), 6)
        |    + 0.0 FROM a
        |UNION ALL SELECT 'l_quantity', 'l_tax', nn,
        |  round((n*p03 - s0*s3) / sqrt((n*ss0 - s0*s0)*(n*ss3 - s3*s3)), 6)
        |    + 0.0 FROM a
        |UNION ALL SELECT 'l_extendedprice', 'l_discount', nn,
        |  round((n*p12 - s1*s2) / sqrt((n*ss1 - s1*s1)*(n*ss2 - s2*s2)), 6)
        |    + 0.0 FROM a
        |UNION ALL SELECT 'l_extendedprice', 'l_tax', nn,
        |  round((n*p13 - s1*s3) / sqrt((n*ss1 - s1*s1)*(n*ss3 - s3*s3)), 6)
        |    + 0.0 FROM a
        |UNION ALL SELECT 'l_discount', 'l_tax', nn,
        |  round((n*p23 - s2*s3) / sqrt((n*ss2 - s2*s2)*(n*ss3 - s3*s3)), 6)
        |    + 0.0 FROM a
        |ORDER BY 1, 2""".stripMargin,
    // q205: funnel transition timing — exact integer seconds, median =
    // k-th smallest (k = (n+1)//2) replayed by ordering.
    "q205_funnel_timing" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.u
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.u
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY 1),
        |d1 AS (SELECT CAST((epoch_us(s2.t2) - epoch_us(s1.t1)) // 1000000
        |         AS BIGINT) AS sec
        |       FROM s1 JOIN s2 ON s1.u = s2.u),
        |d2 AS (SELECT CAST((epoch_us(s3.t3) - epoch_us(s2.t2)) // 1000000
        |         AS BIGINT) AS sec
        |       FROM s2 JOIN s3 ON s2.u = s3.u),
        |r1 AS (SELECT CAST(1 AS INTEGER) AS step,
        |         'signup->view' AS transition,
        |         (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n_users,
        |         (SELECT CAST(min(sec) AS BIGINT) FROM d1) AS min_sec,
        |         (SELECT CAST(max(sec) AS BIGINT) FROM d1) AS max_sec,
        |         (SELECT CASE WHEN count(*) = 0 THEN NULL
        |            ELSE CAST(sum(sec) // count(*) AS BIGINT) END
        |          FROM d1) AS avg_sec,
        |         (SELECT sec FROM (SELECT sec, row_number()
        |              OVER (ORDER BY sec) AS rk FROM d1)
        |          WHERE rk = (SELECT (count(*) + 1) // 2 FROM d1))
        |           AS median_sec),
        |r2 AS (SELECT CAST(2 AS INTEGER) AS step,
        |         'view->purchase' AS transition,
        |         (SELECT CAST(count(*) AS BIGINT) FROM d2) AS n_users,
        |         (SELECT CAST(min(sec) AS BIGINT) FROM d2) AS min_sec,
        |         (SELECT CAST(max(sec) AS BIGINT) FROM d2) AS max_sec,
        |         (SELECT CASE WHEN count(*) = 0 THEN NULL
        |            ELSE CAST(sum(sec) // count(*) AS BIGINT) END
        |          FROM d2) AS avg_sec,
        |         (SELECT sec FROM (SELECT sec, row_number()
        |              OVER (ORDER BY sec) AS rk FROM d2)
        |          WHERE rk = (SELECT (count(*) + 1) // 2 FROM d2))
        |           AS median_sec)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |ORDER BY step""".stripMargin,
    // q206: daily forward-fill resample — day value = last observation
    // of the day by (ts, event_id); gaps inherit via last IGNORE NULLS
    // over the per-key day grid.
    "q206_resample_ffill" ->
      """WITH o AS (SELECT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |             ts AS t, event_id AS tk, value AS v
        |           FROM events WHERE value IS NOT NULL),
        |dv AS (SELECT u, d, v AS day_v FROM (
        |         SELECT u, d, v, row_number() OVER
        |           (PARTITION BY u, d ORDER BY t DESC, tk DESC) AS rk
        |         FROM o) WHERE rk = 1),
        |sp AS (SELECT u, min(d) AS d0, max(d) AS d1 FROM dv GROUP BY 1),
        |g AS (SELECT sp.u, CAST(gs.d AS BIGINT) AS d
        |      FROM sp, LATERAL unnest(range(sp.d0, sp.d1 + 1)) gs(d)),
        |j AS (SELECT g.u, g.d, dv.day_v
        |      FROM g LEFT JOIN dv ON g.u = dv.u AND g.d = dv.d)
        |SELECT u AS k, d,
        |       CAST(CASE WHEN day_v IS NOT NULL THEN 1 ELSE 0 END
        |         AS INTEGER) AS observed,
        |       last_value(day_v IGNORE NULLS) OVER
        |         (PARTITION BY u ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS filled
        |FROM j ORDER BY k, d""".stripMargin,
    // q207: daily-revenue drawdown — running peak of integer-cents
    // daily totals and the per-day shortfall; exact 64-bit windows.
    "q207_drawdown" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS revenue_cents
        |  FROM orders GROUP BY 1),
        |p AS (SELECT d, revenue_cents,
        |        CAST(max(revenue_cents) OVER
        |          (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           CURRENT ROW) AS BIGINT) AS peak_cents
        |      FROM daily)
        |SELECT d, revenue_cents, peak_cents,
        |       CAST(peak_cents - revenue_cents AS BIGINT)
        |         AS drawdown_cents
        |FROM p ORDER BY d""".stripMargin,
    // q208: equi-height histogram — boundaries = exact i/8 quantiles
    // (k = ceil(q·n)-th smallest, replayed by ordering), then the same
    // literal when-chain bucketing; exact counts and observed bounds.
    "q208_equi_hist" ->
      """WITH v AS (SELECT CAST(l_partkey AS BIGINT) AS v FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
        |b AS (SELECT
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.125 * n.n)
        |    AS BIGINT)) AS b0,
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.25 * n.n)
        |    AS BIGINT)) AS b1,
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.375 * n.n)
        |    AS BIGINT)) AS b2,
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.5 * n.n)
        |    AS BIGINT)) AS b3,
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.625 * n.n)
        |    AS BIGINT)) AS b4,
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.75 * n.n)
        |    AS BIGINT)) AS b5,
        |  (SELECT v FROM r, n WHERE rk = CAST(ceil(0.875 * n.n)
        |    AS BIGINT)) AS b6)
        |SELECT CASE WHEN v <= b0 THEN 0 WHEN v <= b1 THEN 1
        |            WHEN v <= b2 THEN 2 WHEN v <= b3 THEN 3
        |            WHEN v <= b4 THEN 4 WHEN v <= b5 THEN 5
        |            WHEN v <= b6 THEN 6 ELSE 7 END AS bin,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
        |FROM v, b GROUP BY 1 ORDER BY 1""".stripMargin,
    // q209: fuzzy edit-distance pairs — 12-char-prefix blocks, length
    // band |la−lb| <= 5 (a lossless lower bound), exact levenshtein in
    // both engines.
    "q209_fuzzy_pairs" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len,
        |             substring(text, 1, 12) AS blk
        |           FROM documents),
        |sz AS (SELECT blk FROM t GROUP BY 1 HAVING count(*) <= 1000),
        |s AS (SELECT t.* FROM t JOIN sz USING (blk))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
        |FROM s a JOIN s b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  AND abs(a.len - b.len) <= 5
        |WHERE levenshtein(a.text, b.text) <= 5
        |ORDER BY 1, 2""".stripMargin,
    // q210: two-proportion z-test — exact per-variant counts, integer
    // ppm rates; z is per-row float from exact integers (same op
    // order as the Spark side), rounded 4 dp.
    "q210_ab_test" ->
      """WITH pu AS (SELECT user_id % 2 AS v, user_id AS u,
        |              max(CASE WHEN event_type = 'purchase'
        |                THEN 1 ELSE 0 END) AS conv
        |            FROM events GROUP BY 1, 2),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(conv) AS BIGINT) AS conv FROM pu GROUP BY 1),
        |o AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN n END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN v = 0 THEN conv END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN v = 1 THEN n END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN v = 1 THEN conv END) AS BIGINT) AS conv_b
        |  FROM g),
        |zc AS (SELECT *,
        |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |         * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |         * (1.0 / n_a + 1.0 / n_b)) AS den
        |  FROM o),
        |zz AS (SELECT *,
        |    CASE WHEN den > 0 THEN
        |      round((CAST(conv_a AS DOUBLE) / n_a
        |             - CAST(conv_b AS DOUBLE) / n_b) / den, 4) + 0.0
        |    END AS z
        |  FROM zc)
        |SELECT n_a, conv_a, n_b, conv_b,
        |       CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
        |       CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
        |       z,
        |       CAST(coalesce(CASE WHEN abs(z) >= 1.96 THEN 1 ELSE 0 END,
        |         0) AS INTEGER) AS significant
        |FROM zz""".stripMargin,
    // q211: RFM quartile scores — exact k = ceil(q·n) boundaries per
    // metric replayed by ordering; when-chain scoring, 4 = best.
    "q211_rfm_segments" ->
      """WITH m0 AS (SELECT user_id AS u,
        |              CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |              CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events),
        |b0 AS (SELECT u, max(d) AS last_d,
        |         CAST(count(*) AS BIGINT) AS f,
        |         CAST(sum(cents) AS BIGINT) AS m_cents
        |       FROM m0 GROUP BY 1),
        |t AS (SELECT max(last_d) AS today FROM b0),
        |mt AS (SELECT u, CAST(t.today - last_d AS BIGINT) AS r_days,
        |         f, m_cents FROM b0, t),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mt),
        |rr AS (SELECT r_days AS v, row_number() OVER (ORDER BY r_days)
        |         AS rk FROM mt),
        |rb AS (SELECT
        |  (SELECT v FROM rr, nn WHERE rk = CAST(ceil(0.25 * n)
        |    AS BIGINT)) AS b1,
        |  (SELECT v FROM rr, nn WHERE rk = CAST(ceil(0.5 * n)
        |    AS BIGINT)) AS b2,
        |  (SELECT v FROM rr, nn WHERE rk = CAST(ceil(0.75 * n)
        |    AS BIGINT)) AS b3),
        |fr AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rk
        |       FROM mt),
        |fb AS (SELECT
        |  (SELECT v FROM fr, nn WHERE rk = CAST(ceil(0.25 * n)
        |    AS BIGINT)) AS b1,
        |  (SELECT v FROM fr, nn WHERE rk = CAST(ceil(0.5 * n)
        |    AS BIGINT)) AS b2,
        |  (SELECT v FROM fr, nn WHERE rk = CAST(ceil(0.75 * n)
        |    AS BIGINT)) AS b3),
        |mr AS (SELECT m_cents AS v, row_number() OVER (ORDER BY m_cents)
        |         AS rk FROM mt),
        |mb AS (SELECT
        |  (SELECT v FROM mr, nn WHERE rk = CAST(ceil(0.25 * n)
        |    AS BIGINT)) AS b1,
        |  (SELECT v FROM mr, nn WHERE rk = CAST(ceil(0.5 * n)
        |    AS BIGINT)) AS b2,
        |  (SELECT v FROM mr, nn WHERE rk = CAST(ceil(0.75 * n)
        |    AS BIGINT)) AS b3),
        |sc AS (SELECT u, r_days, f, m_cents,
        |         CASE WHEN r_days <= rb.b1 THEN 4
        |              WHEN r_days <= rb.b2 THEN 3
        |              WHEN r_days <= rb.b3 THEN 2 ELSE 1 END AS r_score,
        |         CASE WHEN f <= fb.b1 THEN 1 WHEN f <= fb.b2 THEN 2
        |              WHEN f <= fb.b3 THEN 3 ELSE 4 END AS f_score,
        |         CASE WHEN m_cents <= mb.b1 THEN 1
        |              WHEN m_cents <= mb.b2 THEN 2
        |              WHEN m_cents <= mb.b3 THEN 3 ELSE 4 END AS m_score
        |       FROM mt, rb, fb, mb)
        |SELECT u, r_days, f, m_cents,
        |       CAST(r_score AS INTEGER) AS r_score,
        |       CAST(f_score AS INTEGER) AS f_score,
        |       CAST(m_score AS INTEGER) AS m_score,
        |       CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER)
        |         AS segment
        |FROM sc ORDER BY u""".stripMargin,
    // q212: fuzzy-dedup coverage audit — pure exact-integer counting
    // (total docs, NULL texts, prefix blocks, over-cap blocks and the
    // rows they cover) with q209's defaults (prefix 12, cap 1000).
    "q212_fuzzy_audit" ->
      """WITH b AS (SELECT substr(text, 1, 12) AS blk,
        |             CAST(count(*) AS BIGINT) AS bn
        |           FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(count(CASE WHEN text IS NULL THEN 1 END) AS BIGINT)
        |          AS n_null_text
        |      FROM documents),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |        CAST(count(CASE WHEN bn > 1000 THEN 1 END) AS BIGINT)
        |          AS n_hot_blocks,
        |        CAST(coalesce(sum(CASE WHEN bn > 1000 THEN bn END), 0)
        |          AS BIGINT) AS n_hot_rows
        |      FROM b)
        |SELECT n_docs, n_null_text, n_blocks, n_hot_blocks, n_hot_rows
        |FROM t, s""".stripMargin,
    // q213: k-arm readout — per-arm exact counts, ppm rates, pairwise
    // z vs control arm 0 (same fixed float op order as q210, rounded
    // 4 dp); control arm z is NULL by definition.
    "q213_ab_test_k" ->
      """WITH pu AS (SELECT user_id % 4 AS v, user_id AS u,
        |              max(CASE WHEN event_type = 'purchase'
        |                THEN 1 ELSE 0 END) AS conv
        |            FROM events GROUP BY 1, 2),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(conv) AS BIGINT) AS conv FROM pu GROUP BY 1),
        |c AS (SELECT n AS n_c, conv AS conv_c FROM g WHERE v = 0),
        |zc AS (SELECT g.*, c.n_c, c.conv_c,
        |    sqrt((CAST(g.conv + c.conv_c AS DOUBLE) / (g.n + c.n_c))
        |         * (1.0 - CAST(g.conv + c.conv_c AS DOUBLE)
        |             / (g.n + c.n_c))
        |         * (1.0 / g.n + 1.0 / c.n_c)) AS den
        |  FROM g, c),
        |zz AS (SELECT *,
        |    CASE WHEN v <> 0 AND den > 0 THEN
        |      round((CAST(conv AS DOUBLE) / n
        |             - CAST(conv_c AS DOUBLE) / n_c) / den, 4) + 0.0
        |    END AS z
        |  FROM zc)
        |SELECT v, n, conv,
        |       CAST(conv * 1000000 // n AS BIGINT) AS rate_ppm,
        |       z,
        |       CAST(coalesce(CASE WHEN abs(z) >= 1.96 THEN 1 ELSE 0 END,
        |         0) AS INTEGER) AS significant
        |FROM zz ORDER BY v""".stripMargin,
    // q214: engagement concentration — Lorenz points + Gini from the
    // ACTIVITY-LEVEL histogram: closed-form rank-block sums (exact
    // hugeint/decimal S), boundary ties exact because all tied users
    // share one activity value; ceil via (a+99)//100 on non-negatives
    // (floor- and truncating-div agree there); gini is the only float,
    // computed in the identical op order and rounded 6 dp.
    "q214_engagement_gini" ->
      """WITH pu AS (SELECT user_id AS u, CAST(count(*) AS BIGINT) AS x
        |            FROM events GROUP BY 1),
        |lv0 AS (SELECT x, CAST(count(*) AS BIGINT) AS nl
        |        FROM pu GROUP BY 1),
        |lv AS (SELECT x, nl,
        |         sum(nl) OVER (ORDER BY x DESC ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS cum_users,
        |         sum(nl * x) OVER (ORDER BY x DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_events,
        |         coalesce(sum(nl) OVER (ORDER BY x ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |       FROM lv0),
        |tt AS (SELECT CAST(sum(nl) AS BIGINT) AS n,
        |         CAST(sum(nl * x) AS BIGINT) AS t,
        |         sum(CAST(x AS HUGEINT) *
        |           (below * nl + (nl * (nl + 1)) // 2)) AS s
        |       FROM lv),
        |p AS (SELECT * FROM (VALUES (1), (10), (50)) v(top_pct)),
        |j AS (SELECT p.top_pct,
        |        (p.top_pct * tt.n + 99) // 100 AS k_users,
        |        tt.n, tt.t, tt.s, lv.x, lv.nl, lv.cum_users,
        |        lv.cum_events
        |      FROM p, tt, lv
        |      WHERE lv.cum_users >= (p.top_pct * tt.n + 99) // 100
        |        AND lv.cum_users - lv.nl <
        |            (p.top_pct * tt.n + 99) // 100)
        |SELECT CAST(top_pct AS INTEGER) AS top_pct,
        |       CAST(k_users AS BIGINT) AS k_users,
        |       CAST(cum_events - (cum_users - k_users) * x AS BIGINT)
        |         AS events_covered,
        |       CAST(CAST(cum_events - (cum_users - k_users) * x
        |           AS HUGEINT) * 1000000
        |         // t AS BIGINT) AS share_ppm,
        |       round(CAST(s AS DOUBLE) * 2.0 /
        |           (CAST(n AS DOUBLE) * t) -
        |           (CAST(n AS DOUBLE) + 1.0) / n, 6) + 0.0 AS gini
        |FROM j ORDER BY top_pct""".stripMargin,
    // q215: mutual information lang × source — exact integer counts
    // from one (a,b) aggregate, per-cell/per-marginal contributions
    // rounded to integer nano-nats BEFORE the exact 64-bit sum (the
    // q197 PSI recipe), identical float op order in both engines.
    "q215_lang_source_mi" ->
      """WITH c AS (SELECT lang AS a, source AS b,
        |             CAST(count(*) AS BIGINT) AS nab
        |           FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL
        |           GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na
        |       FROM c GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb
        |       FROM c GROUP BY 1),
        |tt AS (SELECT CAST(sum(nab) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_cells FROM c),
        |mi AS (SELECT CAST(sum(CAST(round(
        |           CAST(nab AS DOUBLE) / tt.n *
        |           ln(CAST(nab AS DOUBLE) * tt.n /
        |              (CAST(na AS DOUBLE) * nb)) * 1e9, 0)
        |           AS BIGINT)) AS BIGINT) AS mi_nano
        |       FROM c JOIN ma USING (a) JOIN mb USING (b), tt),
        |ha AS (SELECT CAST(sum(CAST(round(
        |           CAST(na AS DOUBLE) / tt.n * -1.0 *
        |           ln(CAST(na AS DOUBLE) / tt.n) * 1e9, 0)
        |           AS BIGINT)) AS BIGINT) AS h_a_nano FROM ma, tt),
        |hb AS (SELECT CAST(sum(CAST(round(
        |           CAST(nb AS DOUBLE) / tt.n * -1.0 *
        |           ln(CAST(nb AS DOUBLE) / tt.n) * 1e9, 0)
        |           AS BIGINT)) AS BIGINT) AS h_b_nano FROM mb, tt)
        |SELECT n, n_cells, mi_nano, h_a_nano, h_b_nano
        |FROM tt, mi, ha, hb""".stripMargin,
    // q216: two-sided fuzzy pairs — prefix OR suffix (reverse-prefix)
    // block, candidates deduped before ONE exact levenshtein verify;
    // same length-band prune and per-side hot-block cap as q209.
    "q216_fuzzy_two_sided" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE text IS NOT NULL),
        |tp AS (SELECT doc_id, text, len, substring(text, 1, 12) AS blk
        |       FROM t),
        |tr AS (SELECT doc_id, text, len,
        |         substring(reverse(text), 1, 12) AS blk FROM t),
        |okp AS (SELECT blk FROM tp GROUP BY 1 HAVING count(*) <= 1000),
        |okr AS (SELECT blk FROM tr GROUP BY 1 HAVING count(*) <= 1000),
        |cp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.text AS ta, b.text AS tb
        |       FROM tp a JOIN tp b ON a.blk = b.blk
        |         AND a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5
        |       JOIN okp ON okp.blk = a.blk),
        |cr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.text AS ta, b.text AS tb
        |       FROM tr a JOIN tr b ON a.blk = b.blk
        |         AND a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5
        |       JOIN okr ON okr.blk = a.blk),
        |c AS (SELECT DISTINCT doc_a, doc_b, ta, tb FROM
        |        (SELECT * FROM cp UNION ALL SELECT * FROM cr))
        |SELECT doc_a, doc_b,
        |       CAST(levenshtein(ta, tb) AS INTEGER) AS dist
        |FROM c WHERE levenshtein(ta, tb) <= 5
        |ORDER BY 1, 2""".stripMargin,
    // q217: daily-revenue sample ACF, lags 1..7 — per-lag DECIMAL(38)/
    // hugeint sufficient statistics over (d, d+lag) observed-day
    // pairs, each converted to double BEFORE the per-lag arithmetic in
    // the same order as the Spark side (the q204 contract); one
    // rounded division, degenerate variance → NULL.
    "q217_revenue_acf" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |pr AS (SELECT l.lag, a.cents AS x, b.cents AS y
        |       FROM daily a, range(1, 8) l(lag), daily b
        |       WHERE b.d = a.d + l.lag),
        |ag AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(count(*) AS DOUBLE) AS n,
        |        CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |        CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |        CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |       FROM pr GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
        |       CASE WHEN n_pairs >= 2 AND
        |           sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) <> 0
        |         THEN round((n * sxy - sx * sy) /
        |           sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |           + 0.0
        |       END AS acf
        |FROM ag ORDER BY lag""".stripMargin,
    // q218: triangle census of the J >= 0.5 near-dup graph — the
    // canonical (a < b) edge set makes the a<b<c triangle join count
    // each triangle exactly once; wedges = Σ deg(deg−1)/2; all exact
    // integers.
    "q218_dup_triangles" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM inter
        |      JOIN sizes sa ON doc_a = sa.doc_id
        |      JOIN sizes sb ON doc_b = sb.doc_id
        |      WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
        |          (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |        CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
        |        CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        |      FROM deg),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT n_nodes, n_edges, n_triangles, n_wedges,
        |       CAST(CASE WHEN n_wedges > 0
        |         THEN 3 * n_triangles * 1000000 // n_wedges
        |         ELSE 0 END AS BIGINT) AS clustering_ppm
        |FROM t, tri""".stripMargin,
    // q219: seasonal-naive backtest, period 7 — exact integer error
    // sums over (d, d−7) observed pairs; every integer division sees
    // only non-negative operands (truncating vs flooring div agree),
    // so the signed bias ships as a raw sum.
    "q219_naive_backtest" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.d, a.cents, b.cents AS fc
        |      FROM daily a JOIN daily b ON a.d = b.d + 7)
        |SELECT CAST(7 AS INTEGER) AS period,
        |       CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(abs(cents - fc)) AS BIGINT)
        |         AS sum_abs_err_cents,
        |       CAST(sum(cents - fc) AS BIGINT) AS sum_err_cents,
        |       CAST(sum(abs(cents - fc)) // count(*) AS BIGINT)
        |         AS mae_cents,
        |       CAST(sum(CASE WHEN cents > 0 THEN
        |           abs(cents - fc) * 1000000 // cents END) //
        |         count(CASE WHEN cents > 0 THEN 1 END) AS BIGINT)
        |         AS mape_ppm,
        |       CAST(count(CASE WHEN cents <= 0 THEN 1 END) AS BIGINT)
        |         AS n_nonpos
        |FROM p""".stripMargin,
    // q220: per-group exact quantiles — the oracle replays each
    // (event_type, q) boundary as the ceil(q·n)-th smallest by
    // per-group ordering; k = ceil(q·n) is the same IEEE product in
    // both engines (the q211 contract).
    "q220_group_quantiles" ->
      """WITH m AS (SELECT event_type AS g,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |      FROM m GROUP BY 1),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |      FROM m),
        |q AS (SELECT * FROM (VALUES (0.5), (0.9)) x(q))
        |SELECT n.g AS "group", q.q, n.n,
        |       CAST(ceil(q.q * n.n) AS BIGINT) AS k,
        |       r.v AS value
        |FROM q, n JOIN r ON r.g = n.g
        |WHERE r.rk = CAST(ceil(q.q * n.n) AS BIGINT)
        |ORDER BY 1, 2""".stripMargin,
    // q221: first-order Markov transition counts over each user's
    // (ts, event_id)-ordered sequence; exact integers, ppm share of
    // transitions leaving from_type.
    "q221_event_flow" ->
      """WITH s AS (SELECT user_id AS u, event_type AS to_type,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id)
        |               AS from_type
        |           FROM events),
        |p AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |      FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n,
        |       CAST(CAST(p.n AS HUGEINT) * 1000000 // f.n_from
        |         AS BIGINT) AS p_ppm
        |FROM p JOIN f USING (from_type)
        |ORDER BY 1, 2""".stripMargin,
    // q222: inter-event gap percentiles — exact integer-second gaps
    // between consecutive events per user, exact k = ceil(q·n)-th
    // smallest replayed by ordering (the q211/q220 contract).
    "q222_gap_quantiles" ->
      """WITH s AS (SELECT user_id AS u, ts, event_id,
        |             lag(ts) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id)
        |               AS prev_ts
        |           FROM events),
        |g AS (SELECT CAST((epoch_us(ts) - epoch_us(prev_ts)) // 1000000
        |               AS BIGINT) AS v
        |      FROM s WHERE prev_ts IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM g),
        |q AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) x(q))
        |SELECT q.q, n.n, CAST(ceil(q.q * n.n) AS BIGINT) AS k,
        |       r.v AS value_sec
        |FROM q, n JOIN r ON r.rk = CAST(ceil(q.q * n.n) AS BIGINT)
        |ORDER BY 1""".stripMargin,
    // q223: per-user log-histogram quantile brackets — bucket =
    // length(bin(v)) (binary-string length, identical in both
    // engines; no floor(log2) IEEE risk), cumulative bucket counts
    // per user, k = ceil(q·n) (same IEEE product), bracket =
    // [1<<(b-1), (1<<b)-1]. All exact integers.
    "q223_user_value_sketch" ->
      """WITH m AS (SELECT user_id AS key,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |bkt AS (SELECT key, CAST(length(bin(v)) AS INTEGER) AS b,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM m WHERE v >= 1 GROUP BY 1, 2),
        |c AS (SELECT key, b, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY key ORDER BY b
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum,
        |        CAST(sum(cnt) OVER (PARTITION BY key) AS BIGINT) AS n
        |      FROM bkt),
        |q AS (SELECT * FROM (VALUES (0.5), (0.95)) x(q))
        |SELECT c.key, q.q, c.n,
        |       CAST(ceil(q.q * c.n) AS BIGINT) AS k,
        |       c.b AS bucket,
        |       CAST(1::BIGINT << (c.b - 1) AS BIGINT) AS est_lo,
        |       CAST((1::BIGINT << c.b) - 1 AS BIGINT) AS est_hi
        |FROM q, c
        |WHERE c.cum >= CAST(ceil(q.q * c.n) AS BIGINT)
        |  AND c.cum - c.cnt < CAST(ceil(q.q * c.n) AS BIGINT)
        |ORDER BY 1, 2""".stripMargin,
    // q224: DAU/MAU stickiness — exact daily actives over exact
    // trailing-28-day actives per observed day, integer ppm.
    "q224_stickiness" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |days AS (SELECT DISTINCT d AS end_day FROM a),
        |dau AS (SELECT d AS end_day, CAST(count(*) AS BIGINT) AS dau
        |        FROM a GROUP BY 1),
        |mau AS (SELECT days.end_day,
        |          CAST(count(DISTINCT a.u) AS BIGINT) AS mau
        |        FROM a JOIN days ON a.d >= days.end_day - 27
        |                        AND a.d <= days.end_day
        |        GROUP BY 1)
        |SELECT dau.end_day, dau.dau, mau.mau,
        |       CAST(CAST(dau.dau AS HUGEINT) * 1000000 // mau.mau
        |         AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN mau USING (end_day)
        |ORDER BY 1""".stripMargin,
    // q225: cohort LTV curve — first-active-day cohorts, per-offset
    // integer-cents revenue + cumulative + per-user (integer div,
    // non-negative operands); exact 64-bit rows.
    "q225_cohort_ltv" ->
      """WITH b AS (SELECT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |f AS (SELECT u, min(d) AS cohort_day FROM b GROUP BY 1),
        |sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
        |       FROM f GROUP BY 1),
        |p AS (SELECT f.cohort_day, b.d - f.cohort_day AS day_offset,
        |        CAST(sum(b.cents) AS BIGINT) AS cents
        |      FROM b JOIN f USING (u) GROUP BY 1, 2),
        |c AS (SELECT cohort_day, day_offset, cents,
        |        CAST(sum(cents) OVER (PARTITION BY cohort_day
        |          ORDER BY day_offset ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS BIGINT) AS cum_cents
        |      FROM p)
        |SELECT c.cohort_day, c.day_offset, sz.n_users, c.cents,
        |       c.cum_cents,
        |       CAST(c.cum_cents // sz.n_users AS BIGINT)
        |         AS ltv_cents_per_user
        |FROM c JOIN sz USING (cohort_day)
        |ORDER BY 1, 2""".stripMargin,
    // q226: greedy MMR unrolled to 5 pick stages — all-integer marginals
    // (1e-4-unit rel/sim, λ = 7/10 → 7·rel − 3·maxsim) so the argmax
    // trace is engine-independent; ties break on vec_id in every stage.
    "q226_mmr_rerank" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id = 0),
        |mpool AS (SELECT e.vec_id,
        |        CAST(round($cosSql * 10000, 0) AS BIGINT) AS rel,
        |        CAST(e.embedding AS DOUBLE[]) AS v
        |      FROM embeddings e, q WHERE e.vec_id <> 0
        |      ORDER BY rel DESC, e.vec_id LIMIT 20),
        |msims AS (SELECT a.vec_id AS sa, b.vec_id AS sb,
        |        CAST(round(list_dot_product(a.v, b.v) /
        |          (sqrt(list_dot_product(a.v, a.v)) *
        |           sqrt(list_dot_product(b.v, b.v))) * 10000, 0)
        |          AS BIGINT) AS sim
        |      FROM mpool a JOIN mpool b ON a.vec_id <> b.vec_id),
        |s1 AS (SELECT vec_id, rel, 7 * rel AS mmr FROM mpool
        |       ORDER BY rel DESC, vec_id LIMIT 1),
        |sel1 AS (SELECT vec_id FROM s1),
        |${mmrStage("c2", "s2", "sel1")},
        |sel2 AS (SELECT vec_id FROM sel1
        |         UNION ALL SELECT vec_id FROM s2),
        |${mmrStage("c3", "s3", "sel2")},
        |sel3 AS (SELECT vec_id FROM sel2
        |         UNION ALL SELECT vec_id FROM s3),
        |${mmrStage("c4", "s4", "sel3")},
        |sel4 AS (SELECT vec_id FROM sel3
        |         UNION ALL SELECT vec_id FROM s4),
        |${mmrStage("c5", "s5", "sel4")}
        |SELECT CAST(1 AS INTEGER) AS pick, vec_id, rel AS rel_e4, mmr
        |FROM s1
        |UNION ALL SELECT 2, vec_id, rel, mmr FROM s2
        |UNION ALL SELECT 3, vec_id, rel, mmr FROM s3
        |UNION ALL SELECT 4, vec_id, rel, mmr FROM s4
        |UNION ALL SELECT 5, vec_id, rel, mmr FROM s5
        |ORDER BY pick""".stripMargin,
    // q227: Kaplan–Meier — the survival product is the INTEGER ppm
    // recurrence S_t = S_{t−1}·(n−d) // n replayed by a recursive CTE
    // (HUGEINT intermediate), matching the Spark side's BigInt fold;
    // censored-at-t users stay in the t risk set (deaths-first ties).
    "q227_churn_survival" -> survivalCurveSql,
    // q228: Theil-Sen — slopes in integer micro-cents/day (HUGEINT
    // numerator, // truncates toward zero exactly like Spark's div on
    // DECIMAL(38,0)); median = exact lower ((n+1) // 2)-th smallest.
    "q228_theil_sen" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |p AS (SELECT CAST(CAST(b.c - a.c AS HUGEINT) * 1000000
        |        // (b.d - a.d) AS BIGINT) AS s
        |      FROM daily a JOIN daily b ON a.d < b.d),
        |r AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM p),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         min(s) AS mn, max(s) AS mx FROM p),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
        |SELECT nd.n_days, st.n_pairs, r.s AS median_slope_micro,
        |       st.mn AS min_slope_micro, st.mx AS max_slope_micro
        |FROM r, st, nd WHERE r.rn = (st.n_pairs + 1) // 2""".stripMargin,
    // q229: Benford — digit from the integer-cents string (no float
    // log10); expected ppm are the canonical log10(1+1/d) constants,
    // identical literals in both engines; chi2 contribution in exact
    // ppb integers.
    "q229_benford" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |             AS cents FROM orders),
        |dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
        |         AS INTEGER) AS digit FROM c WHERE cents > 0),
        |n AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM dg
        |      GROUP BY 1),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
        |        (3, 124939), (4, 96910), (5, 79181), (6, 66947),
        |        (7, 57992), (8, 51153), (9, 45757))
        |        AS t(digit, exp_ppm)),
        |t AS (SELECT sum(cnt) AS total FROM n),
        |j AS (SELECT e.digit, COALESCE(n.cnt, 0) AS n,
        |        CAST(e.exp_ppm AS BIGINT) AS exp_ppm
        |      FROM e LEFT JOIN n USING (digit)),
        |o AS (SELECT digit, n,
        |        CAST(CAST(n AS HUGEINT) * 1000000 // t.total AS BIGINT)
        |          AS obs_ppm, exp_ppm
        |      FROM j, t)
        |SELECT digit, n, obs_ppm, exp_ppm,
        |       CAST((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) * 1000
        |         // exp_ppm AS BIGINT) AS chi2_ppb
        |FROM o ORDER BY digit""".stripMargin,
    // q230: session path bigrams — q33's gap rule (> 1800 s starts a
    // session), (ts, event_id) order inside it; the top-15 cut is a
    // total order on (n DESC, from, to).
    "q230_session_paths" ->
      """WITH g AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(is_new) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS sid FROM g),
        |p AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id, sid
        |          ORDER BY ts, event_id) AS to_type
        |      FROM s)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n DESC, from_type, to_type
        |LIMIT 15""".stripMargin,
    // q231: linear-interp resample — q206's grid/day-value recipe, gap
    // days on the exact integer-cents line (HUGEINT numerator, //
    // truncating toward zero exactly like Spark's DECIMAL div).
    "q231_resample_interp" ->
      """WITH o AS (SELECT user_id AS u,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |             ts AS t, event_id AS tk,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events WHERE value IS NOT NULL),
        |dv AS (SELECT u, d, v AS day_v FROM (
        |         SELECT u, d, v, row_number() OVER
        |           (PARTITION BY u, d ORDER BY t DESC, tk DESC) AS rk
        |         FROM o) WHERE rk = 1),
        |sp AS (SELECT u, min(d) AS d0, max(d) AS d1 FROM dv GROUP BY 1),
        |g AS (SELECT sp.u, CAST(gs.d AS BIGINT) AS d
        |      FROM sp, LATERAL unnest(range(sp.d0, sp.d1 + 1)) gs(d)),
        |j AS (SELECT g.u, g.d, dv.day_v
        |      FROM g LEFT JOIN dv ON dv.u = g.u AND dv.d = g.d),
        |w AS (SELECT u, d, day_v,
        |        last_value(day_v IGNORE NULLS) OVER wb AS pv,
        |        last_value(CASE WHEN day_v IS NOT NULL THEN d END
        |          IGNORE NULLS) OVER wb AS pd,
        |        first_value(day_v IGNORE NULLS) OVER wf AS nv,
        |        first_value(CASE WHEN day_v IS NOT NULL THEN d END
        |          IGNORE NULLS) OVER wf AS nd
        |      FROM j
        |      WINDOW wb AS (PARTITION BY u ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |        wf AS (PARTITION BY u ORDER BY d
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT u AS k, d,
        |       CAST(CASE WHEN day_v IS NOT NULL THEN 1 ELSE 0 END
        |         AS INTEGER) AS observed,
        |       CAST(CASE WHEN day_v IS NOT NULL THEN day_v
        |            ELSE pv + CAST(CAST(nv - pv AS HUGEINT) * (d - pd)
        |              // (nd - pd) AS BIGINT) END AS BIGINT) AS value
        |FROM w ORDER BY k, d""".stripMargin,
    // q232: Fano factor — zero-count days enter only through the span
    // constant n (they add 0 to both sums); numerator n·S2 − S1² ≥ 0
    // by Cauchy-Schwarz, so HUGEINT // truncation is engine-exact.
    "q232_fano_burstiness" ->
      """WITH b AS (SELECT event_type AS et,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |           FROM events),
        |sp AS (SELECT max(d) - min(d) + 1 AS n_days FROM b),
        |c AS (SELECT et, d, CAST(count(*) AS BIGINT) AS c FROM b
        |      GROUP BY 1, 2),
        |s AS (SELECT et, CAST(sum(c) AS BIGINT) AS s1,
        |        sum(CAST(c AS HUGEINT) * c) AS s2 FROM c GROUP BY 1),
        |f AS (SELECT s.et AS event_type,
        |        CAST(sp.n_days AS BIGINT) AS n_days, s.s1 AS n_events,
        |        CAST((CAST(sp.n_days AS HUGEINT) * s.s2
        |            - CAST(s.s1 AS HUGEINT) * s.s1) * 1000000
        |          // (CAST(sp.n_days AS HUGEINT) * s.s1) AS BIGINT)
        |          AS fano_micro
        |      FROM s, sp)
        |SELECT event_type, n_days, n_events, fano_micro,
        |       CAST(CASE WHEN fano_micro > 1000000 THEN 1 ELSE 0 END
        |         AS INTEGER) AS bursty
        |FROM f ORDER BY event_type""".stripMargin,
    // q233: co-occurrence PMI — q215's nano recipe (one ln per pair,
    // same operand order, rounded to integer nano); lift is the exact
    // HUGEINT ppm.
    "q233_type_affinity" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t
        |            FROM events WHERE event_type IS NOT NULL),
        |tt AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users
        |       FROM ut),
        |pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM ut
        |       GROUP BY 1),
        |p AS (SELECT a.t AS ta, b.t AS tb,
        |        CAST(count(*) AS BIGINT) AS n_both
        |      FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
        |      GROUP BY 1, 2)
        |SELECT p.ta AS type_a, p.tb AS type_b, tt.n_users,
        |       pa.n_t AS n_a, pb.n_t AS n_b, p.n_both,
        |       CAST(CAST(p.n_both AS HUGEINT) * tt.n_users * 1000000
        |         // (CAST(pa.n_t AS HUGEINT) * pb.n_t) AS BIGINT)
        |         AS lift_ppm,
        |       CAST(round(ln(CAST(p.n_both AS DOUBLE) * tt.n_users /
        |         (CAST(pa.n_t AS DOUBLE) * pb.n_t)) * 1e9, 0)
        |         AS BIGINT) AS pmi_nano
        |FROM p JOIN pt pa ON pa.t = p.ta JOIN pt pb ON pb.t = p.tb, tt
        |ORDER BY type_a, type_b""".stripMargin,
    // q234: degree assortativity over q218's J >= 0.5 edge set —
    // Pearson over directed stubs, q217's DECIMAL-sums-then-one-double
    // recipe with identical operand order.
    "q234_dup_assortativity" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM inter
        |      JOIN sizes sa ON doc_a = sa.doc_id
        |      JOIN sizes sb ON doc_b = sb.doc_id
        |      WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5),
        |st AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT a AS n, CAST(count(*) AS BIGINT) AS deg
        |        FROM st GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
        |xy AS (SELECT da.deg AS x, db.deg AS y
        |       FROM st JOIN deg da ON da.n = st.a
        |                 JOIN deg db ON db.n = st.b),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_stubs,
        |        CAST(count(*) AS DOUBLE) AS n,
        |        CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |        CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |        CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |       FROM xy)
        |SELECT nn.n_nodes, ag.n_stubs,
        |       CASE WHEN n_stubs >= 2 AND
        |           sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) <> 0
        |         THEN round((n * sxy - sx * sy) /
        |           sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |           + 0.0
        |       END AS assortativity
        |FROM ag, nn""".stripMargin,
    // q235: quarter-octave per-key brackets — q223's recipe with 4
    // integer slices per octave; slice bounds are exact ceiling
    // divisions, identical in both engines.
    "q235_value_sketch_fine" ->
      """WITH m AS (SELECT user_id AS key,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |base AS (SELECT key, v,
        |           CAST(length(bin(v)) AS INTEGER) AS b,
        |           CAST(1::BIGINT << (CAST(length(bin(v)) AS INTEGER)
        |             - 1) AS BIGINT) AS lo
        |         FROM m WHERE v >= 1),
        |b2 AS (SELECT key, b, lo,
        |         CAST((v - lo) * 4 // lo AS INTEGER) AS sub
        |       FROM base),
        |bkt AS (SELECT key, b, sub, lo, CAST(count(*) AS BIGINT) AS cnt
        |        FROM b2 GROUP BY 1, 2, 3, 4),
        |c AS (SELECT key, b, sub, lo, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY key ORDER BY b, sub
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum,
        |        CAST(sum(cnt) OVER (PARTITION BY key) AS BIGINT) AS n
        |      FROM bkt),
        |q AS (SELECT * FROM (VALUES (0.5), (0.95)) x(q))
        |SELECT c.key, q.q, c.n,
        |       CAST(ceil(q.q * c.n) AS BIGINT) AS k,
        |       c.b AS bucket, c.sub,
        |       CAST(c.lo + (c.sub * c.lo + 3) // 4 AS BIGINT) AS est_lo,
        |       CAST(c.lo + ((c.sub + 1) * c.lo + 3) // 4 - 1 AS BIGINT)
        |         AS est_hi
        |FROM q, c
        |WHERE c.cum >= CAST(ceil(q.q * c.n) AS BIGINT)
        |  AND c.cum - c.cnt < CAST(ceil(q.q * c.n) AS BIGINT)
        |ORDER BY 1, 2""".stripMargin,
    // q236: two-sided audit — q212's row per blocking side; the
    // suffix side audits blocks of reverse(text), exactly q216's
    // second candidate generator.
    "q236_fuzzy_audit_2s" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(count(CASE WHEN text IS NULL THEN 1 END)
        |          AS BIGINT) AS n_null_text
        |      FROM documents),
        |bp AS (SELECT substring(text, 1, 12) AS blk, count(*) AS bn
        |       FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |bs AS (SELECT substring(reverse(text), 1, 12) AS blk,
        |         count(*) AS bn
        |       FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |sp AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |        CAST(count(CASE WHEN bn > 1000 THEN 1 END) AS BIGINT)
        |          AS n_hot_blocks,
        |        CAST(coalesce(sum(CASE WHEN bn > 1000 THEN bn END), 0)
        |          AS BIGINT) AS n_hot_rows
        |       FROM bp),
        |ss AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |        CAST(count(CASE WHEN bn > 1000 THEN 1 END) AS BIGINT)
        |          AS n_hot_blocks,
        |        CAST(coalesce(sum(CASE WHEN bn > 1000 THEN bn END), 0)
        |          AS BIGINT) AS n_hot_rows
        |       FROM bs)
        |SELECT 'prefix' AS side, t.n_docs, t.n_null_text, sp.n_blocks,
        |       sp.n_hot_blocks, sp.n_hot_rows
        |FROM t, sp
        |UNION ALL
        |SELECT 'suffix', t.n_docs, t.n_null_text, ss.n_blocks,
        |       ss.n_hot_blocks, ss.n_hot_rows
        |FROM t, ss
        |ORDER BY side""".stripMargin,
    // q237: sorted-neighborhood — rank within 2-char sort-key
    // partitions, candidates = rank distance <= 5, one levenshtein
    // verify; each unordered pair appears at one rank distance only.
    "q237_sorted_neighborhood" ->
      """WITH t AS (SELECT doc_id, text, substring(text, 1, 2) AS blk
        |           FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, text, blk, row_number() OVER
        |        (PARTITION BY blk ORDER BY text, doc_id) AS rn
        |      FROM t),
        |c AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
        |        levenshtein(a.text, b.text) AS dist
        |      FROM r a JOIN r b ON a.blk = b.blk AND b.rn > a.rn
        |                        AND b.rn <= a.rn + 5
        |                        AND abs(length(a.text)
        |                          - length(b.text)) <= 5)
        |SELECT least(ia, ib) AS doc_a, greatest(ia, ib) AS doc_b,
        |       CAST(dist AS INTEGER) AS dist
        |FROM c WHERE dist <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q238: trimmed mean — rank cut k = n·10 // 100 per side; cut
    // ties are value-identical so the kept sum is order-invariant;
    // HUGEINT micro-mean truncates like Spark's DECIMAL div.
    "q238_trimmed_mean" ->
      """WITH b AS (SELECT event_type AS g,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events
        |           WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY g) AS n
        |      FROM b),
        |k AS (SELECT g, n, v FROM r
        |      WHERE rn > n * 10 // 100 AND rn <= n - (n * 10 // 100)),
        |a AS (SELECT g, CAST(max(n) AS BIGINT) AS n_total,
        |        CAST(count(*) AS BIGINT) AS n_kept,
        |        CAST(sum(v) AS BIGINT) AS sum_kept
        |      FROM k GROUP BY 1)
        |SELECT g AS "group", n_total, n_kept, sum_kept,
        |       CAST(CAST(sum_kept AS HUGEINT) * 1000000 // n_kept
        |         AS BIGINT) AS mean_micro
        |FROM a ORDER BY 1""".stripMargin,
    // q239: Herfindahl concentration — (Σ n_c²)·1e6 // n², exact
    // HUGEINT; 1e6 = one source, 1e6/k = even split over k.
    "q239_source_hhi" ->
      """WITH c AS (SELECT lang AS g, source AS c,
        |             CAST(count(*) AS BIGINT) AS nc
        |           FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL
        |           GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(nc) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS n_cats,
        |        sum(CAST(nc AS HUGEINT) * nc) AS s2
        |      FROM c GROUP BY 1)
        |SELECT g AS "group", n, n_cats,
        |       CAST(s2 * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |         AS hhi_ppm
        |FROM a ORDER BY 1""".stripMargin,
    // q240: percent-rank ppm — ties-share rank() needs no tie-break
    // for determinism; (rank−1)·1e6 // (n−1), single-member groups 0.
    "q240_percent_rank" ->
      """WITH b AS (SELECT doc_id AS id, lang AS g,
        |             CAST(n_chars AS BIGINT) AS v
        |           FROM documents
        |           WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
        |r AS (SELECT id, g, v,
        |        rank() OVER (PARTITION BY g ORDER BY v) AS rnk,
        |        count(*) OVER (PARTITION BY g) AS n
        |      FROM b)
        |SELECT id, g AS "group", v AS value,
        |       CAST(CASE WHEN n > 1
        |         THEN CAST(rnk - 1 AS HUGEINT) * 1000000 // (n - 1)
        |         ELSE 0 END AS BIGINT) AS pr_ppm
        |FROM r ORDER BY 2, 1""".stripMargin,
    // q241: Welch's t — HUGEINT sufficient stats, t/df the only float
    // steps, operand order mirrored verbatim from the Spark side.
    "q241_welch_t" ->
      """WITH pu AS (SELECT user_id % 2 AS v, user_id AS u,
        |    CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |      AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(m AS HUGEINT)) AS s1,
        |        sum(CAST(m AS HUGEINT) * m) AS s2
        |      FROM pu GROUP BY 1),
        |one AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN n END) AS BIGINT) AS n_a,
        |    sum(CASE WHEN v = 0 THEN s1 END) AS s1_a,
        |    sum(CASE WHEN v = 0 THEN s2 END) AS s2_a,
        |    CAST(sum(CASE WHEN v = 1 THEN n END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN v = 1 THEN s1 END) AS s1_b,
        |    sum(CASE WHEN v = 1 THEN s2 END) AS s2_b
        |  FROM g),
        |w2 AS (SELECT *,
        |    (CAST(n_a AS DOUBLE) * CAST(s2_a AS DOUBLE)
        |      - CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
        |      / CAST(n_a AS DOUBLE) AS sea,
        |    (CAST(n_b AS DOUBLE) * CAST(s2_b AS DOUBLE)
        |      - CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE))
        |      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
        |      / CAST(n_b AS DOUBLE) AS seb
        |  FROM one),
        |w3 AS (SELECT *, sea + seb AS se2 FROM w2)
        |SELECT n_a, n_b,
        |       CAST(s1_a * 1000000 // n_a AS BIGINT) AS mean_a_micro,
        |       CAST(s1_b * 1000000 // n_b AS BIGINT) AS mean_b_micro,
        |       CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0
        |         THEN round((CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |           - CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |           / sqrt(se2), 4) + 0.0 END AS t,
        |       CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0
        |         THEN round(se2 * se2 / (sea * sea
        |           / (CAST(n_a AS DOUBLE) - 1.0) + seb * seb
        |           / (CAST(n_b AS DOUBLE) - 1.0)), 2) + 0.0 END AS df
        |FROM w3""".stripMargin,
    // q242: Mann-Whitney in DOUBLED rank units — all-integer (2·mid =
    // 2p + c + 1); the midrank cumsum runs over distinct values.
    "q242_mann_whitney" ->
      """WITH pu AS (SELECT user_id % 2 AS v, user_id AS u,
        |    CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |      AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |vals AS (SELECT m,
        |    CAST(count(CASE WHEN v = 0 THEN 1 END) AS BIGINT) AS ca,
        |    CAST(count(CASE WHEN v = 1 THEN 1 END) AS BIGINT) AS cb
        |  FROM pu GROUP BY 1),
        |r AS (SELECT ca, cb, sum(ca + cb) OVER (ORDER BY m
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS cum
        |      FROM vals),
        |r2 AS (SELECT ca, cb,
        |        2 * (cum - (ca + cb)) + ca + cb + 1 AS two_mid
        |      FROM r),
        |a AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |        CAST(sum(cb) AS BIGINT) AS n_b,
        |        sum(CAST(ca AS HUGEINT) * two_mid) AS ra2,
        |        sum(CAST(cb AS HUGEINT) * two_mid) AS rb2
        |      FROM r2),
        |b AS (SELECT n_a, n_b,
        |        CAST(ra2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT)
        |          AS u2_a,
        |        CAST(rb2 - CAST(n_b AS HUGEINT) * (n_b + 1) AS BIGINT)
        |          AS u2_b
        |      FROM a)
        |SELECT n_a, n_b, u2_a, u2_b,
        |       CAST((CAST(u2_a AS HUGEINT) - u2_b) * 1000000
        |         // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
        |         AS rank_biserial_ppm
        |FROM b""".stripMargin,
    // q243: chi-square independence — q215's nano recipe; exp and the
    // contribution use the exact Spark operand order.
    "q243_chi_square" ->
      """WITH c AS (SELECT lang AS a, source AS b,
        |             CAST(count(*) AS BIGINT) AS nab
        |           FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL
        |           GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na
        |       FROM c GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb
        |       FROM c GROUP BY 1),
        |tt AS (SELECT CAST(sum(nab) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_cells FROM c),
        |la AS (SELECT CAST(count(*) AS BIGINT) AS n_a_levels FROM ma),
        |lb AS (SELECT CAST(count(*) AS BIGINT) AS n_b_levels FROM mb),
        |grid AS (SELECT ma.a, mb.b, ma.na, mb.nb,
        |           coalesce(c.nab, 0) AS nab
        |         FROM ma CROSS JOIN mb LEFT JOIN c USING (a, b)),
        |x AS (SELECT CAST(sum(CAST(round(
        |         (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * nb / n)
        |         * (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * nb / n)
        |         / (CAST(na AS DOUBLE) * nb / n) * 1e9, 0) AS BIGINT))
        |         AS BIGINT) AS chi2_nano
        |      FROM grid, tt)
        |SELECT tt.n, la.n_a_levels, lb.n_b_levels,
        |       CAST((la.n_a_levels - 1) * (lb.n_b_levels - 1)
        |         AS BIGINT) AS dof,
        |       x.chi2_nano
        |FROM tt, la, lb, x""".stripMargin,
    // q244: market-basket pairs — exact ppm confidence/lift (HUGEINT),
    // total-ordered top-15 cut.
    "q244_basket_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |            FROM lineitem
        |            WHERE l_orderkey IS NOT NULL
        |              AND l_partkey IS NOT NULL),
        |nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets
        |       FROM bi),
        |pi AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM bi
        |       GROUP BY 1),
        |p AS (SELECT a.i AS ia, b.i AS ib,
        |        CAST(count(*) AS BIGINT) AS n_ab
        |      FROM bi a JOIN bi b ON a.o = b.o AND a.i < b.i
        |      GROUP BY 1, 2)
        |SELECT p.ia AS item_a, p.ib AS item_b, p.n_ab,
        |       pa.ni AS n_a, pb.ni AS n_b,
        |       CAST(CAST(p.n_ab AS HUGEINT) * 1000000 // pa.ni
        |         AS BIGINT) AS conf_ab_ppm,
        |       CAST(CAST(p.n_ab AS HUGEINT) * 1000000 // pb.ni
        |         AS BIGINT) AS conf_ba_ppm,
        |       CAST(CAST(p.n_ab AS HUGEINT) * nb.n_baskets * 1000000
        |         // (CAST(pa.ni AS HUGEINT) * pb.ni) AS BIGINT)
        |         AS lift_ppm
        |FROM p JOIN pi pa ON pa.i = p.ia JOIN pi pb ON pb.i = p.ib, nb
        |ORDER BY n_ab DESC, item_a, item_b
        |LIMIT 15""".stripMargin,
    // q245: weekday profile — dow = (epochDay + 3) mod 7 (0 = Monday,
    // pure integer); index = (total_dow·nd_all)·1e6 // (n_dow·tot_all)
    // in one exact HUGEINT division.
    "q245_weekday_profile" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |bd AS (SELECT (d + 3) % 7 AS dow,
        |         CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(c) AS BIGINT) AS total_cents
        |       FROM daily GROUP BY 1),
        |t AS (SELECT CAST(sum(n_days) AS BIGINT) AS nd_all,
        |        CAST(sum(total_cents) AS BIGINT) AS tot_all FROM bd)
        |SELECT bd.dow, bd.n_days, bd.total_cents,
        |       CAST(bd.total_cents // bd.n_days AS BIGINT)
        |         AS mean_cents,
        |       CAST(CAST(bd.total_cents AS HUGEINT) * t.nd_all
        |         * 1000000 // (CAST(bd.n_days AS HUGEINT) * t.tot_all)
        |         AS BIGINT) AS index_ppm
        |FROM bd, t ORDER BY dow""".stripMargin,
    // q246: MAD fence — median and MAD are exact lower medians
    // (k = (n+1) // 2), matching the refinement's ceil(q·n); only
    // flagged days return.
    "q246_mad_outliers" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |ms AS (SELECT c AS v, row_number() OVER (ORDER BY c) AS rn
        |       FROM daily),
        |med AS (SELECT v AS med FROM ms, n WHERE rn = (n + 1) // 2),
        |dv AS (SELECT abs(c - med.med) AS dev FROM daily, med),
        |ds AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn
        |       FROM dv),
        |mad AS (SELECT dev AS mad FROM ds, n WHERE rn = (n + 1) // 2)
        |SELECT dy.d, dy.c AS cents, med.med AS median_cents,
        |       mad.mad AS mad_cents,
        |       CASE WHEN dy.c > med.med + 2 * mad.mad THEN 'high'
        |            ELSE 'low' END AS side
        |FROM daily dy, med, mad
        |WHERE dy.c > med.med + 2 * mad.mad
        |   OR dy.c < med.med - 2 * mad.mad
        |ORDER BY dy.d""".stripMargin,
    // q247: per-arm funnel — q183's reach chain split by arm, q210's
    // pooled-proportion z per (variant arm, step >= 2) vs arm 0.
    "q247_funnel_by_arm" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.u
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.u
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY 1),
        |f AS (SELECT s1.u, s1.t1, s2.t2, s3.t3 FROM s1
        |      LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u),
        |pa AS (SELECT u % 2 AS arm, CAST(count(*) AS BIGINT) AS n1,
        |         CAST(count(t2) AS BIGINT) AS n2,
        |         CAST(count(t3) AS BIGINT) AS n3
        |       FROM f GROUP BY 1),
        |lg AS (SELECT arm, n1, 1 AS step, n1 AS nr FROM pa
        |       UNION ALL SELECT arm, n1, 2, n2 FROM pa
        |       UNION ALL SELECT arm, n1, 3, n3 FROM pa),
        |ct AS (SELECT step, n1 AS cn1, nr AS cnr FROM lg WHERE arm = 0),
        |j AS (SELECT lg.arm, lg.step, lg.n1, lg.nr, ct.cn1, ct.cnr
        |      FROM lg LEFT JOIN ct USING (step)),
        |zc AS (SELECT *,
        |    sqrt((CAST(nr + cnr AS DOUBLE) / (n1 + cn1))
        |         * (1.0 - CAST(nr + cnr AS DOUBLE) / (n1 + cn1))
        |         * (1.0 / n1 + 1.0 / cn1)) AS den
        |  FROM j),
        |zz AS (SELECT *,
        |    CASE WHEN arm <> 0 AND step >= 2 AND den > 0 THEN
        |      round((CAST(nr AS DOUBLE) / n1
        |             - CAST(cnr AS DOUBLE) / cn1) / den, 4) + 0.0
        |    END AS z
        |  FROM zc)
        |SELECT arm, CAST(step AS INTEGER) AS step, nr AS n_reached,
        |       CAST(CAST(nr AS HUGEINT) * 1000000 // n1 AS BIGINT)
        |         AS rate_ppm,
        |       z,
        |       CAST(coalesce(CASE WHEN abs(z) >= 1.96 THEN 1 ELSE 0
        |         END, 0) AS INTEGER) AS significant
        |FROM zz ORDER BY arm, step""".stripMargin,
    // q248: batch MMR — q226's 3-stage greedy unrolled per query id;
    // one block of pool/sims/stages per qid, results unioned.
    "q248_mmr_batch" ->
      s"""WITH ${mmrBatchBlock("a", 0L)},
        |${mmrBatchBlock("b", 1L)}
        |SELECT CAST(0 AS BIGINT) AS qid, CAST(1 AS INTEGER) AS pick,
        |       vec_id, rel AS rel_e4, mmr FROM sa1
        |UNION ALL SELECT 0, 2, vec_id, rel, mmr FROM sa2
        |UNION ALL SELECT 0, 3, vec_id, rel, mmr FROM sa3
        |UNION ALL SELECT 1, 1, vec_id, rel, mmr FROM sb1
        |UNION ALL SELECT 1, 2, vec_id, rel, mmr FROM sb2
        |UNION ALL SELECT 1, 3, vec_id, rel, mmr FROM sb3
        |ORDER BY qid, pick""".stripMargin,
    // q249: exact per-group mode — (cnt DESC, v) total-order tiebreak;
    // exact HUGEINT ppm share.
    "q249_group_mode" ->
      """WITH c AS (SELECT event_type AS g,
        |             CAST(round(value * 100) AS BIGINT) AS v,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM events
        |           WHERE event_type IS NOT NULL AND value IS NOT NULL
        |           GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY g ORDER BY cnt DESC, v) AS rn FROM c),
        |t AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_total,
        |        CAST(count(*) AS BIGINT) AS n_distinct FROM c
        |      GROUP BY 1)
        |SELECT r.g AS "group", r.v AS mode_value, r.cnt AS n_mode,
        |       t.n_total, t.n_distinct,
        |       CAST(CAST(r.cnt AS HUGEINT) * 1000000 // t.n_total
        |         AS BIGINT) AS share_ppm
        |FROM r JOIN t USING (g) WHERE r.rn = 1 ORDER BY 1""".stripMargin,
    // q250: 2-core — q234's J >= 0.5 edge set, 8 unrolled peel rounds
    // (the Spark side fail-fasts if its fixpoint needs more).
    "q250_dup_kcore" ->
      s"""WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM inter
        |      JOIN sizes sa ON doc_a = sa.doc_id
        |      JOIN sizes sb ON doc_b = sb.doc_id
        |      WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5),
        |${(1 to 8).map(i => kCorePeel(i, 2)).mkString(",\n")}
        |SELECT node AS n, CAST(count(*) AS BIGINT) AS core_deg
        |FROM (SELECT a AS node FROM e8 UNION ALL SELECT b FROM e8)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q251: KS two-sample — cross-scaled integer CDF gaps
    // |cumA·n_b − cumB·n_a| (HUGEINT), D in exact ppm of n_a·n_b,
    // location = smallest metric value attaining the max.
    "q251_ks_test" ->
      """WITH pu AS (SELECT user_id % 2 AS v, user_id AS u,
        |    CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |      AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |vals AS (SELECT m,
        |    CAST(count(CASE WHEN v = 0 THEN 1 END) AS BIGINT) AS ca,
        |    CAST(count(CASE WHEN v = 1 THEN 1 END) AS BIGINT) AS cb
        |  FROM pu GROUP BY 1),
        |c AS (SELECT m,
        |        sum(ca) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cuma,
        |        sum(cb) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cumb
        |      FROM vals),
        |t AS (SELECT CAST(max(cuma) AS BIGINT) AS n_a,
        |        CAST(max(cumb) AS BIGINT) AS n_b FROM c),
        |d AS (SELECT m, n_a, n_b,
        |        abs(CAST(cuma AS HUGEINT) * n_b
        |          - CAST(cumb AS HUGEINT) * n_a) AS dd
        |      FROM c, t),
        |mx AS (SELECT max(dd) AS mx FROM d)
        |SELECT n_a, n_b,
        |       CAST(mx * 1000000 // (CAST(n_a AS HUGEINT) * n_b)
        |         AS BIGINT) AS d_ppm,
        |       CAST(min(m) AS BIGINT) AS at_value
        |FROM d, mx WHERE dd = mx
        |GROUP BY n_a, n_b, mx""".stripMargin,
    // q252: Kendall tau-b over the calendar-bounded daily frame —
    // exact pair counts; tau_b the one fixed-order double (same
    // CASE/sqrt operand order as the Spark expr).
    "q252_kendall_tau" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |p AS (SELECT
        |    CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0
        |      END AS sx,
        |    CASE WHEN b.m > a.m THEN 1 WHEN b.m < a.m THEN -1 ELSE 0
        |      END AS sy
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(count(CASE WHEN sx * sy > 0 THEN 1 END) AS BIGINT)
        |      AS conc,
        |    CAST(count(CASE WHEN sx * sy < 0 THEN 1 END) AS BIGINT)
        |      AS disc,
        |    CAST(count(CASE WHEN sx = 0 AND sy != 0 THEN 1 END)
        |      AS BIGINT) AS tie_x,
        |    CAST(count(CASE WHEN sy = 0 AND sx != 0 THEN 1 END)
        |      AS BIGINT) AS tie_y,
        |    CAST(count(CASE WHEN sx = 0 AND sy = 0 THEN 1 END)
        |      AS BIGINT) AS tie_both
        |  FROM p),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
        |SELECT n, n_pairs, conc, disc, tie_x, tie_y, tie_both,
        |       CASE WHEN (n_pairs - (tie_x + tie_both)) > 0
        |         AND (n_pairs - (tie_y + tie_both)) > 0
        |         THEN round(CAST(conc - disc AS DOUBLE) /
        |           sqrt(CAST(n_pairs - (tie_x + tie_both) AS DOUBLE) *
        |             CAST(n_pairs - (tie_y + tie_both) AS DOUBLE)), 6)
        |           + 0.0 END AS tau_b
        |FROM g, n""".stripMargin,
    // q253: Spearman rho — Pearson over DOUBLED midranks (2p + c + 1,
    // the q242 device) with HUGEINT sufficient sums; rho the one
    // fixed-order double.
    "q253_spearman_rho" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |base AS (SELECT c AS x, m AS y FROM daily
        |         WHERE c IS NOT NULL AND m IS NOT NULL),
        |vx AS (SELECT x AS v, count(*) AS cnt FROM base GROUP BY 1),
        |rx AS (SELECT v, 2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN
        |         UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |         + cnt + 1 AS rx
        |       FROM vx),
        |vy AS (SELECT y AS v, count(*) AS cnt FROM base GROUP BY 1),
        |ry AS (SELECT v, 2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN
        |         UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |         + cnt + 1 AS ry
        |       FROM vy),
        |r AS (SELECT rx.rx, ry.ry FROM base
        |      JOIN rx ON base.x = rx.v
        |      JOIN ry ON base.y = ry.v),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(rx AS HUGEINT)) AS sx,
        |        sum(CAST(ry AS HUGEINT)) AS sy,
        |        sum(CAST(rx AS HUGEINT) * rx) AS sxx,
        |        sum(CAST(ry AS HUGEINT) * ry) AS syy,
        |        sum(CAST(rx AS HUGEINT) * ry) AS sxy
        |      FROM r)
        |SELECT n,
        |       CASE WHEN (CAST(n AS HUGEINT) * sxx - sx * sx) > 0
        |         AND (CAST(n AS HUGEINT) * syy - sy * sy) > 0
        |         THEN round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy
        |           AS DOUBLE) /
        |           sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx
        |             AS DOUBLE) *
        |           CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)),
        |           6) + 0.0 END AS rho
        |FROM a""".stripMargin,
    // q254: majority vote of 3 binary LFs + per-LF audit — vote is
    // row-local (odd count, never a tie), ppm via HUGEINT.
    "q254_lf_vote" ->
      """WITH v AS (SELECT
        |    CAST(n_chars >= 300 AS INTEGER) AS lf_long,
        |    CAST(lang = 'en' AS INTEGER) AS lf_en,
        |    CAST(len(string_split(text, ' ')) >= 50 AS INTEGER)
        |      AS lf_wordy
        |  FROM documents),
        |v2 AS (SELECT *,
        |    CASE WHEN 2 * (lf_long + lf_en + lf_wordy) > 3 THEN 1
        |         WHEN 2 * (lf_long + lf_en + lf_wordy) < 3 THEN 0
        |         END AS vote
        |  FROM v),
        |one AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(vote) AS BIGINT) AS n_covered,
        |    CAST(count(CASE WHEN lf_long = 1 THEN 1 END) AS BIGINT)
        |      AS pos_long,
        |    CAST(count(CASE WHEN lf_long = vote THEN 1 END) AS BIGINT)
        |      AS agree_long,
        |    CAST(count(CASE WHEN lf_en = 1 THEN 1 END) AS BIGINT)
        |      AS pos_en,
        |    CAST(count(CASE WHEN lf_en = vote THEN 1 END) AS BIGINT)
        |      AS agree_en,
        |    CAST(count(CASE WHEN lf_wordy = 1 THEN 1 END) AS BIGINT)
        |      AS pos_wordy,
        |    CAST(count(CASE WHEN lf_wordy = vote THEN 1 END) AS BIGINT)
        |      AS agree_wordy
        |  FROM v2),
        |s AS (SELECT 'long' AS lf, n, n_covered, pos_long AS n_pos,
        |        agree_long AS n_agree FROM one
        |      UNION ALL
        |      SELECT 'en', n, n_covered, pos_en, agree_en FROM one
        |      UNION ALL
        |      SELECT 'wordy', n, n_covered, pos_wordy, agree_wordy
        |      FROM one)
        |SELECT lf, n, n_covered, n_agree,
        |       CASE WHEN n_covered > 0 THEN
        |         CAST(CAST(n_agree AS HUGEINT) * 1000000 // n_covered
        |           AS BIGINT) END AS agree_ppm,
        |       CAST(CAST(n_pos AS HUGEINT) * 1000000 // n AS BIGINT)
        |         AS pos_ppm
        |FROM s ORDER BY lf""".stripMargin,
    // q255: Cohen's kappa, denominators cleared — kappa_ppm =
    // ((n00+n11)*n - (r0*c0 + r1*c1)) * 1e6 // (n^2 - (r0*c0 + r1*c1)).
    "q255_cohen_kappa" ->
      """WITH c AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN n_chars < 300
        |      AND len(string_split(text, ' ')) < 50 THEN 1 END)
        |      AS BIGINT) AS n00,
        |    CAST(count(CASE WHEN n_chars < 300
        |      AND len(string_split(text, ' ')) >= 50 THEN 1 END)
        |      AS BIGINT) AS n01,
        |    CAST(count(CASE WHEN n_chars >= 300
        |      AND len(string_split(text, ' ')) < 50 THEN 1 END)
        |      AS BIGINT) AS n10,
        |    CAST(count(CASE WHEN n_chars >= 300
        |      AND len(string_split(text, ' ')) >= 50 THEN 1 END)
        |      AS BIGINT) AS n11
        |  FROM documents)
        |SELECT n, n00, n01, n10, n11,
        |  CASE WHEN CAST(n AS HUGEINT) * n -
        |      (CAST(n00 + n01 AS HUGEINT) * (n00 + n10)
        |       + CAST(n10 + n11 AS HUGEINT) * (n01 + n11)) <> 0
        |    THEN CAST((CAST(n00 + n11 AS HUGEINT) * n -
        |      (CAST(n00 + n01 AS HUGEINT) * (n00 + n10)
        |       + CAST(n10 + n11 AS HUGEINT) * (n01 + n11)))
        |      * 1000000 // (CAST(n AS HUGEINT) * n -
        |      (CAST(n00 + n01 AS HUGEINT) * (n00 + n10)
        |       + CAST(n10 + n11 AS HUGEINT) * (n01 + n11)))
        |      AS BIGINT) END AS kappa_ppm
        |FROM c""".stripMargin,
    // q256: exact AUC via doubled midranks (q242's device) — ppm of
    // 2*n_pos*n_neg.
    "q256_auc_exact" ->
      """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS s,
        |    CAST(lang = 'en' AS INTEGER) AS y
        |  FROM documents WHERE n_chars IS NOT NULL),
        |vals AS (SELECT s,
        |    CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS cp,
        |    CAST(count(CASE WHEN y = 0 THEN 1 END) AS BIGINT) AS cn
        |  FROM base GROUP BY 1),
        |r AS (SELECT cp, cn,
        |        2 * (sum(cp + cn) OVER (ORDER BY s ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW) - (cp + cn))
        |          + cp + cn + 1 AS two_mid
        |      FROM vals),
        |a AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
        |        CAST(sum(cn) AS BIGINT) AS n_neg,
        |        sum(CAST(cp AS HUGEINT) * two_mid) AS rp2
        |      FROM r)
        |SELECT n_pos, n_neg,
        |       CAST((rp2 - CAST(n_pos AS HUGEINT) * (n_pos + 1))
        |         * 1000000 // (2 * CAST(n_pos AS HUGEINT) * n_neg)
        |         AS BIGINT) AS auc_ppm
        |FROM a""".stripMargin,
    // q257: calibration table — n_chars ppm of the fixed 600 ceiling,
    // 10 equal-width bins, mean score vs positive rate in exact ppm.
    "q257_calibration" ->
      """WITH base AS (SELECT
        |    least(1000000, n_chars * 1000000 // 600) AS s,
        |    CAST(lang = 'en' AS INTEGER) AS y
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT CAST(least(9, s * 10 // 1000000) AS INTEGER) AS bin,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(s AS HUGEINT)) // count(*) AS BIGINT)
        |         AS mean_score_ppm,
        |       CAST(CAST(count(CASE WHEN y = 1 THEN 1 END) AS HUGEINT)
        |         * 1000000 // count(*) AS BIGINT) AS pos_ppm
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    // q278: isotonic (PAV) recalibration of q257's bins — the exact
    // minimax form cal(i) = max_{j<=i} min_{k>=i} pooled ppm rate,
    // range aggregates over the bins-sized table; monotone by
    // construction regardless of the truncating division.
    "q278_isotonic_cal" ->
      ("WITH " + isotonicCalCtes + "\n" +
        """SELECT bn.b AS bin, bn.n,
        |  CAST(CAST(bn.p AS HUGEINT) * 1000000 // bn.n AS BIGINT)
        |    AS pos_ppm,
        |  cal.cal_ppm
        |FROM bn JOIN cal ON bn.b = cal.i
        |ORDER BY bin""".stripMargin),
    // q281: apply-side isotonic calibration — q278's trained PAV map
    // joined back onto every document's (score, bin); bins never seen
    // in training calibrate to NULL (LEFT JOIN).
    "q281_isotonic_apply" ->
      ("WITH " + isotonicCalCtes + ",\n" +
        """ap AS (SELECT doc_id,
        |    least(1000000, n_chars * 1000000 // 600) AS score_ppm
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT ap.doc_id, ap.score_ppm,
        |  CAST(least(9, ap.score_ppm * 10 // 1000000) AS INTEGER)
        |    AS bin,
        |  cal.cal_ppm
        |FROM ap LEFT JOIN cal
        |  ON CAST(least(9, ap.score_ppm * 10 // 1000000) AS INTEGER)
        |     = cal.i
        |ORDER BY doc_id""".stripMargin),
    // q258: ROC staircase — one row per distinct threshold v
    // ("predict 1 when s >= v"); TP/FP from the ascending cumsums.
    "q258_roc_points" ->
      """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS s,
        |    CAST(lang = 'en' AS INTEGER) AS y
        |  FROM documents WHERE n_chars IS NOT NULL),
        |vals AS (SELECT s,
        |    CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS cp,
        |    CAST(count(CASE WHEN y = 0 THEN 1 END) AS BIGINT) AS cn
        |  FROM base GROUP BY 1),
        |c AS (SELECT s, cp, cn,
        |        sum(cp) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cum_p,
        |        sum(cn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cum_n,
        |        sum(cp) OVER () AS n_pos, sum(cn) OVER () AS n_neg
        |      FROM vals),
        |t AS (SELECT s AS threshold,
        |        CAST(n_pos - cum_p + cp AS BIGINT) AS tp,
        |        CAST(n_neg - cum_n + cn AS BIGINT) AS fp,
        |        CAST(n_pos AS BIGINT) AS n_pos,
        |        CAST(n_neg AS BIGINT) AS n_neg
        |      FROM c)
        |SELECT threshold, tp, fp,
        |       CAST(CAST(tp AS HUGEINT) * 1000000 // n_pos AS BIGINT)
        |         AS tpr_ppm,
        |       CAST(CAST(fp AS HUGEINT) * 1000000 // n_neg AS BIGINT)
        |         AS fpr_ppm,
        |       CAST(CAST(tp AS HUGEINT) * 1000000 // (tp + fp)
        |         AS BIGINT) AS precision_ppm
        |FROM t ORDER BY threshold""".stripMargin,
    // q259: Fleiss' kappa, denominators cleared — A = sum(x^2 +
    // (k-x)^2 - k), C = S1^2 + S0^2, E = (nk)^2, B = nk(k-1);
    // kappa_ppm = (A*E - B*C) * 1e6 // (B * (E - C)).
    "q259_fleiss_kappa" ->
      """WITH v AS (SELECT
        |    CAST(n_chars >= 300 AS INTEGER)
        |    + CAST(lang = 'en' AS INTEGER)
        |    + CAST(len(string_split(text, ' ')) >= 50 AS INTEGER)
        |      AS x
        |  FROM documents),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(x * x + (3 - x) * (3 - x) - 3 AS HUGEINT))
        |          AS a,
        |        sum(CAST(x AS HUGEINT)) AS s1
        |      FROM v WHERE x IS NOT NULL),
        |h AS (SELECT n, a,
        |        s1 * s1 + (CAST(n AS HUGEINT) * 3 - s1)
        |          * (CAST(n AS HUGEINT) * 3 - s1) AS c_num
        |      FROM g)
        |SELECT n, 3 AS k, CAST(a AS BIGINT) AS a,
        |       CASE WHEN CAST(n AS HUGEINT) * n * 3 * 3 - c_num <> 0
        |         THEN CAST((a * CAST(n AS HUGEINT) * n * 3 * 3
        |           - CAST(n AS HUGEINT) * 3 * (3 - 1) * c_num)
        |           * 1000000
        |           // (CAST(n AS HUGEINT) * 3 * (3 - 1)
        |           * (CAST(n AS HUGEINT) * n * 3 * 3 - c_num))
        |           AS BIGINT) END AS kappa_ppm
        |FROM h""".stripMargin,
    // q260: CDC snapshot diff — full outer join on doc_id, NULL-SAFE
    // per-column compare (IS NOT DISTINCT FROM = Spark's <=>),
    // long-format (dim, n) counters.
    "q260_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 5 <> 0),
        |v2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END
        |      AS text,
        |    lang, source,
        |    CASE WHEN doc_id % 3 = 0 THEN n_chars + 3 ELSE n_chars END
        |      AS n_chars
        |  FROM documents WHERE doc_id % 7 <> 0),
        |j AS (SELECT v1.doc_id AS ka, v2.doc_id AS kb,
        |        v1.text AS ta, v2.text AS tb,
        |        v1.lang AS la, v2.lang AS lb,
        |        v1.source AS sa, v2.source AS sb,
        |        v1.n_chars AS ca, v2.n_chars AS cb
        |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id),
        |o AS (SELECT
        |    CAST(count(ka) AS BIGINT) AS n_a,
        |    CAST(count(kb) AS BIGINT) AS n_b,
        |    CAST(count(CASE WHEN ka IS NULL THEN 1 END) AS BIGINT)
        |      AS added,
        |    CAST(count(CASE WHEN kb IS NULL THEN 1 END) AS BIGINT)
        |      AS removed,
        |    CAST(count(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |      AND NOT (ta IS NOT DISTINCT FROM tb
        |        AND la IS NOT DISTINCT FROM lb
        |        AND sa IS NOT DISTINCT FROM sb
        |        AND ca IS NOT DISTINCT FROM cb) THEN 1 END) AS BIGINT)
        |      AS changed,
        |    CAST(count(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |      AND ta IS NOT DISTINCT FROM tb
        |      AND la IS NOT DISTINCT FROM lb
        |      AND sa IS NOT DISTINCT FROM sb
        |      AND ca IS NOT DISTINCT FROM cb THEN 1 END) AS BIGINT)
        |      AS unchanged,
        |    CAST(count(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |      AND NOT (ta IS NOT DISTINCT FROM tb) THEN 1 END)
        |      AS BIGINT) AS chg_text,
        |    CAST(count(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |      AND NOT (la IS NOT DISTINCT FROM lb) THEN 1 END)
        |      AS BIGINT) AS chg_lang,
        |    CAST(count(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |      AND NOT (sa IS NOT DISTINCT FROM sb) THEN 1 END)
        |      AS BIGINT) AS chg_source,
        |    CAST(count(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |      AND NOT (ca IS NOT DISTINCT FROM cb) THEN 1 END)
        |      AS BIGINT) AS chg_n_chars
        |  FROM j)
        |SELECT 'n_a' AS dim, n_a AS n FROM o
        |UNION ALL SELECT 'n_b', n_b FROM o
        |UNION ALL SELECT 'added', added FROM o
        |UNION ALL SELECT 'removed', removed FROM o
        |UNION ALL SELECT 'changed', changed FROM o
        |UNION ALL SELECT 'unchanged', unchanged FROM o
        |UNION ALL SELECT 'changed:text', chg_text FROM o
        |UNION ALL SELECT 'changed:lang', chg_lang FROM o
        |UNION ALL SELECT 'changed:source', chg_source FROM o
        |UNION ALL SELECT 'changed:n_chars', chg_n_chars FROM o
        |ORDER BY dim""".stripMargin,
    // q261: Kruskal-Wallis H over 3 hash arms — doubled midranks,
    // HUGEINT rank sums + tie term, H the one fixed-order float
    // chain (same operand order as the Spark expr).
    "q261_kruskal" ->
      """WITH pu AS (SELECT user_id % 3 AS v, user_id AS u,
        |    CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |      AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |vals AS (SELECT m,
        |    CAST(count(CASE WHEN v = 0 THEN 1 END) AS BIGINT) AS c0,
        |    CAST(count(CASE WHEN v = 1 THEN 1 END) AS BIGINT) AS c1,
        |    CAST(count(CASE WHEN v = 2 THEN 1 END) AS BIGINT) AS c2
        |  FROM pu GROUP BY 1),
        |r AS (SELECT c0, c1, c2, c0 + c1 + c2 AS t,
        |        sum(c0 + c1 + c2) OVER (ORDER BY m ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM vals),
        |r2 AS (SELECT c0, c1, c2, t,
        |        2 * (cum - t) + t + 1 AS two_mid FROM r),
        |a AS (SELECT
        |    CAST(sum(c0) AS BIGINT) AS n_0,
        |    sum(CAST(c0 AS HUGEINT) * two_mid) AS r2_0,
        |    CAST(sum(c1) AS BIGINT) AS n_1,
        |    sum(CAST(c1 AS HUGEINT) * two_mid) AS r2_1,
        |    CAST(sum(c2) AS BIGINT) AS n_2,
        |    sum(CAST(c2 AS HUGEINT) * two_mid) AS r2_2,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie
        |  FROM r2),
        |b AS (SELECT *, n_0 + n_1 + n_2 AS n FROM a),
        |c AS (SELECT *,
        |    CASE WHEN (1.0 - CAST(tie AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * n * n - n)) > 0 THEN
        |      round(((3.0 / (CAST(n AS DOUBLE) * (n + 1))) *
        |        (CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE) / n_0
        |         + CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE) / n_1
        |         + CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE) / n_2)
        |        - 3.0 * (n + 1))
        |        / (1.0 - CAST(tie AS DOUBLE) /
        |          (CAST(n AS DOUBLE) * n * n - n)), 6) + 0.0 END AS h
        |  FROM b)
        |SELECT CAST(0 AS BIGINT) AS v, n_0 AS n_arm,
        |       CAST(r2_0 // n_0 AS BIGINT) AS mean_rank2, h FROM c
        |UNION ALL
        |SELECT 1, n_1, CAST(r2_1 // n_1 AS BIGINT), h FROM c
        |UNION ALL
        |SELECT 2, n_2, CAST(r2_2 // n_2 AS BIGINT), h FROM c
        |ORDER BY v""".stripMargin,
    // q262: McNemar — discordant cells only; chi2 in exact ppm.
    "q262_mcnemar" ->
      """WITH c AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN n_chars < 300
        |      AND len(string_split(text, ' ')) >= 50 THEN 1 END)
        |      AS BIGINT) AS n01,
        |    CAST(count(CASE WHEN n_chars >= 300
        |      AND len(string_split(text, ' ')) < 50 THEN 1 END)
        |      AS BIGINT) AS n10
        |  FROM documents)
        |SELECT n, n01, n10,
        |       CASE WHEN n01 + n10 > 0 THEN
        |         CAST(CAST(n01 - n10 AS HUGEINT) * (n01 - n10)
        |           * 1000000 // (n01 + n10) AS BIGINT) END AS chi2_ppm
        |FROM c""".stripMargin,
    // q263: Cochran's Q over the 3-LF panel — Q = (k(k-1)*sum(G^2)
    // - (k-1)*T1^2) * 1e6 // (k*T1 - T2), all HUGEINT.
    "q263_cochran_q" ->
      """WITH v AS (SELECT
        |    CAST(n_chars >= 300 AS INTEGER) AS r0,
        |    CAST(lang = 'en' AS INTEGER) AS r1,
        |    CAST(len(string_split(text, ' ')) >= 50 AS INTEGER) AS r2
        |  FROM documents),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(r0 + r1 + r2 AS HUGEINT)) AS t1,
        |        sum(CAST(r0 + r1 + r2 AS HUGEINT)
        |          * (r0 + r1 + r2)) AS t2,
        |        sum(CAST(r0 AS HUGEINT)) AS g0,
        |        sum(CAST(r1 AS HUGEINT)) AS g1,
        |        sum(CAST(r2 AS HUGEINT)) AS g2
        |      FROM v)
        |SELECT n, 3 AS k, CAST(t1 AS BIGINT) AS t1,
        |       CASE WHEN 3 * t1 - t2 <> 0 THEN
        |         CAST((3 * (3 - 1) * (g0 * g0 + g1 * g1 + g2 * g2)
        |           - (3 - 1) * t1 * t1)
        |           * 1000000 // (3 * t1 - t2) AS BIGINT) END
        |         AS chi2_ppm
        |FROM g""".stripMargin,
    // q264: accuracy-weighted revote — pass 1 replays q254's audit to
    // integer-ppm weights, pass 2 revotes 2*score vs total in exact
    // integers; audit rows are against the REVOTED consensus.
    "q264_weighted_vote" ->
      """WITH v AS (SELECT
        |    CAST(n_chars >= 300 AS INTEGER) AS lf_long,
        |    CAST(lang = 'en' AS INTEGER) AS lf_en,
        |    CAST(len(string_split(text, ' ')) >= 50 AS INTEGER)
        |      AS lf_wordy
        |  FROM documents),
        |v1 AS (SELECT *,
        |    CASE WHEN 2 * (lf_long + lf_en + lf_wordy) > 3 THEN 1
        |         WHEN 2 * (lf_long + lf_en + lf_wordy) < 3 THEN 0
        |         END AS vote
        |  FROM v),
        |w AS (SELECT
        |    CAST(CAST(count(CASE WHEN lf_long = vote THEN 1 END)
        |      AS HUGEINT) * 1000000 // count(vote) AS BIGINT) AS wl,
        |    CAST(CAST(count(CASE WHEN lf_en = vote THEN 1 END)
        |      AS HUGEINT) * 1000000 // count(vote) AS BIGINT) AS we,
        |    CAST(CAST(count(CASE WHEN lf_wordy = vote THEN 1 END)
        |      AS HUGEINT) * 1000000 // count(vote) AS BIGINT) AS ww
        |  FROM v1),
        |v2 AS (SELECT lf_long, lf_en, lf_wordy, wl, we, ww,
        |    CASE WHEN 2 * (lf_long * wl + lf_en * we + lf_wordy * ww)
        |           > wl + we + ww THEN 1
        |         WHEN 2 * (lf_long * wl + lf_en * we + lf_wordy * ww)
        |           < wl + we + ww THEN 0
        |         END AS vote
        |  FROM v, w),
        |one AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(vote) AS BIGINT) AS n_covered,
        |    any_value(wl) AS wl, any_value(we) AS we,
        |    any_value(ww) AS ww,
        |    CAST(count(CASE WHEN lf_long = 1 THEN 1 END) AS BIGINT)
        |      AS pos_long,
        |    CAST(count(CASE WHEN lf_long = vote THEN 1 END) AS BIGINT)
        |      AS agree_long,
        |    CAST(count(CASE WHEN lf_en = 1 THEN 1 END) AS BIGINT)
        |      AS pos_en,
        |    CAST(count(CASE WHEN lf_en = vote THEN 1 END) AS BIGINT)
        |      AS agree_en,
        |    CAST(count(CASE WHEN lf_wordy = 1 THEN 1 END) AS BIGINT)
        |      AS pos_wordy,
        |    CAST(count(CASE WHEN lf_wordy = vote THEN 1 END) AS BIGINT)
        |      AS agree_wordy
        |  FROM v2),
        |s AS (SELECT 'long' AS lf, wl AS w_ppm, n, n_covered,
        |        pos_long AS n_pos, agree_long AS n_agree FROM one
        |      UNION ALL
        |      SELECT 'en', we, n, n_covered, pos_en, agree_en FROM one
        |      UNION ALL
        |      SELECT 'wordy', ww, n, n_covered, pos_wordy, agree_wordy
        |      FROM one)
        |SELECT lf, w_ppm, n, n_covered, n_agree,
        |       CASE WHEN n_covered > 0 THEN
        |         CAST(CAST(n_agree AS HUGEINT) * 1000000 // n_covered
        |           AS BIGINT) END AS agree_ppm,
        |       CAST(CAST(n_pos AS HUGEINT) * 1000000 // n AS BIGINT)
        |         AS pos_ppm
        |FROM s ORDER BY lf""".stripMargin,
    // q265: scalar PSI — integer bucket edges ((v-lo)*bins div span,
    // clamped), +1 Laplace ppm, per-bin nano contributions (q197
    // recipe, same operand order).
    "q265_length_psi" ->
      """WITH ca AS (SELECT least(9, greatest(0,
        |      CAST((n_chars - 0) * 10 // 600 AS INTEGER))) AS bin,
        |    CAST(count(*) AS BIGINT) AS ca0
        |  FROM documents WHERE length(source) = 4 GROUP BY 1),
        |cb AS (SELECT least(9, greatest(0,
        |      CAST((n_chars - 0) * 10 // 600 AS INTEGER))) AS bin,
        |    CAST(count(*) AS BIGINT) AS cb0
        |  FROM documents WHERE length(source) > 4 GROUP BY 1),
        |s AS (SELECT CAST(range AS INTEGER) AS bin FROM range(10)),
        |j AS (SELECT s.bin,
        |        coalesce(ca0, 0) AS ca, coalesce(cb0, 0) AS cb
        |      FROM s LEFT JOIN ca ON s.bin = ca.bin
        |             LEFT JOIN cb ON s.bin = cb.bin),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |        CAST(sum(cb) AS BIGINT) AS n_b FROM j),
        |p AS (SELECT bin, ca, cb,
        |        greatest(1, (ca + 1) * 1000000 // (n_a + 10))
        |          AS pa_ppm,
        |        greatest(1, (cb + 1) * 1000000 // (n_b + 10))
        |          AS pb_ppm
        |      FROM j, t)
        |SELECT bin, ca, cb, pa_ppm, pb_ppm,
        |       CAST(round(CAST(pa_ppm - pb_ppm AS DOUBLE)
        |         * ln(CAST(pa_ppm AS DOUBLE) / pb_ppm) * 1000.0, 0)
        |         AS BIGINT) AS contrib_nano
        |FROM p ORDER BY bin""".stripMargin,
    // q266: winsorized mean — tails CLAMPED to the exact rank fences
    // (k = n*10 // 100), denominator stays n; fence ties are
    // value-identical so the clamped sum is order-invariant.
    "q266_winsor_mean" ->
      """WITH b AS (SELECT event_type AS g,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events
        |           WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY g) AS n
        |      FROM b),
        |f AS (SELECT g, v, n,
        |        max(CASE WHEN rn = n * 10 // 100 + 1 THEN v END)
        |          OVER (PARTITION BY g) AS lo_v,
        |        max(CASE WHEN rn = n - (n * 10 // 100) THEN v END)
        |          OVER (PARTITION BY g) AS hi_v
        |      FROM r),
        |a AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
        |        CAST(max(lo_v) AS BIGINT) AS lo_v,
        |        CAST(max(hi_v) AS BIGINT) AS hi_v,
        |        CAST(sum(least(greatest(v, lo_v), hi_v)) AS BIGINT)
        |          AS sum_winsor
        |      FROM f GROUP BY 1)
        |SELECT g AS "group", n, lo_v, hi_v, sum_winsor,
        |       CAST(CAST(sum_winsor AS HUGEINT) * 1000000 // n
        |         AS BIGINT) AS mean_micro
        |FROM a ORDER BY 1""".stripMargin,
    // q267: incremental IVF append — the oracle pins the deployment
    // identity EXACTLY (serve-over-appended == serve-over-rebuilt at a
    // frozen codebook, zero assignment disagreements); the Spark side
    // computes every flag honestly, so any divergence fails the gate.
    "q267_ivf_append" ->
      """SELECT CAST(range + 1 AS BIGINT) AS rank, 1 AS same,
        |       CAST(0 AS BIGINT) AS assign_diff
        |FROM range(10) ORDER BY 1""".stripMargin,
    // q268: pairwise LF conflict matrix — exact counts from one
    // conditional aggregate; pair order follows the LF list (long,
    // en), (long, wordy), (en, wordy). A NULL LF input is an
    // abstention: conflicts count only both-voted disagreements.
    "q268_lf_conflicts" ->
      """WITH v AS (SELECT
        |    CAST(n_chars >= 300 AS INTEGER) AS lf_long,
        |    CAST(lang = 'en' AS INTEGER) AS lf_en,
        |    CAST(len(string_split(text, ' ')) >= 50 AS INTEGER)
        |      AS lf_wordy
        |  FROM documents),
        |one AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN lf_long IS NOT NULL
        |      AND lf_en IS NOT NULL THEN 1 END) AS BIGINT) AS vt_le,
        |    CAST(count(CASE WHEN lf_long = lf_en THEN 1 END)
        |      AS BIGINT) AS ag_le,
        |    CAST(count(CASE WHEN lf_long = 1 AND lf_en = 1 THEN 1 END)
        |      AS BIGINT) AS bp_le,
        |    CAST(count(CASE WHEN lf_long IS NOT NULL
        |      AND lf_wordy IS NOT NULL THEN 1 END) AS BIGINT) AS vt_lw,
        |    CAST(count(CASE WHEN lf_long = lf_wordy THEN 1 END)
        |      AS BIGINT) AS ag_lw,
        |    CAST(count(CASE WHEN lf_long = 1 AND lf_wordy = 1 THEN 1
        |      END) AS BIGINT) AS bp_lw,
        |    CAST(count(CASE WHEN lf_en IS NOT NULL
        |      AND lf_wordy IS NOT NULL THEN 1 END) AS BIGINT) AS vt_ew,
        |    CAST(count(CASE WHEN lf_en = lf_wordy THEN 1 END)
        |      AS BIGINT) AS ag_ew,
        |    CAST(count(CASE WHEN lf_en = 1 AND lf_wordy = 1 THEN 1 END)
        |      AS BIGINT) AS bp_ew
        |  FROM v),
        |s AS (SELECT 'long' AS lf_a, 'en' AS lf_b, n, vt_le AS n_voted,
        |        ag_le AS n_agree, bp_le AS n_both_pos FROM one
        |      UNION ALL SELECT 'long', 'wordy', n, vt_lw, ag_lw, bp_lw
        |      FROM one
        |      UNION ALL SELECT 'en', 'wordy', n, vt_ew, ag_ew, bp_ew
        |      FROM one)
        |SELECT lf_a, lf_b, n, n_voted, n_agree,
        |       n_voted - n_agree AS n_conflict, n_both_pos,
        |       CASE WHEN n_voted > 0 THEN
        |         CAST(CAST(n_agree AS HUGEINT) * 1000000 // n_voted
        |           AS BIGINT) END AS agree_ppm
        |FROM s ORDER BY lf_a, lf_b""".stripMargin,
    // q269: exact-integer EWMA — the alpha = 1/4 rational recursion
    // s_t = (1*x_t + 3*s_{t-1}) // 4 replayed by a recursive CTE in
    // strict day order; all operands non-negative integers, so
    // truncating and floor division agree.
    "q269_revenue_ewma" -> ewmaRecursionSql,
    // q271: CUPED variance-reduced Welch t — six exact HUGEINT sums
    // per arm (n, Σx, Σy, Σx², Σy², Σxy over per-user pre/post
    // cents), theta and the adjusted means/variances derived from
    // them in the same fixed operand order as the Spark plan.
    "q271_cuped" ->
      """WITH span AS (SELECT
        |    (CAST(min(CAST(floor(epoch(ts) / 86400) AS BIGINT))
        |       AS BIGINT)
        |     + CAST(max(CAST(floor(epoch(ts) / 86400) AS BIGINT))
        |       AS BIGINT)) // 2 AS cut
        |  FROM events),
        |pu AS (SELECT user_id % 2 AS v, user_id AS u,
        |    CAST(coalesce(sum(CASE WHEN
        |        CAST(floor(epoch(ts) / 86400) AS BIGINT) < cut
        |        THEN CAST(round(value * 100) AS BIGINT) END), 0)
        |      AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN
        |        CAST(floor(epoch(ts) / 86400) AS BIGINT) >= cut
        |        THEN CAST(round(value * 100) AS BIGINT) END), 0)
        |      AS BIGINT) AS y
        |  FROM events, span
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM pu GROUP BY 1),
        |one AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN n END) AS BIGINT) AS n_a,
        |    sum(CASE WHEN v = 0 THEN sx END) AS sx_a,
        |    sum(CASE WHEN v = 0 THEN sy END) AS sy_a,
        |    sum(CASE WHEN v = 0 THEN sxx END) AS sxx_a,
        |    sum(CASE WHEN v = 0 THEN syy END) AS syy_a,
        |    sum(CASE WHEN v = 0 THEN sxy END) AS sxy_a,
        |    CAST(sum(CASE WHEN v = 1 THEN n END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN v = 1 THEN sx END) AS sx_b,
        |    sum(CASE WHEN v = 1 THEN sy END) AS sy_b,
        |    sum(CASE WHEN v = 1 THEN sxx END) AS sxx_b,
        |    sum(CASE WHEN v = 1 THEN syy END) AS syy_b,
        |    sum(CASE WHEN v = 1 THEN sxy END) AS sxy_b
        |  FROM g),
        |p AS (SELECT *, CAST(n_a AS HUGEINT) + n_b AS np,
        |    sx_a + sx_b AS sxp, sy_a + sy_b AS syp,
        |    sxx_a + sxx_b AS sxxp, sxy_a + sxy_b AS sxyp
        |  FROM one),
        |t2 AS (SELECT *,
        |    CASE WHEN np * sxxp - sxp * sxp = 0 THEN 0.0
        |      ELSE CAST(np * sxyp - sxp * syp AS DOUBLE)
        |        / CAST(np * sxxp - sxp * sxp AS DOUBLE) END AS theta,
        |    CAST(sxp AS DOUBLE) / CAST(np AS DOUBLE) AS xbar
        |  FROM p),
        |m AS (SELECT *,
        |    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - xbar) AS mean_a,
        |    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        - xbar) AS mean_b,
        |    CAST(CAST(n_a AS HUGEINT) * syy_a - sy_a * sy_a AS DOUBLE)
        |      AS aa,
        |    CAST(CAST(n_a AS HUGEINT) * sxy_a - sx_a * sy_a AS DOUBLE)
        |      AS ba,
        |    CAST(CAST(n_a AS HUGEINT) * sxx_a - sx_a * sx_a AS DOUBLE)
        |      AS ca,
        |    CAST(CAST(n_b AS HUGEINT) * syy_b - sy_b * sy_b AS DOUBLE)
        |      AS ab,
        |    CAST(CAST(n_b AS HUGEINT) * sxy_b - sx_b * sy_b AS DOUBLE)
        |      AS bb,
        |    CAST(CAST(n_b AS HUGEINT) * sxx_b - sx_b * sx_b AS DOUBLE)
        |      AS cb
        |  FROM t2),
        |v2 AS (SELECT *,
        |    (aa - 2.0 * theta * ba + theta * theta * ca)
        |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
        |      / CAST(n_a AS DOUBLE) AS sea,
        |    (ab - 2.0 * theta * bb + theta * theta * cb)
        |      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
        |      / CAST(n_b AS DOUBLE) AS seb
        |  FROM m),
        |v3 AS (SELECT *, sea + seb AS se2 FROM v2)
        |SELECT n_a, n_b, round(theta, 6) + 0.0 AS theta,
        |       round(mean_a, 4) + 0.0 AS mean_adj_a,
        |       round(mean_b, 4) + 0.0 AS mean_adj_b,
        |       CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0
        |         THEN round((mean_a - mean_b) / sqrt(se2), 4) + 0.0
        |         END AS t,
        |       CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0
        |         THEN round(se2 * se2 / (sea * sea
        |           / (CAST(n_a AS DOUBLE) - 1.0) + seb * seb
        |           / (CAST(n_b AS DOUBLE) - 1.0)), 2) + 0.0 END AS df
        |FROM v3""".stripMargin,
    // q272: EWMA control chart — level + deviation recursions and the
    // prior-threshold flag replayed by one recursive CTE; rn - 1 =
    // the number of PRIOR observations (Spark's size(acc)).
    "q272_ewma_chart" ->
      """WITH RECURSIVE b AS (
        |  SELECT event_type AS k,
        |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |r0 AS (SELECT k, d, x,
        |         row_number() OVER (PARTITION BY k ORDER BY d) AS rn
        |       FROM b),
        |rec AS (
        |  SELECT k, d, x, rn, x AS s, CAST(0 AS BIGINT) AS r,
        |         CAST(0 AS BIGINT) AS dev, 0 AS flag
        |  FROM r0 WHERE rn = 1
        |  UNION ALL
        |  SELECT r0.k, r0.d, r0.x, r0.rn,
        |         (1 * r0.x + 3 * rec.s) // 4,
        |         abs(r0.x - rec.s),
        |         (1 * abs(r0.x - rec.s) + 3 * rec.dev) // 4,
        |         CASE WHEN r0.rn - 1 >= 3 AND rec.dev > 0
        |           AND abs(r0.x - rec.s) > 3 * rec.dev
        |           THEN 1 ELSE 0 END
        |  FROM r0 JOIN rec ON r0.k = rec.k AND r0.rn = rec.rn + 1)
        |SELECT k, d, x, CAST(s AS BIGINT) AS ewma,
        |       CAST(r AS BIGINT) AS r, CAST(dev AS BIGINT) AS dev,
        |       CAST(flag AS INTEGER) AS flag
        |FROM rec ORDER BY k, d""".stripMargin,
    // q270: EWMA state form — Spark builds the first half as prior
    // state and FOLDS the second half through ewmaDailyAppend; the
    // oracle replays the SAME one recursion over the full log
    // (literally q269's SQL — one shared constant, so the two keys
    // can never drift apart), so every row including the
    // split-boundary seam must match exactly.
    "q270_ewma_append" -> ewmaRecursionSql,
    // q273: Holt linear trend — q269's recursion with a signed TREND
    // state, so every division is the sign-safe truncation
    // tdiv(v, den) = sign(v)·(|v| // den): both branches divide
    // non-negative operands, where DuckDB's // and Spark's div agree
    // (for negatives they may not — the STATUS r11 rule). The level
    // update needs l_t inside the trend update, hence the nested
    // subquery in the recursive term.
    "q273_revenue_holt" -> holtRecursionSql,
    // q277: the append/state form — the Spark side splits the log at
    // the median day, persists the prior and FOLDS the second half
    // through holtDailyAppend onto each key's stored (level, trend);
    // the oracle replays the SAME one full-log recursion (literally
    // q273's SQL — one shared constant, so the two keys can never
    // drift apart), so every row including the split-boundary seam
    // must match exactly.
    "q277_holt_append" -> holtRecursionSql,
    // q289: Holt–Winters additive — the recursion unrolled with the 7
    // seasonal slots carried through the recursive CTE (generated;
    // see holtWintersSql).
    "q289_holt_winters" -> holtWintersRowsSql,
    // q283: Holt–Winters one-step backtest — forecast MAE vs the
    // seasonal-naive baseline over the same recursion (shared CTEs).
    "q283_hw_backtest" -> holtWintersBacktestSql,
    // q290: the HW append/state form — the Spark side splits the log
    // at the median day and folds the second half onto each key's
    // persisted (level, trend, seasonal ring); the oracle replays the
    // SAME full-log recursion (q289's SQL constant — the q277 seam
    // pattern), so every row including the split boundary must match.
    "q290_hw_append" -> holtWintersRowsSql,
    // q275: Fellegi–Sunter field weights — u from the exact value
    // histogram (Σ c·(c−1) / n·(n−1), HUGEINT), odds not log-weights
    // (log is not IEEE correctly-rounded across engines; see the
    // operator scaladoc). The 0.95/0.05 literals cast to the same
    // doubles the Spark side derives from ppm integers — NEVER write
    // (1.0 − 0.95) here: DuckDB evaluates that in exact DECIMAL
    // (0.05), one ulp off the double subtraction.
    "q275_linkage_weights" ->
      """WITH st AS (
        |  SELECT 'segment' AS f, CAST(c_mktsegment AS VARCHAR) AS v
        |    FROM customer
        |  UNION ALL
        |  SELECT 'nation', CAST(c_nationkey AS VARCHAR) FROM customer
        |  UNION ALL
        |  SELECT 'bal_h', CAST(CAST(floor(c_acctbal / 100) AS BIGINT)
        |      AS VARCHAR)
        |    FROM customer),
        |cnt AS (SELECT f, v, CAST(count(*) AS BIGINT) AS c
        |        FROM st WHERE v IS NOT NULL GROUP BY 1, 2),
        |g AS (SELECT f, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        sum(CAST(c AS HUGEINT) * (c - 1)) AS ap
        |      FROM cnt GROUP BY 1),
        |t AS (SELECT *, CAST(n AS HUGEINT) * (n - 1) AS tp FROM g)
        |SELECT f AS field, n, n_distinct,
        |  CASE WHEN tp > 0 THEN CAST(ap * 1000000 // tp AS BIGINT)
        |    END AS u_ppm,
        |  CASE WHEN tp > 0 AND ap > 0 THEN
        |    round(0.95 / (CAST(ap AS DOUBLE) / CAST(tp AS DOUBLE)), 4)
        |      + 0.0 END AS match_odds,
        |  CASE WHEN tp > ap THEN
        |    round(0.05 / (1.0 - CAST(ap AS DOUBLE)
        |      / CAST(tp AS DOUBLE)), 4) + 0.0 END AS nonmatch_odds
        |FROM t ORDER BY field""".stripMargin,
    // q276: Fellegi–Sunter pair scoring — q275's u's (ppm-clamped),
    // pairs blocked by the FINE composite key (nation × hundred-dollar
    // balance bucket — the scale-safe wiring; the 25-value nation-only
    // block is SCALING.md's named quadratic lesson), score = the exact
    // HUGEINT product of per-field odds_ppm over (segment, exact
    // balance cents — NOT nested in the block key) at reliability
    // m = 0.7; > 10¹² (the 2-field neutral) = net positive match
    // evidence. No float anywhere; u from the UNFILTERED table
    // (ADVICE r12).
    "q276_linkage_pairs" ->
      ("WITH " + linkagePairsCtes + "\n" +
        """SELECT id_a, id_b, CAST(n_agree AS INTEGER) AS n_agree,
        |       CAST(score_pp AS BIGINT) AS score_pp
        |FROM sc WHERE score_pp > CAST(1000000 AS HUGEINT) * 1000000
        |ORDER BY score_pp DESC, id_a, id_b""".stripMargin),
    // q280: linkage entity clustering — the rung Splink ships after
    // scoring: q276's net-positive pairs as an undirected graph, the
    // q64 recursive min-label walk assigns each clustered record its
    // canonical entity id (min custkey reachable), plus cluster size.
    "q280_linkage_entities" ->
      ("WITH RECURSIVE " + linkagePairsCtes + ",\n" +
        """passed AS (SELECT id_a, id_b FROM sc
        |  WHERE score_pp > CAST(1000000 AS HUGEINT) * 1000000),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM passed
        |          UNION SELECT id_b, id_a FROM passed),
        |walk AS (SELECT src, src AS lbl
        |           FROM (SELECT DISTINCT src FROM edges)
        |         UNION
        |         SELECT e.dst AS src, w.lbl FROM walk w
        |         JOIN edges e ON e.src = w.src),
        |comp AS (SELECT src AS c_custkey, min(lbl) AS entity_id
        |         FROM walk GROUP BY src),
        |sz AS (SELECT entity_id, CAST(count(*) AS BIGINT)
        |         AS cluster_size
        |       FROM comp GROUP BY 1)
        |SELECT c.c_custkey, c.entity_id, s.cluster_size
        |FROM comp c JOIN sz s USING (entity_id)
        |ORDER BY c_custkey""".stripMargin),
    // q279: Fellegi–Sunter EM — two unrolled iterations over the four
    // agreement-pattern counts, all-HUGEINT, built by the same
    // fragment generator shape as the Spark side (linkageEmSql).
    "q279_linkage_em" -> linkageEmSql,
    // q282: tf-adjusted rescoring of the same blocked pairs (Splink's
    // tf_adjustments) — see linkageTfSql.
    "q282_linkage_tf" -> linkageTfSql,
    // q287: Dawid–Skene — two unrolled EM iterations, all-HUGEINT
    // ppm, generated per rater (see dawidSkeneSql).
    "q287_dawid_skene" -> dawidSkeneParamsSql,
    // q288: Dawid–Skene posterior labels — the same CTE chain plus
    // one more E projection through the fitted parameter row.
    "q288_ds_posterior" -> dawidSkenePosteriorSql,
    // q286: difference-in-differences — per-user post-minus-pre cents
    // delta (silent period = 0, not missing), Welch SE over the
    // deltas; exact HUGEINT sufficient stats, q274's vm form (exact
    // integer difference, THEN the double cast), fixed fold order.
    "q286_diff_in_diff" ->
      """WITH pu AS (SELECT user_id % 2 AS v, user_id AS u,
        |    CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP
        |        '2024-01-16 00:00:00'
        |        THEN CAST(round(value * 100) AS BIGINT) END), 0)
        |      - coalesce(sum(CASE WHEN NOT (ts >= TIMESTAMP
        |        '2024-01-16 00:00:00')
        |        THEN CAST(round(value * 100) AS BIGINT) END), 0)
        |      AS BIGINT) AS d
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |one AS (SELECT
        |    CAST(count(CASE WHEN v = 0 THEN 1 END) AS BIGINT) AS n_a,
        |    coalesce(sum(CASE WHEN v = 0 THEN CAST(d AS HUGEINT) END),
        |      0) AS s1_a,
        |    coalesce(sum(CASE WHEN v = 0 THEN CAST(d AS HUGEINT) * d
        |      END), 0) AS s2_a,
        |    CAST(count(CASE WHEN v = 1 THEN 1 END) AS BIGINT) AS n_b,
        |    coalesce(sum(CASE WHEN v = 1 THEN CAST(d AS HUGEINT) END),
        |      0) AS s1_b,
        |    coalesce(sum(CASE WHEN v = 1 THEN CAST(d AS HUGEINT) * d
        |      END), 0) AS s2_b
        |  FROM pu),
        |w AS (SELECT *,
        |    CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
        |    CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
        |    CAST(CAST(n_a AS HUGEINT) * s2_a - s1_a * s1_a AS DOUBLE)
        |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
        |      / CAST(n_a AS DOUBLE) AS va,
        |    CAST(CAST(n_b AS HUGEINT) * s2_b - s1_b * s1_b AS DOUBLE)
        |      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
        |      / CAST(n_b AS DOUBLE) AS vb
        |  FROM one),
        |w2 AS (SELECT *, mb - ma AS did, va + vb AS se2 FROM w),
        |w3 AS (SELECT *,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0
        |      THEN round(did / sqrt(se2), 4) + 0.0 END AS z
        |  FROM w2)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a >= 1 THEN round(ma, 4) + 0.0 END AS dbar_a,
        |  CASE WHEN n_b >= 1 THEN round(mb, 4) + 0.0 END AS dbar_b,
        |  CASE WHEN n_a >= 1 AND n_b >= 1 THEN round(did, 4) + 0.0
        |    END AS did,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0
        |    THEN round(sqrt(se2), 4) + 0.0 END AS se,
        |  z,
        |  CAST(coalesce(abs(z) >= 1.96, false) AS INTEGER)
        |    AS significant
        |FROM w3""".stripMargin,
    // q285: Krippendorff's alpha (nominal) — coincidence-matrix
    // identities, no rating pair ever forms; per-unit and final
    // divisions truncating, sign-safe alpha (STATUS signed-division
    // rule).
    "q285_krippendorff" ->
      """WITH st AS (
        |  SELECT u, CAST(v AS VARCHAR) AS v FROM (
        |    SELECT doc_id AS u, unnest([r1, r2, r3]) AS v FROM (
        |      SELECT doc_id,
        |        CASE WHEN n_chars >= 50
        |          THEN CAST(n_chars >= 300 AS INTEGER) END AS r1,
        |        CASE WHEN doc_id % 7 <> 0
        |          THEN CAST(lang = 'en' AS INTEGER) END AS r2,
        |        CASE WHEN doc_id % 5 <> 0
        |          THEN CAST(len(string_split(text, ' ')) >= 50
        |            AS INTEGER) END AS r3
        |      FROM documents))
        |  WHERE u IS NOT NULL AND v IS NOT NULL),
        |uc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c
        |       FROM st GROUP BY 1, 2),
        |um AS (SELECT u, CAST(sum(c) AS BIGINT) AS m,
        |         sum(CAST(c AS HUGEINT) * c) AS s2
        |       FROM uc GROUP BY 1 HAVING sum(c) >= 2),
        |dr AS (SELECT coalesce(sum((CAST(m AS HUGEINT) * m - s2)
        |           * 1000000 // (m - 1)), 0) AS do_ppm,
        |         CAST(count(*) AS BIGINT) AS n_units
        |       FROM um),
        |nc AS (SELECT v, CAST(sum(c) AS BIGINT) AS ncv
        |       FROM uc JOIN um USING (u) GROUP BY 1),
        |de AS (SELECT coalesce(CAST(sum(ncv) AS BIGINT), 0) AS n,
        |         CAST(count(*) AS BIGINT) AS n_values,
        |         coalesce(sum(CAST(ncv AS HUGEINT) * ncv), 0) AS sc2
        |       FROM nc),
        |fin AS (SELECT dr.n_units, de.n_values, de.n,
        |    CAST(dr.do_ppm AS BIGINT) AS do_ppm,
        |    CASE WHEN de.n > 1 THEN
        |      CAST((CAST(de.n AS HUGEINT) * de.n - de.sc2) * 1000000
        |        // (de.n - 1) AS BIGINT) END AS de_ppm
        |  FROM dr, de)
        |SELECT n_units, n_values, n, do_ppm, de_ppm,
        |  CASE WHEN de_ppm > 0 THEN
        |    CAST(CAST(sign(de_ppm - do_ppm) AS HUGEINT)
        |      * (abs(CAST(de_ppm AS HUGEINT) - do_ppm) * 1000000
        |         // de_ppm) AS BIGINT) END AS alpha_ppm
        |FROM fin""".stripMargin,
    // q291: per-field evidence waterfall on the passing pairs — the
    // generated odds branches (see linkageEvidenceSql).
    "q291_linkage_evidence" -> linkageEvidenceSql,
    // q292: graded comparison levels — per-level u from the CANDIDATE
    // population (count of blocked pairs at the level), per-level m
    // from the query; every candidate ranked, no cut.
    "q292_linkage_leveled" ->
      """WITH base AS (SELECT c_custkey AS pid,
        |    concat_ws('_', c_nationkey,
        |      CAST(floor(c_acctbal / 100) AS BIGINT)) AS blk,
        |    c_mktsegment AS f_seg,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS f_cents
        |  FROM customer WHERE c_custkey IS NOT NULL),
        |p AS (SELECT a.pid AS id_a, b.pid AS id_b,
        |    a.f_seg AS a_seg, b.f_seg AS b_seg,
        |    a.f_cents AS a_cents, b.f_cents AS b_cents
        |  FROM base a JOIN base b ON a.blk = b.blk AND a.pid < b.pid),
        |lv AS (SELECT id_a, id_b,
        |    CASE WHEN a_seg IS NULL OR b_seg IS NULL THEN -1
        |         WHEN a_seg = b_seg THEN 0 ELSE 1 END AS lvl_seg,
        |    CASE WHEN a_cents IS NULL OR b_cents IS NULL THEN -1
        |         WHEN a_cents = b_cents THEN 0
        |         WHEN abs(a_cents - b_cents) <= 100 THEN 1
        |         ELSE 2 END AS lvl_cents
        |  FROM p),
        |u AS (SELECT
        |    greatest(1, least(999999, CAST(coalesce(count(CASE WHEN
        |      lvl_seg = 0 THEN 1 END), 0) * 1000000 // greatest(1,
        |      count(CASE WHEN lvl_seg >= 0 THEN 1 END)) AS BIGINT)))
        |      AS u_seg_0,
        |    greatest(1, least(999999, CAST(coalesce(count(CASE WHEN
        |      lvl_seg = 1 THEN 1 END), 0) * 1000000 // greatest(1,
        |      count(CASE WHEN lvl_seg >= 0 THEN 1 END)) AS BIGINT)))
        |      AS u_seg_1,
        |    greatest(1, least(999999, CAST(coalesce(count(CASE WHEN
        |      lvl_cents = 0 THEN 1 END), 0) * 1000000 // greatest(1,
        |      count(CASE WHEN lvl_cents >= 0 THEN 1 END)) AS BIGINT)))
        |      AS u_cents_0,
        |    greatest(1, least(999999, CAST(coalesce(count(CASE WHEN
        |      lvl_cents = 1 THEN 1 END), 0) * 1000000 // greatest(1,
        |      count(CASE WHEN lvl_cents >= 0 THEN 1 END)) AS BIGINT)))
        |      AS u_cents_1,
        |    greatest(1, least(999999, CAST(coalesce(count(CASE WHEN
        |      lvl_cents = 2 THEN 1 END), 0) * 1000000 // greatest(1,
        |      count(CASE WHEN lvl_cents >= 0 THEN 1 END)) AS BIGINT)))
        |      AS u_cents_2
        |  FROM lv),
        |sc AS (SELECT id_a, id_b, lvl_seg, lvl_cents,
        |    (CASE lvl_seg
        |       WHEN -1 THEN CAST(1000000 AS HUGEINT)
        |       WHEN 0 THEN CAST(700000 AS HUGEINT) * 1000000 // u_seg_0
        |       ELSE CAST(300000 AS HUGEINT) * 1000000 // u_seg_1 END)
        |  * (CASE lvl_cents
        |       WHEN -1 THEN CAST(1000000 AS HUGEINT)
        |       WHEN 0 THEN CAST(600000 AS HUGEINT) * 1000000
        |         // u_cents_0
        |       WHEN 1 THEN CAST(300000 AS HUGEINT) * 1000000
        |         // u_cents_1
        |       ELSE CAST(100000 AS HUGEINT) * 1000000 // u_cents_2
        |       END) AS score_pp
        |  FROM lv, u)
        |SELECT id_a, id_b,
        |  CASE lvl_seg WHEN -1 THEN 'abstain' WHEN 0 THEN 'agree'
        |    ELSE 'disagree' END AS level_seg,
        |  CASE lvl_cents WHEN -1 THEN 'abstain' WHEN 0 THEN 'exact'
        |    WHEN 1 THEN 'close' ELSE 'far' END AS level_cents,
        |  CAST(score_pp AS BIGINT) AS score_pp
        |FROM sc WHERE score_pp > 0
        |ORDER BY score_pp DESC, id_a, id_b""".stripMargin,
    // q284: blocking pre-flight — exact candidate-pair bill per block
    // key from ONE key-sized aggregate, never a pair.
    "q284_block_audit" ->
      """WITH a AS (
        |  SELECT 'nation_bal100_fine' AS block_key,
        |    concat_ws('_', c_nationkey,
        |      CAST(floor(c_acctbal / 100) AS BIGINT)) AS blk
        |  FROM customer WHERE c_custkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'nation_coarse', CAST(c_nationkey AS VARCHAR)
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL),
        |sz AS (SELECT block_key, blk, CAST(count(*) AS BIGINT) AS c
        |       FROM a GROUP BY 1, 2)
        |SELECT block_key,
        |  CAST(sum(c) AS BIGINT) AS n_records,
        |  CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(CAST(c AS HUGEINT) * (c - 1)) // 2 AS BIGINT)
        |    AS candidate_pairs,
        |  CAST(max(c) AS BIGINT) AS max_block,
        |  CASE WHEN sum(CAST(c AS HUGEINT) * (c - 1)) > 0 THEN
        |    CAST(max(CAST(c AS HUGEINT) * (c - 1)) * 1000000
        |      // sum(CAST(c AS HUGEINT) * (c - 1)) AS BIGINT)
        |  ELSE 0 END AS hot_block_pairs_ppm,
        |  CASE WHEN sum(c) > 1 THEN
        |    CAST(sum(CAST(c AS HUGEINT) * (c - 1)) * 1000000
        |      // (CAST(sum(c) AS HUGEINT) * (CAST(sum(c) AS HUGEINT)
        |          - 1)) AS BIGINT)
        |  ELSE 0 END AS vs_allpairs_ppm
        |FROM sz GROUP BY 1 ORDER BY block_key""".stripMargin,
    // q274: post-stratified ATE — 3 engagement tiers × 2 arms of
    // exact HUGEINT sufficient statistics in ONE conditional
    // aggregate; the float tail folds the FIXED tier order 0,1,2
    // (left-associative + in both engines) with the testable-strata
    // guard (n >= 2 in BOTH arms) mirrored term by term.
    "q274_ate_stratified" -> ateStratifiedSql,
    // q293: log-rank test — q227's lifetime/censor model split by the
    // user_id mod 2 arm; per-day hypergeometric moments accumulate as
    // exact truncating-division integers (E in ppm, V in ppt with
    // HUGEINT numerators); z is the only float, fixed operand order.
    "q293_log_rank" ->
      """WITH days AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(user_id % 2 AS INT) AS g FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l, max(g) AS g
        |      FROM days GROUP BY 1),
        |lt AS (SELECT l - f AS t, g,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |h AS (SELECT t,
        |    sum(CASE WHEN g = 1 THEN dead ELSE 0 END) AS d1,
        |    sum(CASE WHEN g = 1 THEN 1 - dead ELSE 0 END) AS c1,
        |    sum(CASE WHEN g <> 1 THEN dead ELSE 0 END) AS d0,
        |    sum(CASE WHEN g <> 1 THEN 1 - dead ELSE 0 END) AS c0
        |  FROM lt GROUP BY 1),
        |r AS (SELECT t, d1, d0,
        |    sum(d1 + c1) OVER (ORDER BY t DESC ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
        |    sum(d0 + c0) OVER (ORDER BY t DESC ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS n0
        |  FROM h),
        |c AS (SELECT d1, d0 + d1 AS dd, n0 + n1 AS nn, n1, n0
        |      FROM r WHERE d0 + d1 > 0 AND n0 + n1 >= 2),
        |mo AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(CAST(dd AS HUGEINT) * n1 * 1000000 // nn)
        |      AS BIGINT) AS e1_ppm,
        |    CAST(sum(CAST(dd AS HUGEINT) * n1 * n0 * (nn - dd)
        |        * 1000000000000
        |        // (CAST(nn AS HUGEINT) * nn * (nn - 1)))
        |      AS BIGINT) AS v_ppt
        |  FROM c),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN g <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0_users,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1_users
        |  FROM lt)
        |SELECT n0_users, n1_users, o1, e1_ppm, v_ppt,
        |  CASE WHEN v_ppt > 0 THEN
        |    CAST(o1 * 1000000 - e1_ppm AS DOUBLE) / sqrt(CAST(v_ppt
        |      AS DOUBLE)) END AS z
        |FROM mo, tot""".stripMargin,
    // q294: Wald SPRT — users as Bernoulli trials in arrival order;
    // the LLR walk and its bounds are the documented micro-nat
    // LITERALS (ln(2), ln(0.75), ±ln(19)), pure integer end to end.
    "q294_sprt" -> sprtSql,
    // q306: the SPRT state/append seam — prior(first-half users) ∪
    // batch(new users) must equal the ONE walk over the full log
    // (q294's SQL constant — the q290 seam convention).
    "q306_sprt_append" -> sprtSql,
  )

  /** Two unrolled integer-HITS supersteps over an edge CTE named `e`
    * (nodes, per-step raw sums, max-renormalized micro scores) — the
    * shared tail of the q296 (full graph) and q316 (degree-capped)
    * oracles; both end top-50 by (authority DESC, node). */
  private lazy val hitsIterSql: String =
      """n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |a1r AS (SELECT dst AS node,
        |          sum(CAST(1000000 AS HUGEINT)) AS s
        |        FROM e GROUP BY 1),
        |a1 AS (SELECT n.node, CAST(coalesce(
        |         coalesce(s, 0) * 1000000
        |           // nullif((SELECT max(s) FROM a1r), 0), 0)
        |         AS BIGINT) AS a
        |       FROM n LEFT JOIN a1r USING (node)),
        |h1r AS (SELECT e.src AS node, sum(CAST(a1.a AS HUGEINT)) AS s
        |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
        |h1 AS (SELECT n.node, CAST(coalesce(
        |         coalesce(s, 0) * 1000000
        |           // nullif((SELECT max(s) FROM h1r), 0), 0)
        |         AS BIGINT) AS h
        |       FROM n LEFT JOIN h1r USING (node)),
        |a2r AS (SELECT e.dst AS node, sum(CAST(h1.h AS HUGEINT)) AS s
        |        FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
        |a2 AS (SELECT n.node, CAST(coalesce(
        |         coalesce(s, 0) * 1000000
        |           // nullif((SELECT max(s) FROM a2r), 0), 0)
        |         AS BIGINT) AS a
        |       FROM n LEFT JOIN a2r USING (node)),
        |h2r AS (SELECT e.src AS node, sum(CAST(a2.a AS HUGEINT)) AS s
        |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1),
        |h2 AS (SELECT n.node, CAST(coalesce(
        |         coalesce(s, 0) * 1000000
        |           // nullif((SELECT max(s) FROM h2r), 0), 0)
        |         AS BIGINT) AS h
        |       FROM n LEFT JOIN h2r USING (node))
        |SELECT node, a2.a AS authority_micro, h2.h AS hub_micro
        |FROM n JOIN a2 USING (node) JOIN h2 USING (node)
        |ORDER BY authority_micro DESC, node LIMIT 50""".stripMargin

  /** The one KM-curve oracle recursion (q227's lifetime/censoring
    * model, exact HUGEINT ppm recurrence) — shared VERBATIM by q227
    * (direct form) and q311 (span-state merge/readout identity: the
    * merged per-user spans reproduce exactly the one-pass lifetimes,
    * so the state readout must hash-equal this SQL). */
  private lazy val survivalCurveSql: String =
      """WITH RECURSIVE
        |days AS (SELECT user_id AS u,
        |           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |         FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l FROM days GROUP BY 1),
        |lt AS (SELECT l - f AS t,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |grid AS (SELECT unnest(range(0, (SELECT max(t) FROM lt) + 1))
        |           AS t),
        |km AS (SELECT g.t,
        |         (SELECT count(*) FROM lt WHERE lt.t >= g.t) AS n_risk,
        |         (SELECT count(*) FROM lt WHERE lt.t = g.t
        |            AND dead = 1) AS n_dead,
        |         (SELECT count(*) FROM lt WHERE lt.t = g.t
        |            AND dead = 0) AS n_censored
        |       FROM grid g),
        |s AS (SELECT CAST(-1 AS BIGINT) AS t,
        |             CAST(1000000 AS HUGEINT) AS surv
        |      UNION ALL
        |      SELECT km.t, s.surv * (km.n_risk - km.n_dead) // km.n_risk
        |      FROM s JOIN km ON km.t = s.t + 1)
        |SELECT km.t, CAST(km.n_risk AS BIGINT) AS n_risk,
        |       CAST(km.n_dead AS BIGINT) AS n_dead,
        |       CAST(km.n_censored AS BIGINT) AS n_censored,
        |       CAST(CAST(km.n_dead AS HUGEINT) * 1000000 // km.n_risk
        |         AS BIGINT) AS hazard_ppm,
        |       CAST(s.surv AS BIGINT) AS survival_ppm
        |FROM km JOIN s USING (t)
        |ORDER BY t""".stripMargin

  private lazy val sprtSql: String =
      """WITH u AS (SELECT user_id AS u,
        |    CAST(max(user_id % 2) AS INT) AS g, min(ts) AS t0,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS x
        |  FROM events GROUP BY 1),
        |w AS (SELECT g,
        |    CAST(row_number() OVER win AS BIGINT) AS n,
        |    sum(CASE WHEN x = 1 THEN 693147 ELSE -287682 END)
        |      OVER win AS llr
        |  FROM u WINDOW win AS (PARTITION BY g ORDER BY t0, u
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (SELECT g, n, llr,
        |    CASE WHEN llr >= 2944439 THEN 'h1'
        |         WHEN llr <= -2944439 THEN 'h0' END AS dec
        |  FROM w),
        |f AS (SELECT g, min(n) AS n_dec FROM c WHERE dec IS NOT NULL
        |      GROUP BY 1),
        |t AS (SELECT g, max(n) AS n_trials FROM c GROUP BY 1)
        |SELECT t.g AS arm, t.n_trials,
        |  coalesce(f.n_dec, t.n_trials) AS n_at_decision,
        |  CAST(c.llr AS BIGINT) AS llr_micro,
        |  coalesce(c.dec, 'continue') AS decision
        |FROM t LEFT JOIN f USING (g)
        |JOIN c ON c.g = t.g AND c.n = coalesce(f.n_dec, t.n_trials)
        |ORDER BY arm""".stripMargin

  private lazy val oracleSqlMore: Map[String, String] = Map(
    // q295: single changepoint per event type — prefix-sum g(t) in
    // exact integer cents² (HUGEINT numerators), earliest-split
    // tiebreak; gain = g(t*) − S_n² // n, all divisions on
    // non-negative operands (floor == truncate).
    "q295_changepoint" ->
      """WITH daily AS (SELECT event_type AS k,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |pre AS (SELECT k, d, v,
        |    CAST(row_number() OVER w AS BIGINT) AS i,
        |    sum(v) OVER (PARTITION BY k ORDER BY d ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
        |    count(*) OVER (PARTITION BY k) AS n,
        |    sum(v) OVER (PARTITION BY k) AS sn
        |  FROM daily WINDOW w AS (PARTITION BY k ORDER BY d)),
        |cand AS (SELECT k, d, i, s, n, sn,
        |    (CAST(s AS HUGEINT) * s * (n - i)
        |      + CAST(sn - s AS HUGEINT) * (sn - s) * i)
        |      // (CAST(i AS HUGEINT) * (n - i)) AS g
        |  FROM pre WHERE i < n),
        |best AS (SELECT *, row_number() OVER
        |    (PARTITION BY k ORDER BY g DESC, i) AS rk FROM cand)
        |SELECT k, CAST(n AS BIGINT) AS n_days, d AS split_day,
        |  i AS left_n, CAST(n - i AS BIGINT) AS right_n,
        |  CAST(s // i AS BIGINT) AS left_mean_cents,
        |  CAST((sn - s) // (n - i) AS BIGINT) AS right_mean_cents,
        |  CAST(g - CAST(sn AS HUGEINT) * sn // n AS BIGINT)
        |    AS gain_cents2
        |FROM best WHERE rk = 1
        |ORDER BY k""".stripMargin,
    // q296: HITS — two exact-integer iterations on q153's graph; each
    // half-step renormalizes by the scalar max (integer //), so every
    // score replays exactly; missing in/out-edges read 0.
    "q296_hits" ->
      s"""WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey + 1000000000 AS BIGINT) AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |$hitsIterSql""".stripMargin,
    // q316: degree-capped HITS — the q296 chain over the edges into
    // the top-10 in-degree authorities only (count DESC, dst ASC cut
    // BEFORE iterating); scores renormalize within the kept subgraph.
    "q316_hits_capped" ->
      s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |              CAST(l_suppkey + 1000000000 AS BIGINT) AS dst
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |ind AS (SELECT dst, count(*) AS c FROM e0 GROUP BY 1),
        |topd AS (SELECT dst FROM ind ORDER BY c DESC, dst LIMIT 10),
        |e AS (SELECT e0.src, e0.dst FROM e0 JOIN topd USING (dst)),
        |$hitsIterSql""".stripMargin,
    // q297: Dawid–Skene from merged pattern state — the pattern-count
    // histogram is the EM's sufficient statistic, so the split→merge→
    // refit path must reproduce q287's full-corpus parameters EXACTLY;
    // the oracle IS q287's SQL.
    "q297_ds_state" -> dawidSkeneParamsSql,
    // q299: vocabulary growth — token first-occurrence buckets, then
    // a buckets-sized cumsum; type/token in exact truncating ppm.
    "q299_vocab_growth" -> vocabGrowthSql,
    // q308: Nelson-Aalen — q227's recursive-CTE KM table plus one
    // running sum of the integer-ppm hazards (exact summands).
    "q308_nelson_aalen" ->
      """WITH RECURSIVE
        |days AS (SELECT user_id AS u,
        |           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |         FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l FROM days GROUP BY 1),
        |lt AS (SELECT l - f AS t,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |grid AS (SELECT unnest(range(0, (SELECT max(t) FROM lt) + 1))
        |           AS t),
        |km AS (SELECT g.t,
        |         (SELECT count(*) FROM lt WHERE lt.t >= g.t) AS n_risk,
        |         (SELECT count(*) FROM lt WHERE lt.t = g.t
        |            AND dead = 1) AS n_dead,
        |         (SELECT count(*) FROM lt WHERE lt.t = g.t
        |            AND dead = 0) AS n_censored
        |       FROM grid g),
        |s AS (SELECT CAST(-1 AS BIGINT) AS t,
        |             CAST(1000000 AS HUGEINT) AS surv
        |      UNION ALL
        |      SELECT km.t, s.surv * (km.n_risk - km.n_dead) // km.n_risk
        |      FROM s JOIN km ON km.t = s.t + 1),
        |rows_out AS (SELECT km.t, CAST(km.n_risk AS BIGINT) AS n_risk,
        |       CAST(km.n_dead AS BIGINT) AS n_dead,
        |       CAST(km.n_censored AS BIGINT) AS n_censored,
        |       CAST(CAST(km.n_dead AS HUGEINT) * 1000000 // km.n_risk
        |         AS BIGINT) AS hazard_ppm,
        |       CAST(s.surv AS BIGINT) AS survival_ppm
        |FROM km JOIN s USING (t))
        |SELECT *, CAST(sum(hazard_ppm) OVER (ORDER BY t ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumhaz_ppm
        |FROM rows_out ORDER BY t""".stripMargin,
    // q307: the vocab state/merge seam — parity halves' (token → min
    // id) maps merged, curve rebuilt from state; must equal q299's
    // one-pass SQL (first-occurrence min is associative).
    "q307_vocab_state" -> vocabGrowthSql,
    // q300: U-shaped attribution — segment at each conversion (a touch
    // credits the NEXT purchase), 30-day lookback in epoch micros,
    // exact-ppm position credits (1e6 / 500000+500000 / 400000 ends +
    // 200000 // (n-2) middles), one // 1e6 after the product sum.
    "q300_positional_attribution" ->
      """WITH base AS (SELECT user_id AS u, epoch_us(ts) AS t,
        |    event_id AS tk, event_type AS et, value,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
        |touches AS (SELECT u, cc AS seg, t AS touch_t, tk AS touch_tk,
        |    et AS channel FROM base WHERE et <> 'purchase'),
        |convs AS (SELECT u, cc - 1 AS seg, t AS conv_t,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM base WHERE et = 'purchase'),
        |cr AS (SELECT channel, value_cents,
        |    CAST(row_number() OVER w2 AS BIGINT) AS pos,
        |    count(*) OVER (PARTITION BY u, seg) AS n
        |  FROM touches JOIN convs USING (u, seg)
        |  WHERE touch_t >= conv_t - 2592000000000
        |  WINDOW w2 AS (PARTITION BY u, seg ORDER BY touch_t, touch_tk)),
        |cd AS (SELECT channel, value_cents,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN pos = 1 OR pos = n THEN 400000
        |         ELSE 200000 // (n - 2) END AS credit
        |  FROM cr)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(credit) AS BIGINT) AS credit_ppm,
        |  CAST(sum(CAST(value_cents AS HUGEINT) * credit) // 1000000
        |    AS BIGINT) AS attributed_cents
        |FROM cd GROUP BY 1 ORDER BY channel""".stripMargin,
    // q301: RMST per arm — q227's KM recurrence keyed by arm in ONE
    // recursive CTE (flat carry past the last lifetime via CASE),
    // step-integrated over the 30-day grid; all-integer to the edge.
    "q301_rmst" ->
      """WITH RECURSIVE
        |days AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(user_id % 2 AS INT) AS g FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l, max(g) AS g
        |      FROM days GROUP BY 1),
        |lt AS (SELECT g, l - f AS t,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |arms AS (SELECT DISTINCT g FROM lt),
        |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n_users
        |        FROM lt GROUP BY 1),
        |grid AS (SELECT arms.g, CAST(gs.t AS BIGINT) AS t
        |         FROM arms, LATERAL unnest(range(0, 30)) gs(t)),
        |km AS (SELECT grid.g, grid.t,
        |    (SELECT count(*) FROM lt
        |     WHERE lt.g = grid.g AND lt.t >= grid.t) AS n_risk,
        |    (SELECT count(*) FROM lt
        |     WHERE lt.g = grid.g AND lt.t = grid.t AND dead = 1)
        |      AS n_dead
        |  FROM grid),
        |s AS (SELECT g, CAST(-1 AS BIGINT) AS t,
        |        CAST(1000000 AS HUGEINT) AS surv FROM arms
        |      UNION ALL
        |      SELECT km.g, km.t,
        |        CASE WHEN km.n_risk > 0
        |          THEN s.surv * (km.n_risk - km.n_dead) // km.n_risk
        |          ELSE s.surv END
        |      FROM s JOIN km ON km.g = s.g AND km.t = s.t + 1)
        |SELECT s.g AS arm, tot.n_users,
        |  CAST(30 AS BIGINT) AS horizon_days,
        |  CAST(sum(s.surv) AS BIGINT) AS rmst_ppm_days,
        |  CAST(max(CASE WHEN s.t = 29 THEN s.surv END) AS BIGINT)
        |    AS final_surv_ppm
        |FROM s JOIN tot ON tot.g = s.g
        |WHERE s.t >= 0
        |GROUP BY 1, 2 ORDER BY arm""".stripMargin,
    // q302: ranked-retrieval metrics — exact cosine top-10 (q42's
    // score idiom) for the FIXED query set (every 25th id < 2000 —
    // corpus-invariant), binary label relevance, MRR/nDCG/precision
    // with the LITERAL discount table; per-query ppm then
    // integer-averaged.
    "q302_ranking_metrics" ->
      s"""WITH base AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qs AS (SELECT vec_id AS qid, label AS qlab, v AS qv
        |       FROM base WHERE vec_id % 25 = 0 AND vec_id < 2000),
        |lc AS (SELECT label AS qlab, count(*) AS n_lab
        |       FROM base GROUP BY 1),
        |scored AS (SELECT qid, qlab,
        |    CASE WHEN e.label = qlab THEN 1 ELSE 0 END AS rel,
        |    round(list_dot_product(e.v, qv)
        |      / (sqrt(list_dot_product(e.v, e.v))
        |         * sqrt(list_dot_product(qv, qv))), 4) AS cos,
        |    e.vec_id AS nid
        |  FROM base e, qs WHERE e.vec_id <> qid),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY qid ORDER BY cos DESC, nid) AS INTEGER)
        |        AS rnk FROM scored),
        |pq AS (SELECT qid, qlab,
        |    sum(rel * [1000000, 630930, 500000, 430677, 386853,
        |      356207, 333333, 315465, 301030, 289065][rnk]) AS dcg,
        |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
        |    sum(rel) AS n_rel_k
        |  FROM r WHERE rnk <= 10 GROUP BY 1, 2),
        |pm AS (SELECT qid,
        |    coalesce(CAST(dcg AS HUGEINT) * 1000000 // nullif(
        |      CASE WHEN n_lab - 1 <= 0 THEN 0 ELSE
        |        [1000000, 1630930, 2130930, 2561607, 2948460,
        |         3304667, 3638000, 3953465, 4254495, 4543560]
        |        [least(n_lab - 1, 10)] END, 0), 0) AS ndcg_ppm,
        |    coalesce(1000000 // first_rel, 0) AS rr_ppm,
        |    n_rel_k * 1000000 // 10 AS prec_ppm
        |  FROM pq JOIN lc USING (qlab))
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(ndcg_ppm) // nullif(count(*), 0) AS BIGINT)
        |    AS mean_ndcg_ppm,
        |  CAST(sum(rr_ppm) // nullif(count(*), 0) AS BIGINT)
        |    AS mrr_ppm,
        |  CAST(sum(prec_ppm) // nullif(count(*), 0) AS BIGINT)
        |    AS mean_prec_ppm
        |FROM pm""".stripMargin,
    // q303: Poisson bootstrap — digest-batched md5 draws (replicate r
    // reads 32-bit word r mod 4 of md5(id:":":(r div 4)); 25 digests
    // per row for B=100) through the literal cumulative-Poisson(1)
    // table, replicate means in exact truncating cents, CI by
    // (mean, r) rank 3 / 98.
    "q303_bootstrap_ci" ->
      """WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |reps AS (SELECT v, g.g * 4 + j.j AS r,
        |    list_reduce(
        |      [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |       for c in string_split(
        |         substr(md5(id || ':' || CAST(g.g AS VARCHAR)),
        |           1 + 8 * j.j, 8), '')],
        |      (a, b) -> a * 16 + b) % 1000000 AS u
        |  FROM base, LATERAL unnest(range(0, 25)) g(g),
        |       LATERAL unnest(range(0, 4)) j(j)),
        |wts AS (SELECT r, v,
        |    len(list_filter([367879, 735759, 919699, 981012, 996340,
        |      999406, 999917, 999990, 999999], t -> u >= t)) AS w
        |  FROM reps),
        |means AS (SELECT r,
        |    CAST(sum(w * v) // nullif(sum(w), 0) AS BIGINT) AS m
        |  FROM wts GROUP BY 1),
        |ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rk
        |  FROM means WHERE m IS NOT NULL),
        |fullagg AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(v) // nullif(count(*), 0) AS BIGINT) AS mean_cents
        |  FROM base)
        |SELECT n_rows, CAST(100 AS BIGINT) AS b, mean_cents,
        |  (SELECT m FROM ranked WHERE rk = 3) AS lo_cents,
        |  (SELECT m FROM ranked WHERE rk = 98) AS hi_cents
        |FROM fullagg""".stripMargin,
    // q304: Dunning G2 keyness, FULL 4-cell form (round 14) — term
    // counts vs token masses over the whole 2x2 table (term cells
    // divide by R, complement cells by N-R), each of the four ln's
    // nano-rounded (q233's convention), sign test and everything
    // after exact integer; top 25 by (g2 DESC, term).
    "q304_keyness" ->
      """WITH toks AS (SELECT
        |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS f,
        |    unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tk AS (SELECT f, t FROM toks WHERE t <> ''),
        |counts AS (SELECT t,
        |    CAST(sum(f) AS BIGINT) AS o_a,
        |    CAST(sum(1 - f) AS BIGINT) AS o_b
        |  FROM tk GROUP BY 1 HAVING sum(f) + sum(1 - f) >= 5),
        |tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_a,
        |    CAST(sum(1 - f) AS BIGINT) AS n_b FROM tk),
        |g AS (SELECT t AS term, o_a, o_b,
        |    CASE WHEN CAST(o_a AS HUGEINT) * (n_a + n_b) >
        |      CAST(o_a + o_b AS HUGEINT) * n_a THEN 1 ELSE 0 END
        |      AS over_in_focus,
        |    2 * (o_a * (CASE WHEN o_a > 0 THEN
        |        CAST(round(ln(CAST(o_a AS DOUBLE) * (n_a + n_b) /
        |          (CAST(n_a AS DOUBLE) * (o_a + o_b))) * 1e9, 0)
        |          AS BIGINT) ELSE 0 END)
        |      + o_b * (CASE WHEN o_b > 0 THEN
        |        CAST(round(ln(CAST(o_b AS DOUBLE) * (n_a + n_b) /
        |          (CAST(n_b AS DOUBLE) * (o_a + o_b))) * 1e9, 0)
        |          AS BIGINT) ELSE 0 END)
        |      + (n_a - o_a) * (CASE WHEN n_a - o_a > 0 THEN
        |        CAST(round(ln(CAST(n_a - o_a AS DOUBLE) * (n_a + n_b) /
        |          (CAST(n_a AS DOUBLE) * (n_a + n_b - o_a - o_b)))
        |          * 1e9, 0) AS BIGINT) ELSE 0 END)
        |      + (n_b - o_b) * (CASE WHEN n_b - o_b > 0 THEN
        |        CAST(round(ln(CAST(n_b - o_b AS DOUBLE) * (n_a + n_b) /
        |          (CAST(n_b AS DOUBLE) * (n_a + n_b - o_a - o_b)))
        |          * 1e9, 0) AS BIGINT) ELSE 0 END)) AS g2_nano
        |  FROM counts, tot)
        |SELECT term, o_a, o_b, over_in_focus,
        |  CAST(g2_nano AS BIGINT) AS g2_nano
        |FROM g ORDER BY g2_nano DESC, term LIMIT 25""".stripMargin,
    // q305: multi-class Dawid-Skene — the generated 3-class CTE chain
    // mirroring Labeling.dawidSkeneMulti term by term (see
    // dawidSkeneMultiSql).
    "q305_ds_multiclass" -> dawidSkeneMultiSql,
    // q298: DEDUP-FIRST label propagation — exact-text collapse to a
    // min-id rep, q250's J ≥ 0.5 edge CTE over the DISTINCT corpus,
    // 3 unrolled deterministic LPA rounds (count DESC, label ASC
    // pick), isolated ≥2-copy families as their own rep-labeled
    // community, then re-expansion to every doc via the dup mapping
    // (n_members counts expanded docs).
    "q298_lpa_communities" ->
      s"""WITH dd AS (SELECT text, min(doc_id) AS keep_id,
        |             count(*) AS n_copies
        |           FROM documents GROUP BY 1),
        |mp AS (SELECT d.doc_id, dd.keep_id FROM documents d
        |       JOIN dd USING (text)),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT keep_id AS doc_id,
        |          string_split(text, ' ') AS toks
        |        FROM dd)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM inter
        |      JOIN sizes sa ON doc_a = sa.doc_id
        |      JOIN sizes sb ON doc_b = sb.doc_id
        |      WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5),
        |nb AS MATERIALIZED (SELECT a AS v, b AS u FROM e0
        |      UNION ALL SELECT b, a FROM e0),
        |l0 AS (SELECT DISTINCT v AS node, v AS lbl FROM nb),
        |${(1 to 3).map(lpaRound).mkString(",\n")},
        |repc AS (SELECT node, lbl AS community FROM l3
        |         UNION ALL
        |         SELECT keep_id, keep_id FROM dd
        |         WHERE n_copies >= 2
        |           AND keep_id NOT IN (SELECT node FROM l3)),
        |ex AS MATERIALIZED (SELECT mp.doc_id AS node, repc.community
        |      FROM mp JOIN repc ON mp.keep_id = repc.node)
        |SELECT ex.node, ex.community, sz.n_members
        |FROM ex JOIN (SELECT community, CAST(count(*) AS BIGINT)
        |                AS n_members FROM ex GROUP BY 1) sz
        |  USING (community)
        |ORDER BY node""".stripMargin,
    // q309: IVF-pruned ranking metrics — the q167 trained-quantizer
    // probe chain (kmeansChainSql: c2 centroids, a3 assignment;
    // nProbe=2, 16 fixed queries) feeding q302's literal-discount
    // metric CTEs over the CANDIDATE set only. Every number replays:
    // quantizer, probe, candidate cosine, and metrics are all
    // deterministic.
    "q309_ivf_ranking" ->
      s"""$kmeansChainSql,
        |lab AS (SELECT vec_id, label FROM embeddings),
        |qs AS (SELECT e.vec_id AS qid, lab.label AS qlab, e.v AS qv
        |       FROM e JOIN lab USING (vec_id) WHERE e.vec_id < 16),
        |lc AS (SELECT label AS qlab, count(*) AS n_lab
        |       FROM embeddings GROUP BY 1),
        |probed AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c2.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_dot_product(c2.c, q.qv)
        |        / (sqrt(list_dot_product(c2.c, c2.c))
        |           * sqrt(list_dot_product(q.qv, q.qv))) DESC,
        |        c2.cid) AS rk
        |    FROM c2, qs q) WHERE rk <= 2),
        |scored AS (SELECT q.qid, q.qlab,
        |    CASE WHEN lab.label = q.qlab THEN 1 ELSE 0 END AS rel,
        |    round(list_dot_product(e.v, q.qv)
        |      / (sqrt(list_dot_product(e.v, e.v))
        |         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos,
        |    e.vec_id AS nid
        |  FROM e JOIN lab USING (vec_id) JOIN a3 USING (vec_id)
        |  JOIN probed p ON a3.cid = p.cid
        |  JOIN qs q ON q.qid = p.qid AND e.vec_id <> q.qid),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY qid ORDER BY cos DESC, nid) AS INTEGER)
        |        AS rnk FROM scored),
        |pq AS (SELECT qid, qlab,
        |    sum(rel * [1000000, 630930, 500000, 430677, 386853,
        |      356207, 333333, 315465, 301030, 289065][rnk]) AS dcg,
        |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
        |    sum(rel) AS n_rel_k
        |  FROM r WHERE rnk <= 10 GROUP BY 1, 2),
        |pm AS (SELECT qid,
        |    coalesce(CAST(dcg AS HUGEINT) * 1000000 // nullif(
        |      CASE WHEN n_lab - 1 <= 0 THEN 0 ELSE
        |        [1000000, 1630930, 2130930, 2561607, 2948460,
        |         3304667, 3638000, 3953465, 4254495, 4543560]
        |        [least(n_lab - 1, 10)] END, 0), 0) AS ndcg_ppm,
        |    coalesce(1000000 // first_rel, 0) AS rr_ppm,
        |    n_rel_k * 1000000 // 10 AS prec_ppm
        |  FROM pq JOIN lc USING (qlab))
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(ndcg_ppm) // nullif(count(*), 0) AS BIGINT)
        |    AS mean_ndcg_ppm,
        |  CAST(sum(rr_ppm) // nullif(count(*), 0) AS BIGINT)
        |    AS mrr_ppm,
        |  CAST(sum(prec_ppm) // nullif(count(*), 0) AS BIGINT)
        |    AS mean_prec_ppm
        |FROM pm""".stripMargin,
    // q332: IVF range search — q309's quantizer/probe chain with a
    // radius filter (rounded cosine >= 0.25) instead of the rank
    // cut; per-query neighbor count + top (cos, nid), empty radius
    // emits (0, NULL, NULL).
    "q332_range_search" ->
      s"""$kmeansChainSql,
        |qs AS (SELECT e.vec_id AS qid, e.v AS qv FROM e
        |       WHERE e.vec_id < 16),
        |probed AS (SELECT qid, cid FROM (
        |    SELECT q.qid, c2.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_dot_product(c2.c, q.qv)
        |        / (sqrt(list_dot_product(c2.c, c2.c))
        |           * sqrt(list_dot_product(q.qv, q.qv))) DESC,
        |        c2.cid) AS rk
        |    FROM c2, qs q) WHERE rk <= 2),
        |scored AS (SELECT q.qid,
        |    round(list_dot_product(e.v, q.qv)
        |      / (sqrt(list_dot_product(e.v, e.v))
        |         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos,
        |    e.vec_id AS nid
        |  FROM e JOIN a3 USING (vec_id)
        |  JOIN probed p ON a3.cid = p.cid
        |  JOIN qs q ON q.qid = p.qid AND e.vec_id <> q.qid),
        |fr AS (SELECT * FROM scored WHERE cos >= 0.25),
        |cnt AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_neighbors
        |        FROM fr GROUP BY 1),
        |rr AS (SELECT qid, cos, nid, row_number() OVER
        |        (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        |       FROM fr)
        |SELECT q.qid, coalesce(cnt.n_neighbors, 0) AS n_neighbors,
        |  r1.cos AS top_cos, r1.nid AS top_id
        |FROM qs q LEFT JOIN cnt USING (qid)
        |LEFT JOIN (SELECT qid, cos, nid FROM rr WHERE rk = 1) r1
        |  USING (qid)
        |ORDER BY qid""".stripMargin,
    // q310: Fleming–Harrington G(1,0) — q293's risk chain with each
    // term weighted by the pooled KM ppm at t−1 (q227's recursive
    // recurrence; the s CTE's t=−1 seed gives w(0) = 10⁶). Weighted
    // sums HUGEINT-exact (truncating inner // on non-negatives
    // matches Spark's decimal div); z is the one float.
    "q310_fh_logrank" ->
      """WITH RECURSIVE
        |days AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(user_id % 2 AS INT) AS g FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l, max(g) AS g
        |      FROM days GROUP BY 1),
        |lt AS (SELECT l - f AS t, g,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |h AS (SELECT t,
        |    sum(CASE WHEN g = 1 THEN dead ELSE 0 END) AS d1,
        |    sum(CASE WHEN g = 1 THEN 1 - dead ELSE 0 END) AS c1,
        |    sum(CASE WHEN g <> 1 THEN dead ELSE 0 END) AS d0,
        |    sum(CASE WHEN g <> 1 THEN 1 - dead ELSE 0 END) AS c0
        |  FROM lt GROUP BY 1),
        |r AS (SELECT t, d1, d0,
        |    sum(d1 + c1) OVER (ORDER BY t DESC ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
        |    sum(d0 + c0) OVER (ORDER BY t DESC ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS n0
        |  FROM h),
        |grid AS (SELECT unnest(range(0, (SELECT max(t) FROM lt) + 1))
        |           AS t),
        |km AS (SELECT g.t,
        |         (SELECT count(*) FROM lt WHERE lt.t >= g.t) AS n_risk,
        |         (SELECT count(*) FROM lt WHERE lt.t = g.t
        |            AND dead = 1) AS n_dead
        |       FROM grid g),
        |s AS (SELECT CAST(-1 AS BIGINT) AS t,
        |             CAST(1000000 AS HUGEINT) AS surv
        |      UNION ALL
        |      SELECT km.t, s.surv * (km.n_risk - km.n_dead) // km.n_risk
        |      FROM s JOIN km ON km.t = s.t + 1),
        |wt AS (SELECT s.t + 1 AS t, s.surv AS w FROM s),
        |c AS (SELECT r.t, d1, d0 + d1 AS dd, n0 + n1 AS nn, n1, n0,
        |        wt.w
        |      FROM r JOIN wt USING (t)
        |      WHERE d0 + d1 > 0 AND n0 + n1 >= 2),
        |mo AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    sum(w * d1 * 1000000) AS wo1,
        |    sum(w * (CAST(dd AS HUGEINT) * n1 * 1000000 // nn))
        |      AS we1,
        |    sum(w * w * (CAST(dd AS HUGEINT) * n1 * n0 * (nn - dd)
        |        * 1000000000000
        |        // (CAST(nn AS HUGEINT) * nn * (nn - 1)))) AS wv
        |  FROM c),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN g <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0_users,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1_users
        |  FROM lt)
        |SELECT n0_users, n1_users, o1,
        |  CAST(wo1 // 1000000 AS BIGINT) AS wo1_micro,
        |  CAST(we1 // 1000000 AS BIGINT) AS we1_micro,
        |  CASE WHEN wv > 0 THEN
        |    CAST(wo1 - we1 AS DOUBLE) / sqrt(CAST(wv AS DOUBLE)) END
        |    AS z
        |FROM mo, tot""".stripMargin,
    // q311: the survival span-state seam — day-parity batches reduce
    // to per-user span states, merge by (min f, max l), and the
    // state readout must equal q227's one-pass KM curve over the
    // full log (shared SQL constant — the q290/q306 seam convention).
    "q311_survival_state" -> survivalCurveSql,
    // q324: per-arm Nelson–Aalen + cumhaz ratio — q293's per-day arm
    // table, per-arm hazards over OWN risk sets, two running sums,
    // one truncating ratio per day.
    "q324_hazard_ratio" ->
      """WITH days AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(user_id % 2 AS INT) AS g FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l, max(g) AS g
        |      FROM days GROUP BY 1),
        |lt AS (SELECT l - f AS t, g,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |h AS (SELECT t,
        |    sum(CASE WHEN g = 1 THEN dead ELSE 0 END) AS d1,
        |    sum(CASE WHEN g = 1 THEN 1 - dead ELSE 0 END) AS c1,
        |    sum(CASE WHEN g <> 1 THEN dead ELSE 0 END) AS d0,
        |    sum(CASE WHEN g <> 1 THEN 1 - dead ELSE 0 END) AS c0
        |  FROM lt GROUP BY 1),
        |r AS (SELECT t, d1, d0,
        |    sum(d1 + c1) OVER (ORDER BY t DESC ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
        |    sum(d0 + c0) OVER (ORDER BY t DESC ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS n0
        |  FROM h),
        |x AS (SELECT t, n0, n1, d0, d1,
        |    CASE WHEN n1 > 0 THEN d1 * 1000000 // n1 ELSE 0 END AS h1,
        |    CASE WHEN n0 > 0 THEN d0 * 1000000 // n0 ELSE 0 END AS h0
        |  FROM r),
        |c AS (SELECT t, n0, n1, d0, d1,
        |    CAST(sum(h0) OVER wa AS BIGINT) AS cumhaz0_ppm,
        |    CAST(sum(h1) OVER wa AS BIGINT) AS cumhaz1_ppm
        |  FROM x WINDOW wa AS (ORDER BY t ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT t, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(d0 AS BIGINT) AS d0, CAST(d1 AS BIGINT) AS d1,
        |  cumhaz0_ppm, cumhaz1_ppm,
        |  CAST(cumhaz1_ppm * 1000000 // nullif(cumhaz0_ppm, 0)
        |    AS BIGINT) AS hr_ppm
        |FROM c ORDER BY t""".stripMargin,
    // q325: rolling quantile from the per-day KLL sketch state — the
    // oracle replays the exact window value counts and pins the ±3ε
    // rank-envelope flag ≡ 1 (the q191/q196 sketch-oracle pattern;
    // the KLL estimate itself is engine-internal and randomized).
    "q325_rolling_quantile_state" ->
      """WITH a AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |days AS (SELECT DISTINCT d AS end_day FROM a)
        |SELECT days.end_day, CAST(count(*) AS BIGINT) AS n_window,
        |  CAST(1 AS INTEGER) AS within_bound
        |FROM a JOIN days ON a.d >= days.end_day - 6
        |               AND a.d <= days.end_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q326: two-round refined HITS authorities — closed-form
    // 2-iteration chain (a1 = normalized indeg, h1 = normalized full
    // out-sum, a2 exact over the 40-candidate pool), every div the
    // same truncating 10^6 normalization as q296; no recursion.
    "q326_hits_refined" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS src,
        |    l_suppkey + 1000000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |indeg AS (SELECT dst AS node, CAST(count(*) AS HUGEINT) AS c
        |  FROM e GROUP BY 1),
        |a1 AS (SELECT node,
        |    c * 1000000 // nullif((SELECT max(c) FROM indeg), 0) AS a
        |  FROM indeg),
        |h1r AS (SELECT e.src, sum(a1.a) AS s
        |  FROM e JOIN a1 ON e.dst = a1.node GROUP BY 1),
        |h1 AS (SELECT src,
        |    s * 1000000 // nullif((SELECT max(s) FROM h1r), 0) AS h
        |  FROM h1r),
        |cand AS (SELECT node FROM indeg
        |  ORDER BY c DESC, node LIMIT 40),
        |a2r AS (SELECT e.dst AS node, sum(h1.h) AS s
        |  FROM e JOIN cand ON e.dst = cand.node
        |  JOIN h1 ON e.src = h1.src GROUP BY 1)
        |SELECT node,
        |  CAST(s * 1000000 // nullif((SELECT max(s) FROM a2r), 0)
        |    AS BIGINT) AS authority_micro
        |FROM a2r ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin,
    // q327: Matthews correlation — exact HUGEINT confusion products,
    // ONE mirrored float chain (num / sqrt(marginal product)),
    // rounded micro; NULL on any empty marginal.
    "q327_mcc" ->
      """WITH c AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN p = 1 AND y = 1 THEN 1 END)
        |      AS BIGINT) AS tp,
        |    CAST(count(CASE WHEN p = 1 AND y = 0 THEN 1 END)
        |      AS BIGINT) AS fp,
        |    CAST(count(CASE WHEN p = 0 AND y = 1 THEN 1 END)
        |      AS BIGINT) AS fn,
        |    CAST(count(CASE WHEN p = 0 AND y = 0 THEN 1 END)
        |      AS BIGINT) AS tn
        |  FROM (SELECT CAST(n_chars >= 300 AS INTEGER) AS p,
        |          CAST(lang = 'en' AS INTEGER) AS y FROM documents
        |        WHERE n_chars IS NOT NULL AND lang IS NOT NULL))
        |SELECT n, tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
        |      AND tn + fn > 0
        |  THEN CAST(round(CAST(CAST(tp AS HUGEINT) * tn
        |      - CAST(fp AS HUGEINT) * fn AS DOUBLE)
        |    / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
        |        * (tn + fp) * (tn + fn) AS DOUBLE))
        |    * 1000000, 0) AS BIGINT) END AS mcc_micro
        |FROM c""".stripMargin,
    // q328: Cramér's V — q243's exact chi2_nano chain + one mirrored
    // sqrt chain onto [0,1] micro.
    "q328_cramers_v" ->
      """WITH c AS (SELECT lang AS a, source AS b,
        |             CAST(count(*) AS BIGINT) AS nab
        |           FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL
        |           GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na
        |       FROM c GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb
        |       FROM c GROUP BY 1),
        |tt AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM c),
        |la AS (SELECT CAST(count(*) AS BIGINT) AS n_a_levels FROM ma),
        |lb AS (SELECT CAST(count(*) AS BIGINT) AS n_b_levels FROM mb),
        |grid AS (SELECT ma.a, mb.b, ma.na, mb.nb,
        |           coalesce(c.nab, 0) AS nab
        |         FROM ma CROSS JOIN mb LEFT JOIN c USING (a, b)),
        |x AS (SELECT CAST(sum(CAST(round(
        |         (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * nb / n)
        |         * (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * nb / n)
        |         / (CAST(na AS DOUBLE) * nb / n) * 1e9, 0) AS BIGINT))
        |         AS BIGINT) AS chi2_nano
        |      FROM grid, tt)
        |SELECT tt.n, la.n_a_levels, lb.n_b_levels, x.chi2_nano,
        |  CASE WHEN tt.n > 0 AND least(la.n_a_levels, lb.n_b_levels) > 1
        |  THEN CAST(round(sqrt(CAST(x.chi2_nano AS DOUBLE) / 1e9
        |    / (CAST(tt.n AS DOUBLE)
        |       * (least(la.n_a_levels, lb.n_b_levels) - 1)))
        |    * 1000000, 0) AS BIGINT) END AS v_micro
        |FROM tt, la, lb, x""".stripMargin,
    // q329: variance ratio VR(5) — two calendar-bounded increment
    // populations, exact HUGEINT sufficient sums, one mirrored float
    // chain; NULL when Var1 = 0 (exact integer test).
    "q329_variance_ratio" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n_1,
        |    sum(CAST(b.c - a.c AS HUGEINT)) AS sx_1,
        |    sum(CAST(b.c - a.c AS HUGEINT) * (b.c - a.c)) AS sxx_1
        |  FROM daily a JOIN daily b ON b.d = a.d + 1),
        |sq AS (SELECT CAST(count(*) AS BIGINT) AS n_q,
        |    sum(CAST(b.c - a.c AS HUGEINT)) AS sx_q,
        |    sum(CAST(b.c - a.c AS HUGEINT) * (b.c - a.c)) AS sxx_q
        |  FROM daily a JOIN daily b ON b.d = a.d + 5)
        |SELECT n_1, n_q,
        |  CASE WHEN n_1 > 0 AND n_q > 0
        |      AND CAST(n_1 AS HUGEINT) * sxx_1 - sx_1 * sx_1 <> 0
        |  THEN CAST(round(
        |    CAST(CAST(n_q AS HUGEINT) * sxx_q - sx_q * sx_q AS DOUBLE)
        |      / CAST(n_q AS DOUBLE) / CAST(n_q AS DOUBLE) / 5
        |    / (CAST(CAST(n_1 AS HUGEINT) * sxx_1 - sx_1 * sx_1
        |         AS DOUBLE)
        |       / CAST(n_1 AS DOUBLE) / CAST(n_1 AS DOUBLE))
        |    * 1000000, 0) AS BIGINT) END AS vr_micro
        |FROM s1, sq""".stripMargin,
    // q330: per-node local clustering over the DEDUP-FIRST near-dup
    // graph (q298's collapse: exact-text families → min-id rep; the
    // raw graph's R-clique wedge frame spilled past disk at 100x) —
    // triangle corners exploded from the a<b<c enumeration, exact
    // integer ppm, total-ordered top-25.
    "q330_local_clustering" ->
      """WITH dd AS (SELECT text, min(doc_id) AS keep_id
        |           FROM documents GROUP BY 1),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT keep_id AS doc_id,
        |          string_split(text, ' ') AS toks
        |        FROM dd)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM inter
        |      JOIN sizes sa ON doc_a = sa.doc_id
        |      JOIN sizes sb ON doc_b = sb.doc_id
        |      WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
        |          (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT unnest([x, y, z]) AS n FROM tri),
        |tc AS (SELECT n, CAST(count(*) AS BIGINT) AS t
        |       FROM corners GROUP BY 1)
        |SELECT d.n AS node, coalesce(tc.t, 0) AS n_triangles, d.deg,
        |  CAST(CAST(coalesce(tc.t, 0) AS HUGEINT) * 2000000
        |    // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS BIGINT)
        |    AS cc_ppm
        |FROM deg d LEFT JOIN tc ON tc.n = d.n
        |WHERE d.deg >= 2
        |ORDER BY cc_ppm DESC, deg DESC, node LIMIT 25""".stripMargin,
    // q331: Heaps exponent — q299's curve CTEs + nano-ln OLS in
    // HUGEINT (the q315 float convention).
    "q331_heaps_exponent" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |pd AS (SELECT least(9, doc_id * 10 // (mx + 1)) AS bucket,
        |         len(list_filter(string_split(text, ' '),
        |           t -> t <> '')) AS n_tok
        |       FROM documents, mx),
        |pb AS (SELECT bucket, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |       FROM pd GROUP BY 1),
        |fs AS (SELECT t, min(doc_id) AS fid FROM (
        |         SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |         FROM documents)
        |       WHERE t <> '' GROUP BY 1),
        |nt AS (SELECT least(9, fid * 10 // (mx + 1)) AS bucket,
        |         CAST(count(*) AS BIGINT) AS n_new_types
        |       FROM fs, mx GROUP BY 1),
        |cur AS (SELECT pb.bucket,
        |          sum(coalesce(nt.n_new_types, 0)) OVER w
        |            AS vocab_size,
        |          sum(pb.n_tokens) OVER w AS tokens_cum
        |        FROM pb LEFT JOIN nt USING (bucket)
        |        WINDOW w AS (ORDER BY pb.bucket ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pts AS (SELECT CAST(vocab_size AS BIGINT) AS v,
        |    CAST(tokens_cum AS BIGINT) AS tk,
        |    CAST(round(ln(CAST(tokens_cum AS DOUBLE)) * 1e9, 0)
        |      AS BIGINT) AS x,
        |    CAST(round(ln(CAST(vocab_size AS DOUBLE)) * 1e9, 0)
        |      AS BIGINT) AS y
        |  FROM cur WHERE tokens_cum > 0 AND vocab_size > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(max(tk) AS BIGINT) AS total_tokens,
        |  CAST(max(v) AS BIGINT) AS total_vocab,
        |  CAST((CAST(count(*) AS HUGEINT)
        |      * sum(CAST(x AS HUGEINT) * y)
        |      - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)))
        |    * 1000000
        |    // nullif(CAST(count(*) AS HUGEINT)
        |      * sum(CAST(x AS HUGEINT) * x)
        |      - sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)), 0)
        |    AS BIGINT) AS beta_micro
        |FROM pts""".stripMargin,
    // q333: Youden's J — q258's ROC chain, argmax of the integer-ppm
    // J with ties to the lowest threshold.
    "q333_youden_threshold" ->
      """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS s,
        |    CAST(lang = 'en' AS INTEGER) AS y
        |  FROM documents WHERE n_chars IS NOT NULL),
        |vals AS (SELECT s,
        |    CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS cp,
        |    CAST(count(CASE WHEN y = 0 THEN 1 END) AS BIGINT) AS cn
        |  FROM base GROUP BY 1),
        |c AS (SELECT s, cp, cn,
        |        sum(cp) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cum_p,
        |        sum(cn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cum_n,
        |        sum(cp) OVER () AS n_pos, sum(cn) OVER () AS n_neg
        |      FROM vals),
        |t AS (SELECT s AS threshold,
        |        CAST(n_pos - cum_p + cp AS BIGINT) AS tp,
        |        CAST(n_neg - cum_n + cn AS BIGINT) AS fp,
        |        CAST(n_pos AS BIGINT) AS n_pos,
        |        CAST(n_neg AS BIGINT) AS n_neg
        |      FROM c),
        |j AS (SELECT threshold, tp, fp,
        |       CAST(CAST(tp AS HUGEINT) * 1000000 // n_pos AS BIGINT)
        |         AS tpr_ppm,
        |       CAST(CAST(fp AS HUGEINT) * 1000000 // n_neg AS BIGINT)
        |         AS fpr_ppm
        |      FROM t)
        |SELECT threshold, tp, fp, tpr_ppm, fpr_ppm,
        |  tpr_ppm - fpr_ppm AS j_ppm
        |FROM j ORDER BY j_ppm DESC, threshold LIMIT 1""".stripMargin,
    // q334: perceptual aHash clusters — 16-byte frames (the q323
    // ascii==byte identity), one bit per byte by exact
    // cross-multiplied mean compare, hash-keyed groups, top 25.
    "q334_ahash_clusters" ->
      """WITH f AS (SELECT doc_id, CAST(t.fo AS INTEGER) AS frame_no,
        |    substr(text, CAST(t.fo * 16 + 1 AS BIGINT), 16) AS s
        |  FROM documents, LATERAL unnest(range(0,
        |    (len(text) + 15) // 16)) t(fo)),
        |h AS (SELECT doc_id, frame_no, s,
        |    list_sum([CAST(ascii(c) AS BIGINT)
        |      for c in string_split(s, '')]) AS ssum,
        |    CAST(len(s) AS BIGINT) AS nb
        |  FROM f),
        |h2 AS (SELECT doc_id, frame_no,
        |    list_reduce([CASE WHEN CAST(ascii(c) AS BIGINT) * nb
        |        >= ssum THEN '1' ELSE '0' END
        |      for c in string_split(s, '')], (a, b) -> a || b)
        |      AS ahash
        |  FROM h),
        |g AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_frames,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |    min(doc_id * 1000000000 + frame_no) AS k
        |  FROM h2 GROUP BY 1 HAVING count(*) >= 2)
        |SELECT ahash, n_frames, n_docs,
        |  CAST(k // 1000000000 AS BIGINT) AS first_doc,
        |  CAST(k % 1000000000 AS INTEGER) AS first_frame
        |FROM g ORDER BY n_frames DESC, ahash LIMIT 25""".stripMargin,
    // q335: Greenwood band — q308's recursive KM chain + the exact
    // integer-ppb variance accumulation d*1e9 // (n(n-d)), one
    // mirrored sqrt chain per day, integer band over the rounded se.
    "q335_km_band" ->
      """WITH RECURSIVE
        |days AS (SELECT user_id AS u,
        |           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |         FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l FROM days GROUP BY 1),
        |lt AS (SELECT l - f AS t,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |grid AS (SELECT unnest(range(0, (SELECT max(t) FROM lt) + 1))
        |           AS t),
        |km AS (SELECT g.t,
        |         (SELECT count(*) FROM lt WHERE lt.t >= g.t) AS n_risk,
        |         (SELECT count(*) FROM lt WHERE lt.t = g.t
        |            AND dead = 1) AS n_dead
        |       FROM grid g),
        |s AS (SELECT CAST(-1 AS BIGINT) AS t,
        |             CAST(1000000 AS HUGEINT) AS surv
        |      UNION ALL
        |      SELECT km.t, s.surv * (km.n_risk - km.n_dead) // km.n_risk
        |      FROM s JOIN km ON km.t = s.t + 1),
        |rows_out AS (SELECT km.t,
        |       CAST(km.n_risk AS BIGINT) AS n_risk,
        |       CAST(km.n_dead AS BIGINT) AS n_dead,
        |       CAST(s.surv AS BIGINT) AS survival_ppm,
        |       CASE WHEN km.n_risk - km.n_dead > 0 THEN
        |         CAST(CAST(km.n_dead AS HUGEINT) * 1000000000
        |           // (CAST(km.n_risk AS HUGEINT)
        |              * (km.n_risk - km.n_dead)) AS BIGINT)
        |         ELSE 0 END AS g_term_ppb
        |  FROM km JOIN s USING (t)),
        |gg AS (SELECT t, n_risk, n_dead, survival_ppm,
        |    CAST(sum(g_term_ppb) OVER (ORDER BY t ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS g_ppb
        |  FROM rows_out),
        |se AS (SELECT t, n_risk, n_dead, survival_ppm,
        |    CAST(round(CAST(survival_ppm AS DOUBLE)
        |      * sqrt(CAST(g_ppb AS DOUBLE) / 1e9), 0) AS BIGINT)
        |      AS se_ppm
        |  FROM gg)
        |SELECT t, n_risk, n_dead, survival_ppm, se_ppm,
        |  greatest(0, survival_ppm - se_ppm * 1959964 // 1000000)
        |    AS lo_ppm,
        |  least(1000000, survival_ppm + se_ppm * 1959964 // 1000000)
        |    AS hi_ppm
        |FROM se ORDER BY t""".stripMargin,
    // q336: 2-D skyline (maximize richness AND type-token density) —
    // per-x best (max y, min id among attainers), frontier via the
    // strict-predecessor running max over x DESC.
    "q336_skyline" ->
      """WITH dtok AS (SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS tot,
        |    len(list_distinct(list_filter(string_split(text, ' '),
        |      t -> t <> ''))) AS dv
        |  FROM documents),
        |p AS (SELECT CAST(dv AS BIGINT) AS x,
        |    CAST(dv * 1000000 // tot AS BIGINT) AS y, doc_id
        |  FROM dtok WHERE tot > 0),
        |g AS (SELECT x, max(y) AS y FROM p GROUP BY 1),
        |g2 AS (SELECT p.x, p.y, CAST(min(p.doc_id) AS BIGINT)
        |         AS first_id
        |       FROM p JOIN g ON p.x = g.x AND p.y = g.y GROUP BY 1, 2),
        |f AS (SELECT x, y, first_id,
        |    max(y) OVER (ORDER BY x DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING) AS pm
        |  FROM g2)
        |SELECT x, y, first_id FROM f
        |WHERE pm IS NULL OR y > pm ORDER BY x DESC""".stripMargin,
    // q337: edge embeddedness bridge screen — q330's dedup-first
    // graph, per-edge triangle counts from the a<b<c enumeration's
    // three edges, most-suspect-first total order.
    "q337_bridge_edges" ->
      """WITH dd AS (SELECT text, min(doc_id) AS keep_id
        |           FROM documents GROUP BY 1),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS shingle
        |  FROM (SELECT keep_id AS doc_id,
        |          string_split(text, ' ') AS toks
        |        FROM dd)
        |  WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            count(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |                              AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM inter
        |      JOIN sizes sa ON doc_a = sa.doc_id
        |      JOIN sizes sb ON doc_b = sb.doc_id
        |      WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
        |          (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |te AS (SELECT unnest([{'a': x, 'b': y}, {'a': x, 'b': z},
        |         {'a': y, 'b': z}], recursive := true) FROM tri),
        |emb AS (SELECT a, b, CAST(count(*) AS BIGINT) AS t
        |        FROM te GROUP BY 1, 2)
        |SELECT e.a, e.b, coalesce(emb.t, 0) AS embeddedness,
        |  da.deg AS deg_a, db.deg AS deg_b
        |FROM e LEFT JOIN emb ON e.a = emb.a AND e.b = emb.b
        |JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b
        |ORDER BY embeddedness, da.deg + db.deg DESC, e.a, e.b
        |LIMIT 25""".stripMargin,
    // q338: MAD — two chained exact-median picks (k = ceil(0.5*n),
    // the q180 contract), second over |v - median|; all integer.
    "q338_mad" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |             AS v
        |           FROM orders WHERE o_totalprice IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
        |med AS (SELECT r.v AS m FROM r, n
        |        WHERE r.rk = CAST(ceil(0.5 * n.n) AS BIGINT)),
        |d AS (SELECT abs(v.v - med.m) AS v FROM v, med),
        |r2 AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM d)
        |SELECT n.n, med.m AS median, r2.v AS mad
        |FROM r2, n, med
        |WHERE r2.rk = CAST(ceil(0.5 * n.n) AS BIGINT)""".stripMargin,
    // q339: Tukey fences per event type — exact quartiles at
    // k = ceil(q*n) (the q220 contract), doubled-integer fences
    // 2v < 5q1-3q3 / 2v > 5q3-3q1, exact outlier counts.
    "q339_tukey_outliers" ->
      """WITH m AS (SELECT event_type AS g,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events
        |           WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |      FROM m GROUP BY 1),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |      FROM m),
        |qq AS (SELECT n.g,
        |    max(CASE WHEN r.rk = CAST(ceil(0.25 * n.n) AS BIGINT)
        |      THEN r.v END) AS q1,
        |    max(CASE WHEN r.rk = CAST(ceil(0.75 * n.n) AS BIGINT)
        |      THEN r.v END) AS q3
        |  FROM n JOIN r ON r.g = n.g GROUP BY 1)
        |SELECT m.g AS "group", CAST(count(*) AS BIGINT) AS n,
        |  max(qq.q1) AS q1, max(qq.q3) AS q3,
        |  CAST(sum(CASE WHEN m.v * 2 < qq.q1 * 5 - qq.q3 * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN m.v * 2 > qq.q3 * 5 - qq.q1 * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM m JOIN qq ON m.g = qq.g
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q340: per-key rolling p99 from the (event_type, day) KLL state —
    // the q325 sketch-oracle convention at key grain: exact window
    // counts replay; the randomized p99 estimate is guarded by the
    // in-query ±3ε envelope, pinned ≡ 1.
    "q340_rolling_quantile_by_key" ->
      """WITH a AS (SELECT CAST(event_type AS VARCHAR) AS key,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL
        |    AND ts IS NOT NULL AND value IS NOT NULL),
        |days AS (SELECT DISTINCT key, d AS end_day FROM a)
        |SELECT days.key AS event_type, days.end_day,
        |  CAST(count(*) AS BIGINT) AS n_window,
        |  CAST(1 AS INTEGER) AS within_bound
        |FROM a JOIN days ON a.key = days.key
        |  AND a.d >= days.end_day - 6 AND a.d <= days.end_day
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q341: LSH band bill — audit hash i of shingle sh = 32-bit word
    // (i mod 4) of md5(sh:':':(i div 4)) (the q303 hex-slice replay);
    // per-doc minhash signature, band key = (s_{2b}, s_{2b+1}),
    // per-band bucket-shape aggregates. Exact everywhere.
    "q341_lsh_audit" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS sh
        |  FROM docs WHERE len(toks) >= 3),
        |hw AS (SELECT doc_id, g.g * 4 + j.j AS i,
        |    list_reduce([CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
        |      for c in string_split(
        |        substr(md5(sh || ':' || CAST(g.g AS VARCHAR)),
        |          1 + 8 * j.j, 8), '')],
        |      (a, b) -> a * 16 + b) AS h
        |  FROM sh, LATERAL unnest(range(0, 8)) g(g),
        |       LATERAL unnest(range(0, 4)) j(j)),
        |sig AS (SELECT doc_id, i, min(h) AS s FROM hw GROUP BY 1, 2),
        |bk AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
        |    max(CASE WHEN i % 2 = 0 THEN s END) AS k0,
        |    max(CASE WHEN i % 2 = 1 THEN s END) AS k1
        |  FROM sig GROUP BY 1, 2),
        |buckets AS (SELECT band, k0, k1, count(*) AS c
        |  FROM bk GROUP BY 1, 2, 3)
        |SELECT band, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_singletons,
        |  CAST(max(c) AS BIGINT) AS max_bucket,
        |  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pairs_bill
        |FROM buckets GROUP BY 1 ORDER BY 1""".stripMargin,
    // q342: LSH detection curve — exact fixed-point ppm fold
    // (multiply + truncating // 1e6 per power step), mirrored
    // operand-for-operand with the Spark aggregate() chain.
    "q342_lsh_curve" ->
      """WITH g AS (SELECT CAST(i * 25000 AS BIGINT) AS s_ppm
        |  FROM range(1, 41) t(i)),
        |c AS (SELECT s_ppm,
        |    s_ppm * s_ppm // 1000000 AS sr_ppm FROM g),
        |m AS (SELECT s_ppm, sr_ppm, 1000000 - sr_ppm AS miss FROM c),
        |p AS (SELECT s_ppm, sr_ppm,
        |    list_reduce(list_transform(range(0, 16), x -> miss),
        |      (a, b) -> a * b // 1000000) AS mb
        |  FROM m)
        |SELECT s_ppm, CAST(sr_ppm AS BIGINT) AS p_band_ppm,
        |  CAST(1000000 - mb AS BIGINT) AS p_detect_ppm
        |FROM p ORDER BY s_ppm""".stripMargin,
    // q343: average precision — distinct thresholds descending,
    // inclusive running tp/fp, contrib = cp·(tp·1e6 // (tp+fp)),
    // AP_ppm = Σcontrib // n_pos; every div truncating integer.
    "q343_avg_precision" ->
      """WITH base AS (SELECT CAST(n_chars AS BIGINT) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND lang IS NOT NULL),
        |vals AS (SELECT s, sum(y) AS cp, count(*) - sum(y) AS cn
        |  FROM base GROUP BY 1),
        |r AS (SELECT cp, sum(cp) OVER (ORDER BY s DESC) AS tp,
        |    sum(cn) OVER (ORDER BY s DESC) AS fp FROM vals),
        |tot AS (SELECT sum(cp) AS np, sum(cn) AS nn FROM vals)
        |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |  CAST((SELECT sum(CAST(cp AS HUGEINT)
        |          * (tp * 1000000 // (tp + fp))) FROM r)
        |    // nullif(np, 0) AS BIGINT) AS ap_ppm
        |FROM tot""".stripMargin,
    // q344: Brown–Forsythe W on |v − group median| — exact medians
    // at ceil(n/2) (the q338/q339 contract), denominator-cleared
    // HUGEINT algebra, truncating // mirrored with Spark's decimal
    // div.
    "q344_brown_forsythe" ->
      """WITH m AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL
        |    AND value IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |  FROM m GROUP BY 1),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |  FROM m),
        |med AS (SELECT n.g,
        |    max(CASE WHEN r.rk = CAST(ceil(0.5 * n.n) AS BIGINT)
        |      THEN r.v END) AS md
        |  FROM n JOIN r ON r.g = n.g GROUP BY 1),
        |gs AS (SELECT m.g, CAST(count(*) AS HUGEINT) AS ng,
        |    CAST(sum(abs(m.v - med.md)) AS HUGEINT) AS sg,
        |    CAST(sum(CAST(abs(m.v - med.md) AS HUGEINT)
        |      * abs(m.v - med.md)) AS HUGEINT) AS qg
        |  FROM m JOIN med ON m.g = med.g GROUP BY 1),
        |tot AS (SELECT sum(ng) AS nn, CAST(count(*) AS HUGEINT) AS k,
        |    sum(sg) AS s, sum(qg) AS q,
        |    sum(sg * sg // ng) AS sb FROM gs)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST((nn - k) * (sb - s * s // nn) * 1000000
        |    // nullif((k - 1) * (q - sb), 0)
        |    AS BIGINT) AS w_micro
        |FROM tot""".stripMargin,
    // q345: PMI collocations — bigram contingency over the corpus
    // (marginals = bigram-position totals, so rows sum to N
    // exactly); one nano-rounded ln of an exact-integer quotient
    // (< 2^53 both sides), top 25 by (pmi DESC, w1, w2).
    "q345_pmi_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t
        |  FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM toks, LATERAL unnest(range(1, len(t))) p(i)
        |  WHERE len(t) >= 2),
        |bf AS (SELECT w1, w2 FROM bg WHERE w1 <> '' AND w2 <> ''),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        |  FROM bf GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1
        |  FROM c12 GROUP BY 1),
        |c2 AS (SELECT w2, CAST(sum(c) AS BIGINT) AS c2
        |  FROM c12 GROUP BY 1),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c12)
        |SELECT c12.w1, c12.w2, c AS n_pair,
        |  CAST(round(ln(CAST(c * nn AS DOUBLE)
        |    / CAST(c1.c1 * c2.c2 AS DOUBLE)) * 1e9, 0) AS BIGINT)
        |    AS pmi_nano
        |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nt
        |WHERE c >= 5
        |ORDER BY pmi_nano DESC, w1, w2 LIMIT 25""".stripMargin,
    // q346: JSD — every ln argument is an exact-integer quotient
    // (2aB/(aB+bA), both < 2^53 — the q345 convention); only the
    // final sums are float, rounded 6 with 10 orders of margin
    // (q126's drift argument).
    "q346_js_divergence" ->
      """WITH tok AS (SELECT
        |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS f,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE source IS NOT NULL),
        |tw AS (SELECT w, sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS b
        |  FROM tok WHERE w <> '' GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
        |    CAST(sum(b) AS BIGINT) AS tb FROM tw)
        |SELECT ta AS n_tokens_a, tb AS n_tokens_b,
        |  round(
        |    sum(CASE WHEN a > 0 THEN a * ln(CAST(2 * a * tb AS DOUBLE)
        |      / CAST(a * tb + b * ta AS DOUBLE)) ELSE 0 END)
        |      / (2.0 * ta)
        |    + sum(CASE WHEN b > 0 THEN b * ln(CAST(2 * b * ta AS DOUBLE)
        |      / CAST(a * tb + b * ta AS DOUBLE)) ELSE 0 END)
        |      / (2.0 * tb), 6) + 0.0 AS jsd
        |FROM tw CROSS JOIN tot GROUP BY 1, 2""".stripMargin,
    // q347: QQ drift — exact per-period deciles at rank ceil(q*n)
    // (the q338/q220 contract); the q literals are the same double
    // literals the Spark side passes (never d*0.1 — that is a
    // DIFFERENT double from the literal 0.3).
    "q347_quantile_drift" ->
      """WITH m AS (SELECT CASE WHEN o_orderdate
        |      < TIMESTAMP '1997-01-01' THEN 'a' ELSE 'b' END AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderdate IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |  FROM m GROUP BY 1),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |  FROM m),
        |q AS (SELECT * FROM (VALUES (100, 0.1), (200, 0.2), (300, 0.3),
        |    (400, 0.4), (500, 0.5), (600, 0.6), (700, 0.7),
        |    (800, 0.8), (900, 0.9)) t(qpm, qq)),
        |pick AS (SELECT q.qpm, n.g,
        |    max(CASE WHEN r.rk = CAST(ceil(q.qq * n.n) AS BIGINT)
        |      THEN r.v END) AS v
        |  FROM q CROSS JOIN n JOIN r ON r.g = n.g GROUP BY 1, 2)
        |SELECT CAST(qpm AS BIGINT) AS q_permille,
        |  max(CASE WHEN g = 'a' THEN v END) AS v_a,
        |  max(CASE WHEN g = 'b' THEN v END) AS v_b,
        |  max(CASE WHEN g = 'b' THEN v END)
        |    - max(CASE WHEN g = 'a' THEN v END) AS delta
        |FROM pick GROUP BY 1 ORDER BY 1""".stripMargin,
    // q348: Cochran–Armitage — exact integer arm statistics, trend
    // numerator T = N*A2 - R*A1, z^2 via the hypergeometric variance
    // with the big quotient taken FIRST (every // result fits a
    // long — the q344 rail), all HUGEINT.
    "q348_cochran_armitage" ->
      """WITH pu AS (SELECT user_id % 3 AS s, user_id AS u,
        |    max(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |g AS (SELECT s, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(conv) AS HUGEINT) AS r FROM pu GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(r) AS rr, sum(s * n) AS a1,
        |    sum(s * r) AS a2, sum(s * s * n) AS a3 FROM g)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(rr AS BIGINT) AS r,
        |  CAST(nn * a2 - rr * a1 AS BIGINT) AS t_num,
        |  CAST((nn * a2 - rr * a1) * (nn * a2 - rr * a1)
        |      // nullif(rr * (nn - rr), 0)
        |    * (nn - 1) * 1000000
        |    // nullif(nn * a3 - a1 * a1, 0) AS BIGINT) AS z2_micro
        |FROM t""".stripMargin,
    // q349: information gain — exact cells, H = ln n − (Σ c·ln c)/n
    // per side (zero cells contribute 0), one mirrored float chain
    // rounded 6 (the q126 drift argument).
    "q349_info_gain" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 300 AND lang = 'en'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |    CAST(sum(CASE WHEN n_chars >= 300 AND lang <> 'en'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a0,
        |    CAST(sum(CASE WHEN n_chars < 300 AND lang = 'en'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        |    CAST(sum(CASE WHEN n_chars < 300 AND lang <> 'en'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b0
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL)
        |SELECT n, a1 + a0 AS n_left, b1 + b0 AS n_right,
        |  CASE WHEN n > 0 THEN round(
        |    (ln(CAST(n AS DOUBLE))
        |      - ((CASE WHEN a1 + b1 > 0 THEN (a1 + b1)
        |            * ln(CAST(a1 + b1 AS DOUBLE)) ELSE 0 END)
        |        + (CASE WHEN a0 + b0 > 0 THEN (a0 + b0)
        |            * ln(CAST(a0 + b0 AS DOUBLE)) ELSE 0 END)) / n)
        |    - ((CASE WHEN a1 + a0 > 0 THEN (a1 + a0)
        |          * (ln(CAST(a1 + a0 AS DOUBLE))
        |            - ((CASE WHEN a1 > 0 THEN a1
        |                  * ln(CAST(a1 AS DOUBLE)) ELSE 0 END)
        |              + (CASE WHEN a0 > 0 THEN a0
        |                  * ln(CAST(a0 AS DOUBLE)) ELSE 0 END))
        |              / (a1 + a0)) ELSE 0 END)
        |      + (CASE WHEN b1 + b0 > 0 THEN (b1 + b0)
        |          * (ln(CAST(b1 + b0 AS DOUBLE))
        |            - ((CASE WHEN b1 > 0 THEN b1
        |                  * ln(CAST(b1 AS DOUBLE)) ELSE 0 END)
        |              + (CASE WHEN b0 > 0 THEN b0
        |                  * ln(CAST(b0 AS DOUBLE)) ELSE 0 END))
        |              / (b1 + b0)) ELSE 0 END)) / n, 6) + 0.0
        |  END AS info_gain
        |FROM c""".stripMargin,
    // q350: Theil's U2 — both error populations on the SAME paired
    // days, exact HUGEINT squared-error sums, the q327 one-sqrt
    // mirrored chain; RMSEs reported in cents (long-bounded).
    "q350_theil_u" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.d, a.cents, s.cents AS fs, o.cents AS f1
        |  FROM daily a JOIN daily s ON a.d = s.d + 7
        |               JOIN daily o ON a.d = o.d + 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(cents - fs AS HUGEINT) * (cents - fs)) AS ss,
        |    sum(CAST(cents - f1 AS HUGEINT) * (cents - f1)) AS s1
        |  FROM p)
        |SELECT n AS n_days,
        |  CASE WHEN n > 0 THEN CAST(round(
        |    sqrt(CAST(ss AS DOUBLE) / n), 0) AS BIGINT)
        |  END AS rmse_seasonal_cents,
        |  CASE WHEN n > 0 THEN CAST(round(
        |    sqrt(CAST(s1 AS DOUBLE) / n), 0) AS BIGINT)
        |  END AS rmse_naive1_cents,
        |  CASE WHEN n > 0 AND s1 > 0 THEN CAST(round(
        |    sqrt(CAST(ss AS DOUBLE) / CAST(s1 AS DOUBLE))
        |      * 1000000, 0) AS BIGINT)
        |  END AS u_micro
        |FROM t""".stripMargin,
    // q323: shot boundaries — 16-byte frames (ASCII corpus: ascii(c)
    // == byte, the q169 identity), per-frame 8-bin histograms, lag-1
    // integer L1 per doc, byte-normalized ppm, top-100 total order.
    "q323_shot_boundaries" ->
      s"""WITH f AS (SELECT doc_id, CAST(t.fo AS INTEGER) AS frame_no,
        |    substr(text, CAST(t.fo * 16 + 1 AS BIGINT), 16) AS s
        |  FROM documents, LATERAL unnest(range(0,
        |    (len(text) + 15) // 16)) t(fo)),
        |h AS (SELECT doc_id, frame_no, CAST(len(s) AS BIGINT) AS nb,
        |    [${(0 until 8).map(k =>
          s"CAST(len([c for c in string_split(s, '') " +
            s"if ascii(c) % 8 = $k]) AS BIGINT)").mkString(",\n        |     ")}]
        |      AS hist
        |  FROM f),
        |l AS (SELECT doc_id, frame_no, nb, hist,
        |    lag(hist) OVER w AS ph, lag(nb) OVER w AS pb
        |  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no)),
        |d AS (SELECT doc_id, frame_no,
        |    CAST(list_sum([abs(hist[i] - ph[i])
        |      for i in range(1, 9)]) AS BIGINT) AS dist,
        |    nb + pb AS tot
        |  FROM l WHERE ph IS NOT NULL)
        |SELECT doc_id, frame_no, dist,
        |  CAST(dist * 1000000 // tot AS BIGINT) AS cut_ppm
        |FROM d
        |ORDER BY cut_ppm DESC, doc_id, frame_no LIMIT 100""".stripMargin,
    // q321: personalized PageRank — q153's chain with the teleport
    // mass restarted at the BUILDING-segment seed customers (tele =
    // 150000·N div |S| on seeds, init = 1000000·N div |S|), three
    // unrolled supersteps, all-integer.
    "q321_personalized_pagerank" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey + 1000000000 AS BIGINT) AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |sd AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS node
        |       FROM customer WHERE c_mktsegment = 'BUILDING'),
        |n AS (SELECT node, CASE WHEN node IN (SELECT node FROM sd)
        |        THEN 1 ELSE 0 END AS seed
        |      FROM (SELECT src AS node FROM e
        |            UNION SELECT dst FROM e)),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |         CAST(sum(seed) AS BIGINT) AS ns FROM n),
        |wt AS (SELECT node,
        |    CASE WHEN seed = 1 THEN 150000 * st.nn // st.ns
        |         ELSE 0 END AS tele,
        |    CASE WHEN seed = 1 THEN 1000000 * st.nn // st.ns
        |         ELSE 0 END AS r
        |  FROM n, st),
        |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |c1 AS (SELECT e.dst AS node,
        |         CAST(sum(r.r // od.outdeg) AS BIGINT) AS s
        |       FROM e JOIN od USING (src) JOIN wt r ON r.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT wt.node, wt.tele, CAST(wt.tele +
        |         (850000 * coalesce(c1.s, 0)) // 1000000 AS BIGINT)
        |         AS r
        |       FROM wt LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.dst AS node,
        |         CAST(sum(r.r // od.outdeg) AS BIGINT) AS s
        |       FROM e JOIN od USING (src) JOIN r1 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT r1.node, r1.tele, CAST(r1.tele +
        |         (850000 * coalesce(c2.s, 0)) // 1000000 AS BIGINT)
        |         AS r
        |       FROM r1 LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.dst AS node,
        |         CAST(sum(r.r // od.outdeg) AS BIGINT) AS s
        |       FROM e JOIN od USING (src) JOIN r2 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT r2.node, CAST(r2.tele +
        |         (850000 * coalesce(c3.s, 0)) // 1000000 AS BIGINT)
        |         AS r
        |       FROM r2 LEFT JOIN c3 USING (node))
        |SELECT node, r FROM r3
        |ORDER BY r DESC, node LIMIT 50""".stripMargin,
    // q322: weekly seasonal index — per (epoch-day + 3) mod 7 weekday,
    // cross-multiplied exact-ppm mean-vs-overall-mean.
    "q322_dow_profile" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |b AS (SELECT (d + 3) % 7 AS dow,
        |        CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(c) AS BIGINT) AS cents
        |      FROM daily GROUP BY 1),
        |t AS (SELECT CAST(sum(n_days) AS BIGINT) AS n_all,
        |        CAST(sum(cents) AS BIGINT) AS c_all FROM b)
        |SELECT CAST(b.dow AS BIGINT) AS dow, b.n_days, b.cents,
        |  CAST(CAST(b.cents AS HUGEINT) * t.n_all * 1000000
        |    // (CAST(t.c_all AS HUGEINT) * b.n_days) AS BIGINT)
        |    AS seasonal_ppm
        |FROM b, t ORDER BY dow""".stripMargin,
    // q320: stratified log-rank — q293's moment chain per user_id%3
    // stratum (risk cumsums PARTITION BY s), summed into one z.
    "q320_stratified_logrank" ->
      """WITH days AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |    CAST(user_id % 2 AS INT) AS g,
        |    CAST(user_id % 3 AS INT) AS s FROM events),
        |m AS (SELECT max(d) AS m FROM days),
        |u AS (SELECT u, min(d) AS f, max(d) AS l, max(g) AS g,
        |        max(s) AS s
        |      FROM days GROUP BY 1),
        |lt AS (SELECT s, g, l - f AS t,
        |         CASE WHEN m.m - l >= 14 THEN 1 ELSE 0 END AS dead
        |       FROM u, m),
        |h AS (SELECT s, t,
        |    sum(CASE WHEN g = 1 THEN dead ELSE 0 END) AS d1,
        |    sum(CASE WHEN g = 1 THEN 1 - dead ELSE 0 END) AS c1,
        |    sum(CASE WHEN g <> 1 THEN dead ELSE 0 END) AS d0,
        |    sum(CASE WHEN g <> 1 THEN 1 - dead ELSE 0 END) AS c0
        |  FROM lt GROUP BY 1, 2),
        |r AS (SELECT s, t, d1, d0,
        |    sum(d1 + c1) OVER (PARTITION BY s ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
        |    sum(d0 + c0) OVER (PARTITION BY s ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n0
        |  FROM h),
        |c AS (SELECT d1, d0 + d1 AS dd, n0 + n1 AS nn, n1, n0
        |      FROM r WHERE d0 + d1 > 0 AND n0 + n1 >= 2),
        |mo AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(CAST(dd AS HUGEINT) * n1 * 1000000 // nn)
        |      AS BIGINT) AS e1_ppm,
        |    CAST(sum(CAST(dd AS HUGEINT) * n1 * n0 * (nn - dd)
        |        * 1000000000000
        |        // (CAST(nn AS HUGEINT) * nn * (nn - 1)))
        |      AS BIGINT) AS v_ppt
        |  FROM c),
        |tot AS (SELECT
        |    CAST(count(DISTINCT s) AS BIGINT) AS n_strata,
        |    CAST(sum(CASE WHEN g <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0_users,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1_users
        |  FROM lt)
        |SELECT n_strata, n0_users, n1_users, o1, e1_ppm, v_ppt,
        |  CASE WHEN v_ppt > 0 THEN
        |    CAST(o1 * 1000000 - e1_ppm AS DOUBLE) / sqrt(CAST(v_ppt
        |      AS DOUBLE)) END AS z
        |FROM mo, tot""".stripMargin,
    // q312: Mann–Kendall — q228's daily cents series, S as the exact
    // pairwise sign sum, tie-corrected 18·Var integer, z with the
    // continuity correction the one float (operand order mirrored).
    "q312_mann_kendall" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(coalesce(sum(CASE WHEN b.c > a.c THEN 1
        |        WHEN b.c < a.c THEN -1 ELSE 0 END), 0) AS BIGINT)
        |        AS s_stat
        |      FROM daily a JOIN daily b ON a.d < b.d),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |t AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |        AS BIGINT) AS tie
        |      FROM (SELECT count(*) AS t FROM daily GROUP BY c)
        |      WHERE t > 1),
        |v AS (SELECT n.n, n.n * (n.n - 1) * (2 * n.n + 5) - t.tie
        |        AS var18 FROM n, t)
        |SELECT v.n AS n_days, s.s_stat,
        |  CAST(v.var18 AS BIGINT) AS var18,
        |  CASE WHEN v.var18 > 0 THEN
        |    CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
        |           / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
        |         WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
        |           / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
        |         ELSE 0.0 END END AS z
        |FROM v, s""".stripMargin,
    // q313: ECE/MCE — q257's exact-integer bins collapsed to the two
    // one-number summaries (bin-weighted and max |pos − conf| gap).
    "q313_calibration_error" ->
      """WITH base AS (SELECT
        |    least(1000000, n_chars * 1000000 // 600) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (SELECT least(9, s * 10 // 1000000) AS bin,
        |    count(*) AS n,
        |    CAST(sum(CAST(s AS HUGEINT)) // count(*) AS BIGINT) AS ms,
        |    CAST(CAST(count(CASE WHEN y = 1 THEN 1 END) AS HUGEINT)
        |      * 1000000 // count(*) AS BIGINT) AS pp
        |  FROM base GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(CAST(n AS HUGEINT) * abs(pp - ms)) // sum(n)
        |    AS BIGINT) AS ece_ppm,
        |  CAST(max(abs(pp - ms)) AS BIGINT) AS mce_ppm
        |FROM b""".stripMargin,
    // q314: deterministic stratified sample — bottom-5 md5 priorities
    // per language (priority, id total order); md5 hex compares
    // identically as a string in both engines.
    "q314_stratified_sample" ->
      """WITH p AS (SELECT lang AS stratum, doc_id AS id,
        |    md5('r14:' || CAST(doc_id AS VARCHAR)) AS priority
        |  FROM documents),
        |r AS (SELECT stratum, id, priority,
        |    CAST(row_number() OVER (PARTITION BY stratum
        |      ORDER BY priority, id) AS BIGINT) AS rk
        |  FROM p)
        |SELECT stratum, rk, id, priority FROM r WHERE rk <= 5
        |ORDER BY stratum, rk""".stripMargin,
    // q315: Zipf slope — top-40 (freq DESC, token) cut, ln(rank)/
    // ln(freq) nano-rounded (q304's convention), exact HUGEINT OLS
    // sums, one truncating division (// truncates toward zero on
    // HUGEINT, matching Spark's decimal div — the q228 rule).
    "q315_zipf_slope" ->
      """WITH tk AS (SELECT t FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t
        |    FROM documents) WHERE t <> ''),
        |f AS (SELECT t, CAST(count(*) AS BIGINT) AS freq FROM tk
        |      GROUP BY 1 ORDER BY freq DESC, t LIMIT 40),
        |p AS (SELECT freq, CAST(row_number() OVER
        |        (ORDER BY freq DESC, t) AS BIGINT) AS rnk FROM f),
        |q AS (SELECT freq,
        |    CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e9, 0) AS BIGINT)
        |      AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)) * 1e9, 0) AS BIGINT)
        |      AS y
        |  FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  max(freq) AS top_freq,
        |  CAST((CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
        |      - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)))
        |    * 1000000
        |    // nullif(CAST(count(*) AS HUGEINT)
        |        * sum(CAST(x AS HUGEINT) * x)
        |      - sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)), 0)
        |    AS BIGINT) AS slope_micro
        |FROM q""".stripMargin,
    // q317: Brier + Murphy decomposition — q257's score/label, exact
    // micro-unit squared-error sums; the decomposition is defined
    // over the binned table's truncated integers.
    "q317_brier" ->
      """WITH base AS (SELECT
        |    least(1000000, n_chars * 1000000 // 600) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    sum(CAST(s - y * 1000000 AS HUGEINT) * (s - y * 1000000))
        |      AS se,
        |    CAST(CAST(count(CASE WHEN y = 1 THEN 1 END) AS HUGEINT)
        |      * 1000000 // count(*) AS BIGINT) AS ybar
        |  FROM base),
        |b AS (SELECT least(9, s * 10 // 1000000) AS bin, count(*) AS n,
        |    CAST(sum(CAST(s AS HUGEINT)) // count(*) AS BIGINT) AS ms,
        |    CAST(CAST(count(CASE WHEN y = 1 THEN 1 END) AS HUGEINT)
        |      * 1000000 // count(*) AS BIGINT) AS pp
        |  FROM base GROUP BY 1),
        |ba AS (SELECT
        |    sum(CAST(n AS HUGEINT) * (ms - pp) * (ms - pp)) AS rel,
        |    sum(CAST(n AS HUGEINT) * (pp - g.ybar) * (pp - g.ybar))
        |      AS res
        |  FROM b, g)
        |SELECT g.n_rows,
        |  CAST(g.se // (CAST(g.n_rows AS HUGEINT) * 1000000)
        |    AS BIGINT) AS brier_micro,
        |  CAST(ba.rel // (CAST(g.n_rows AS HUGEINT) * 1000000)
        |    AS BIGINT) AS reliability_micro,
        |  CAST(ba.res // (CAST(g.n_rows AS HUGEINT) * 1000000)
        |    AS BIGINT) AS resolution_micro,
        |  CAST(g.ybar * (1000000 - g.ybar) // 1000000 AS BIGINT)
        |    AS uncertainty_micro
        |FROM g, ba""".stripMargin,
    // q318: minimum detectable effect — q213's per-user conversion
    // aggregate, the literal 2.801585 z-sum, one mirrored √ chain
    // rounded to ppm, integer powered flag.
    "q318_ab_mde" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS v, user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |o AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_a,
        |    CAST(coalesce(sum(CASE WHEN v = 0 THEN conv ELSE 0 END), 0)
        |      AS BIGINT) AS conv_a,
        |    CAST(coalesce(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_b,
        |    CAST(coalesce(sum(CASE WHEN v = 1 THEN conv ELSE 0 END), 0)
        |      AS BIGINT) AS conv_b
        |  FROM u),
        |x AS (SELECT n_a, n_b,
        |    conv_a * 1000000 // nullif(n_a, 0) AS p0_ppm,
        |    conv_b * 1000000 // nullif(n_b, 0)
        |      - conv_a * 1000000 // nullif(n_a, 0)
        |      AS observed_diff_ppm
        |  FROM o),
        |x2 AS (SELECT *,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND p0_ppm > 0
        |        AND p0_ppm < 1000000 THEN
        |      CAST(round(2.801585 * sqrt(
        |        CAST(p0_ppm AS DOUBLE) / 1000000.0
        |        * (1.0 - CAST(p0_ppm AS DOUBLE) / 1000000.0)
        |        * (1.0 / n_a + 1.0 / n_b)) * 1000000.0, 0)
        |        AS BIGINT) END AS mde_ppm
        |  FROM x)
        |SELECT n_a, n_b, p0_ppm, observed_diff_ppm, mde_ppm,
        |  CAST(coalesce(abs(observed_diff_ppm) >= mde_ppm, false)
        |    AS INTEGER) AS powered
        |FROM x2""".stripMargin,
    // q319: Ljung–Box — q217's ACF chain, values re-integerized from
    // the rounded-6 doubles, per-lag truncating term, DECIMAL fold.
    "q319_ljung_box" ->
      """WITH daily AS (SELECT
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |pr AS (SELECT l.lag, a.cents AS x, b.cents AS y
        |       FROM daily a, range(1, 8) l(lag), daily b
        |       WHERE b.d = a.d + l.lag),
        |ag AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(count(*) AS DOUBLE) AS n,
        |        CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |        CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |        CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |       FROM pr GROUP BY 1),
        |ac AS (SELECT lag,
        |       CASE WHEN n_pairs >= 2 AND
        |           sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) <> 0
        |         THEN round((n * sxy - sx * sy) /
        |           sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |           + 0.0
        |       END AS acf
        |       FROM ag),
        |n2 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
        |t AS (SELECT CAST(coalesce(sum(
        |      CASE WHEN acf IS NOT NULL AND n2.nd - lag > 0 THEN
        |        CAST(round(acf * 1e6, 0) AS BIGINT)
        |          * CAST(round(acf * 1e6, 0) AS BIGINT)
        |          // (n2.nd - lag)
        |      ELSE 0 END), 0) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS n_lags
        |  FROM ac, n2)
        |SELECT n2.nd AS n_days, t.n_lags,
        |  CAST(CAST(n2.nd AS HUGEINT) * (n2.nd + 2) * t.t // 1000000
        |    AS BIGINT) AS q_micro
        |FROM n2, t""".stripMargin,
  )

  /** One deterministic LPA superstep — votes from the previous round's
    * labels, pick = (count DESC, label ASC); the DuckDB twin of one
    * `Graph.labelPropagation` round. */
  private def lpaRound(i: Int): String =
    s"""vt$i AS (SELECT nb.v, l${i - 1}.lbl, count(*) AS c
       |       FROM nb JOIN l${i - 1} ON l${i - 1}.node = nb.u
       |       GROUP BY 1, 2),
       |l$i AS (SELECT v AS node, lbl FROM (
       |        SELECT v, lbl, row_number() OVER
       |          (PARTITION BY v ORDER BY c DESC, lbl) AS rk
       |        FROM vt$i) WHERE rk = 1)""".stripMargin

  private val vocabGrowthSql: String =
    """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
      |pd AS (SELECT least(9, doc_id * 10 // (mx + 1)) AS bucket,
      |         len(list_filter(string_split(text, ' '),
      |           t -> t <> '')) AS n_tok
      |       FROM documents, mx),
      |pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |       FROM pd GROUP BY 1),
      |fs AS (SELECT t, min(doc_id) AS fid FROM (
      |         SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |         FROM documents)
      |       WHERE t <> '' GROUP BY 1),
      |nt AS (SELECT least(9, fid * 10 // (mx + 1)) AS bucket,
      |         CAST(count(*) AS BIGINT) AS n_new_types
      |       FROM fs, mx GROUP BY 1),
      |cur AS (SELECT pb.bucket, pb.n_docs, pb.n_tokens,
      |          coalesce(nt.n_new_types, 0) AS n_new_types,
      |          sum(coalesce(nt.n_new_types, 0)) OVER w AS vocab_size,
      |          sum(pb.n_tokens) OVER w AS tokens_cum
      |        FROM pb LEFT JOIN nt USING (bucket)
      |        WINDOW w AS (ORDER BY pb.bucket ROWS BETWEEN
      |          UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, n_tokens,
      |  n_new_types, CAST(vocab_size AS BIGINT) AS vocab_size,
      |  CAST(tokens_cum AS BIGINT) AS tokens_cum,
      |  CAST(CAST(vocab_size AS HUGEINT) * 1000000
      |    // nullif(tokens_cum, 0) AS BIGINT) AS type_token_ppm
      |FROM cur ORDER BY bucket""".stripMargin

  /** The one Holt oracle recursion, shared verbatim by q273 (direct
    * form) and q277 (append/state form) — the [[ewmaRecursionSql]]
    * pattern with the TWO-component (level, trend) state and the
    * sign-safe truncating division (see the q273 comment). */
  private val holtRecursionSql: String =
      """WITH RECURSIVE b AS (
        |  SELECT event_type AS k,
        |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |r0 AS (SELECT k, d, x,
        |         row_number() OVER (PARTITION BY k ORDER BY d) AS rn
        |       FROM b),
        |rec AS (
        |  SELECT k, d, x, rn, CAST(x AS HUGEINT) AS l,
        |         CAST(0 AS HUGEINT) AS tr, CAST(x AS HUGEINT) AS f
        |  FROM r0 WHERE rn = 1
        |  UNION ALL
        |  SELECT k, d, x, rn, l2 AS l,
        |         CASE WHEN 1 * (l2 - l1) + 7 * tr1 >= 0
        |              THEN (1 * (l2 - l1) + 7 * tr1) // 8
        |              ELSE -((-(1 * (l2 - l1) + 7 * tr1)) // 8)
        |         END AS tr,
        |         f2 AS f
        |  FROM (
        |    SELECT r0.k, r0.d, r0.x, r0.rn, rec.l AS l1,
        |           rec.tr AS tr1, rec.l + rec.tr AS f2,
        |           CASE WHEN 1 * CAST(r0.x AS HUGEINT)
        |                     + 3 * (rec.l + rec.tr) >= 0
        |                THEN (1 * CAST(r0.x AS HUGEINT)
        |                     + 3 * (rec.l + rec.tr)) // 4
        |                ELSE -((-(1 * CAST(r0.x AS HUGEINT)
        |                     + 3 * (rec.l + rec.tr))) // 4)
        |           END AS l2
        |    FROM r0 JOIN rec ON r0.k = rec.k AND r0.rn = rec.rn + 1))
        |SELECT k, d, x, CAST(l AS BIGINT) AS level,
        |       CAST(tr AS BIGINT) AS trend,
        |       CAST(f AS BIGINT) AS forecast
        |FROM rec ORDER BY k, d""".stripMargin

  /** q289's oracle: the Holt–Winters additive recursion unrolled as a
    * recursive CTE carrying level, trend, and the 7 seasonal slots —
    * generated per slot so the CASE carries and the Spark scan
    * ([[graft.plans.HoltWintersScan]]) can never drift; every signed
    * division in the portable sign-safe tdiv form. */
  private val holtWintersSql: String = {
    val (aN, aD, bN, bD, gN, gD, m) = (1, 4, 1, 8, 1, 4, 7)
    def tdiv(v: String, den: Int) =
      s"CASE WHEN $v >= 0 THEN ($v) // $den ELSE -((-($v)) // $den) END"
    val sdowCase = s"CASE CAST(r0.d % $m AS INTEGER) " +
      (0 until m).map(j => s"WHEN $j THEN rec.s$j").mkString(" ") +
      " END"
    val seedS = (0 until m).map(j => s"CAST(0 AS HUGEINT) AS s$j")
      .mkString(",\n         ")
    val carryS = (0 until m).map(j =>
      s"CASE WHEN d % $m = $j THEN su2 ELSE s$j END AS s$j")
      .mkString(",\n         ")
    s"""WITH RECURSIVE b AS (
      |  SELECT event_type AS k,
      |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND ts IS NOT NULL
      |  GROUP BY 1, 2),
      |r0 AS (SELECT k, d, x,
      |         row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |       FROM b),
      |rec AS (
      |  SELECT k, d, x, rn, CAST(x AS HUGEINT) AS l,
      |         CAST(0 AS HUGEINT) AS tr,
      |         $seedS,
      |         CAST(0 AS HUGEINT) AS su, CAST(x AS HUGEINT) AS f
      |  FROM r0 WHERE rn = 1
      |  UNION ALL
      |  SELECT k, d, x, rn, l2 AS l,
      |         ${tdiv(s"$bN * (l2 - l1) + ${bD - bN} * tr1", bD)} AS tr,
      |         $carryS,
      |         su2 AS su, f2 AS f
      |  FROM (
      |    SELECT *,
      |      ${tdiv(s"$gN * (CAST(x AS HUGEINT) - l2) + " +
        s"${gD - gN} * sdow", gD)} AS su2
      |    FROM (
      |      SELECT *, (l1 + tr1 + sdow) AS f2,
      |        ${tdiv(s"$aN * (CAST(x AS HUGEINT) - sdow) + " +
        s"${aD - aN} * (l1 + tr1)", aD)} AS l2
      |      FROM (
      |        SELECT r0.k, r0.d, r0.x, r0.rn, rec.l AS l1,
      |               rec.tr AS tr1,
      |               ${(0 until m).map(j => s"rec.s$j AS s$j")
        .mkString(", ")},
      |               $sdowCase AS sdow
      |        FROM r0 JOIN rec ON r0.k = rec.k
      |                        AND r0.rn = rec.rn + 1))))
      |SELECT""".stripMargin
  }

  /** q289's oracle: the full per-row Holt–Winters readout. */
  private val holtWintersRowsSql: String =
    holtWintersSql + """
      |  k, d, x, CAST(l AS BIGINT) AS level,
      |  CAST(tr AS BIGINT) AS trend,
      |  CAST(su AS BIGINT) AS seasonal,
      |  CAST(f AS BIGINT) AS forecast
      |FROM rec ORDER BY k, d""".stripMargin

  /** q283's oracle: the same recursion, then per key the one-step
    * forecast MAE vs the seasonal-naive (x seven observations back)
    * over the rows where both are defined (rn > 7). */
  private val holtWintersBacktestSql: String =
    holtWintersSql + """
      |  * FROM (
      |  WITH w AS (SELECT k, d, x, rn, CAST(f AS BIGINT) AS forecast,
      |          lag(x, 7) OVER (PARTITION BY k ORDER BY d) AS x7
      |        FROM rec),
      |  g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
      |          CAST(sum(abs(forecast - x)) AS BIGINT) AS eh,
      |          CAST(sum(abs(x7 - x)) AS BIGINT) AS es
      |        FROM w WHERE rn > 7 GROUP BY 1)
      |  SELECT k, n, eh // n AS mae_hw_cents,
      |         es // n AS mae_snaive_cents,
      |         CASE WHEN es > 0 THEN
      |           CAST(CAST(eh AS HUGEINT) * 1000000 // es AS BIGINT)
      |           END AS skill_ppm
      |  FROM g) ORDER BY k""".stripMargin

  /** Shared CTE body of the q278/q281 oracles: the binned length-score
    * table (`bn`), the range rates (`rg`), and the minimax PAV fit
    * (`cal`), mirroring `Labeling.isotonicCalibration` term by term —
    * q278 reads the fitted bins; q281 LEFT JOINs every document's
    * score through `cal` (the apply seam). ONE string so train and
    * apply oracles can never drift. */
  private val isotonicCalCtes: String =
    """base AS (SELECT
      |    least(1000000, n_chars * 1000000 // 600) AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |bn AS (SELECT CAST(least(9, s * 10 // 1000000) AS INTEGER) AS b,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS p
      |       FROM base GROUP BY 1),
      |rg AS (SELECT j.b AS j, k.b AS k,
      |         CAST(sum(CAST(m.p AS HUGEINT)) * 1000000
      |           // sum(CAST(m.n AS HUGEINT)) AS BIGINT) AS r
      |       FROM bn j JOIN bn k ON j.b <= k.b
      |       JOIN bn m ON m.b BETWEEN j.b AND k.b
      |       GROUP BY 1, 2),
      |mn AS (SELECT rg.j, i.b AS i, min(rg.r) AS mn
      |       FROM rg JOIN bn i ON rg.j <= i.b AND rg.k >= i.b
      |       GROUP BY 1, 2),
      |cal AS (SELECT i, max(mn) AS cal_ppm FROM mn GROUP BY 1)""".stripMargin

  /** Shared CTE body of the q276/q280 oracles (`st` value histogram →
    * clamped `u` ppm row → fine-composite-blocked pairs `p` → scored
    * `sc`), mirroring `Dedup.linkagePairScores` term by term at
    * m = 0.7 — q276 selects the net-positive pairs from `sc`; q280
    * walks them to connected components. Kept as ONE string so the
    * two oracles can never drift apart. */
  private val linkagePairsCtes: String =
    """st AS (
      |  SELECT 'seg' AS f, CAST(c_mktsegment AS VARCHAR) AS v
      |    FROM customer
      |  UNION ALL
      |  SELECT 'cents', CAST(CAST(floor(c_acctbal * 100) AS BIGINT)
      |      AS VARCHAR)
      |    FROM customer),
      |cnt AS (SELECT f, v, CAST(count(*) AS BIGINT) AS c
      |        FROM st WHERE v IS NOT NULL GROUP BY 1, 2),
      |g AS (SELECT f, CAST(sum(c) AS BIGINT) AS n,
      |        sum(CAST(c AS HUGEINT) * (c - 1)) AS ap
      |      FROM cnt GROUP BY 1),
      |u AS (SELECT
      |    coalesce(max(CASE WHEN f = 'seg' THEN
      |      greatest(1, least(999999,
      |        CASE WHEN CAST(n AS HUGEINT) * (n - 1) > 0
      |        THEN CAST(ap * 1000000 // (CAST(n AS HUGEINT) * (n - 1))
      |          AS BIGINT)
      |        ELSE 500000 END)) END), 500000) AS u_seg,
      |    coalesce(max(CASE WHEN f = 'cents' THEN
      |      greatest(1, least(999999,
      |        CASE WHEN CAST(n AS HUGEINT) * (n - 1) > 0
      |        THEN CAST(ap * 1000000 // (CAST(n AS HUGEINT) * (n - 1))
      |          AS BIGINT)
      |        ELSE 500000 END)) END), 500000) AS u_cents
      |  FROM g),
      |base AS (SELECT c_custkey AS pid,
      |    concat_ws('_', c_nationkey,
      |      CAST(floor(c_acctbal / 100) AS BIGINT)) AS blk,
      |    CAST(c_mktsegment AS VARCHAR) AS f_seg,
      |    CAST(CAST(floor(c_acctbal * 100) AS BIGINT) AS VARCHAR)
      |      AS f_cents
      |  FROM customer
      |  WHERE c_custkey IS NOT NULL),
      |p AS (SELECT a.pid AS id_a, b.pid AS id_b,
      |    a.f_seg AS a_seg, b.f_seg AS b_seg,
      |    a.f_cents AS a_cents, b.f_cents AS b_cents
      |  FROM base a JOIN base b ON a.blk = b.blk AND a.pid < b.pid),
      |sc AS (SELECT id_a, id_b,
      |    (CASE WHEN a_seg IS NOT NULL AND b_seg IS NOT NULL
      |       AND a_seg = b_seg THEN 1 ELSE 0 END) +
      |    (CASE WHEN a_cents IS NOT NULL AND b_cents IS NOT NULL
      |       AND a_cents = b_cents THEN 1 ELSE 0 END) AS n_agree,
      |    (CASE WHEN a_seg IS NULL OR b_seg IS NULL
      |       THEN CAST(1000000 AS HUGEINT)
      |     WHEN a_seg = b_seg
      |       THEN CAST(700000 AS HUGEINT) * 1000000 // u_seg
      |     ELSE CAST(300000 AS HUGEINT) * 1000000 // (1000000 - u_seg)
      |     END) *
      |    (CASE WHEN a_cents IS NULL OR b_cents IS NULL
      |       THEN CAST(1000000 AS HUGEINT)
      |     WHEN a_cents = b_cents
      |       THEN CAST(700000 AS HUGEINT) * 1000000 // u_cents
      |     ELSE CAST(300000 AS HUGEINT) * 1000000 // (1000000 - u_cents)
      |     END) AS score_pp
      |  FROM p, u)""".stripMargin

  /** q291's oracle: the shared linkage CTEs, each PASSING pair
    * unpacked one row per field — generated per field name so the
    * odds branch can never drift from the scoring CTE. */
  private val linkageEvidenceSql: String = {
    def odds(n: String) =
      s"CAST((CASE WHEN a_$n IS NULL OR b_$n IS NULL\n" +
        s"       THEN CAST(1000000 AS HUGEINT)\n" +
        s"     WHEN a_$n = b_$n\n" +
        s"       THEN CAST(700000 AS HUGEINT) * 1000000 // u_$n\n" +
        s"     ELSE CAST(300000 AS HUGEINT) * 1000000\n" +
        s"       // (1000000 - u_$n) END) AS BIGINT)"
    def state(n: String) =
      s"CASE WHEN a_$n IS NULL OR b_$n IS NULL THEN 'abstain' " +
        s"WHEN a_$n = b_$n THEN 'agree' ELSE 'disagree' END"
    "WITH " + linkagePairsCtes + ",\n" +
      s"""pf AS (
        |  SELECT id_a, id_b, 'seg' AS field,
        |    ${state("seg")} AS state,
        |    ${odds("seg")} AS odds_ppm
        |  FROM p, u
        |  UNION ALL
        |  SELECT id_a, id_b, 'cents',
        |    ${state("cents")},
        |    ${odds("cents")}
        |  FROM p, u)
        |SELECT pf.id_a, pf.id_b, pf.field, pf.state, pf.odds_ppm
        |FROM pf JOIN sc ON pf.id_a = sc.id_a AND pf.id_b = sc.id_b
        |WHERE sc.score_pp > CAST(1000000 AS HUGEINT) * 1000000
        |ORDER BY pf.id_a, pf.id_b, pf.field""".stripMargin
  }

  /** q287's oracle: Dawid–Skene's two EM iterations unrolled as
    * generated CTE pairs (E: per-unit responsibility against the
    * previous parameter row; M: clamped conditional aggregates with
    * max(prev) as the empty-update fallback), fragment-generated per
    * rater so the Spark fold and the SQL can never drift. All-HUGEINT
    * ppm, truncating `//` on non-negative operands only. */
  private val dawidSkeneSql: String = {
    val k = 3
    def f1(j: Int) = s"(CASE WHEN v$j IS NULL THEN 1000000 " +
      s"WHEN v$j = 1 THEN a$j ELSE 1000000 - a$j END)"
    def f0(j: Int) = s"(CASE WHEN v$j IS NULL THEN 1000000 " +
      s"WHEN v$j = 1 THEN 1000000 - b$j ELSE b$j END)"
    def eCte(pSrc: String, out: String) = {
      val w1 = ("CAST(pi AS HUGEINT)" +: (0 until k).map(f1))
        .mkString(" * ")
      val w0 = ("CAST(1000000 - pi AS HUGEINT)" +: (0 until k).map(f0))
        .mkString(" * ")
      s"$out AS (SELECT u.*, p.*,\n    CAST(($w1) * 1000000 " +
        s"// (($w1) + ($w0)) AS BIGINT) AS r\n" +
        s"  FROM u0 u CROSS JOIN $pSrc p)"
    }
    def clamp(x: String) =
      s"greatest(1, least(999999, CAST($x AS BIGINT)))"
    def pCte(src: String, out: String) = {
      val cols = (0 until k).flatMap { j =>
        val da = s"coalesce(sum(CASE WHEN v$j IS NOT NULL THEN " +
          s"CAST(r AS HUGEINT) END), 0)"
        val na = s"coalesce(sum(CASE WHEN v$j = 1 THEN " +
          s"CAST(r AS HUGEINT) END), 0)"
        val db = s"coalesce(sum(CASE WHEN v$j IS NOT NULL THEN " +
          s"CAST(1000000 - r AS HUGEINT) END), 0)"
        val nb = s"coalesce(sum(CASE WHEN v$j = 0 THEN " +
          s"CAST(1000000 - r AS HUGEINT) END), 0)"
        Seq(
          s"CASE WHEN $da > 0 THEN " +
            s"${clamp(s"$na * 1000000 // ($da)")} " +
            s"ELSE max(a$j) END AS a$j",
          s"CASE WHEN $db > 0 THEN " +
            s"${clamp(s"$nb * 1000000 // ($db)")} " +
            s"ELSE max(b$j) END AS b$j")
      }
      val piCol = s"CASE WHEN count(*) > 0 THEN " +
        s"${clamp(s"coalesce(sum(CAST(r AS HUGEINT)), 0) // count(*)")}" +
        s" ELSE CAST(NULL AS BIGINT) END AS pi"
      s"$out AS (SELECT CAST(count(*) AS BIGINT) AS n,\n    $piCol," +
        s"\n    ${cols.mkString(",\n    ")}\n  FROM $src)"
    }
    val inits = ("CAST(500000 AS BIGINT) AS pi" +:
      (0 until k).flatMap(j => Seq(s"CAST(700000 AS BIGINT) AS a$j",
        s"CAST(700000 AS BIGINT) AS b$j"))).mkString(", ")
    // u0 carries doc_id so the SAME CTE chain serves q287 (parameter
    // row) and q288 (per-unit posterior apply)
    s"""WITH u0 AS (SELECT doc_id, r1 AS v0, r2 AS v1, r3 AS v2 FROM (
      |    SELECT doc_id,
      |      CASE WHEN n_chars >= 50
      |        THEN CAST(n_chars >= 300 AS INTEGER) END AS r1,
      |      CASE WHEN doc_id % 7 <> 0
      |        THEN CAST(lang = 'en' AS INTEGER) END AS r2,
      |      CASE WHEN doc_id % 5 <> 0
      |        THEN CAST(len(string_split(text, ' ')) >= 50
      |          AS INTEGER) END AS r3
      |    FROM documents)
      |  WHERE r1 IS NOT NULL OR r2 IS NOT NULL OR r3 IS NOT NULL),
      |p0 AS (SELECT $inits),
      |${eCte("p0", "e1")},
      |${pCte("e1", "p1")},
      |${eCte("p1", "e2")},
      |${pCte("e2", "p2")},
      |${eCte("p2", "e3")}
      |SELECT""".stripMargin
  }

  /** q305's oracle: the GENERAL-FORM Dawid–Skene chain — C = 3
    * classes, per-rater 3×3 confusion matrices; the E/M fragments
    * mirror `Labeling.dawidSkeneMulti`'s expressions term by term
    * (HUGEINT weight products, truncating //, [1, 999999] clamps,
    * no-evidence-keeps-prior via max() carried through the cross
    * join). */
  private val dawidSkeneMultiSql: String = {
    val k = 3
    val C = 3
    def f(j: Int, c: Int) =
      s"(CASE WHEN v$j IS NULL THEN 1000000 ELSE CASE v$j " +
        (0 until C).map(v => s"WHEN $v THEN c${j}_$c$v").mkString(" ") +
        " ELSE 1000000 END END)"
    def w(c: Int) =
      (s"CAST(pi$c AS HUGEINT)" +: (0 until k).map(f(_, c)))
        .mkString(" * ")
    def eCte(pSrc: String, out: String) = {
      val sumW = (0 until C).map(c => s"(${w(c)})").mkString(" + ")
      val rs = (0 until C).map(c =>
        s"CAST((${w(c)}) * 1000000 // ($sumW) AS BIGINT) AS r$c")
        .mkString(",\n    ")
      s"$out AS (SELECT u.*, p.*,\n    $rs\n  FROM u0 u CROSS JOIN $pSrc p)"
    }
    def clamp(x: String) =
      s"greatest(1, least(999999, CAST($x AS BIGINT)))"
    def pCte(src: String, out: String) = {
      val piCols = (0 until C).map(c => s"CASE WHEN count(*) > 0 THEN " +
        clamp(s"coalesce(sum(CAST(r$c AS HUGEINT)), 0) // count(*)") +
        s" ELSE CAST(NULL AS BIGINT) END AS pi$c")
      val confCols = for (j <- 0 until k; c <- 0 until C; v <- 0 until C)
        yield {
          val d = s"coalesce(sum(CASE WHEN v$j IS NOT NULL THEN " +
            s"CAST(r$c AS HUGEINT) END), 0)"
          val nv = s"coalesce(sum(CASE WHEN v$j = $v THEN " +
            s"CAST(r$c AS HUGEINT) END), 0)"
          s"CASE WHEN $d > 0 THEN " + clamp(s"$nv * 1000000 // ($d)") +
            s" ELSE max(c${j}_$c$v) END AS c${j}_$c$v"
        }
      s"$out AS (SELECT CAST(count(*) AS BIGINT) AS n,\n    " +
        (piCols ++ confCols).mkString(",\n    ") + s"\n  FROM $src)"
    }
    val inits = ((0 until C).map(c => s"CAST(333333 AS BIGINT) AS pi$c") ++
      (for (j <- 0 until k; c <- 0 until C; v <- 0 until C) yield
        s"CAST(${if (v == c) 700000 else 150000} AS BIGINT) AS c${j}_$c$v"))
      .mkString(", ")
    val outCols = ((0 until C).map(c => s"pi$c AS pi${c}_ppm") ++
      (for (j <- 0 until k; c <- 0 until C; v <- 0 until C) yield
        s"c${j}_$c$v AS c${j}_$c${v}_ppm")).mkString(",\n  ")
    s"""WITH u0 AS (SELECT r1 AS v0, r2 AS v1, r3 AS v2 FROM (
      |    SELECT
      |      CASE WHEN n_chars >= 50 THEN (CASE WHEN n_chars < 150
      |        THEN 0 WHEN n_chars < 300 THEN 1 ELSE 2 END) END AS r1,
      |      CASE WHEN doc_id % 7 <> 0 THEN (CASE WHEN lang = 'en'
      |        THEN 0 WHEN lang = 'de' THEN 1 ELSE 2 END) END AS r2,
      |      CASE WHEN doc_id % 5 <> 0 THEN
      |        (CASE WHEN len(string_split(text, ' ')) < 30 THEN 0
      |          WHEN len(string_split(text, ' ')) < 60 THEN 1
      |          ELSE 2 END) END AS r3
      |    FROM documents)
      |  WHERE r1 IS NOT NULL OR r2 IS NOT NULL OR r3 IS NOT NULL),
      |p0 AS (SELECT $inits),
      |${eCte("p0", "e1")},
      |${pCte("e1", "p1")},
      |${eCte("p1", "e2")},
      |${pCte("e2", "p2")}
      |SELECT p2.n AS n_units,
      |  $outCols
      |FROM p2""".stripMargin
  }

  /** q287's oracle: the fitted parameter row. */
  private val dawidSkeneParamsSql: String =
    dawidSkeneSql + """
      |  p2.n AS n_units, p2.pi AS pi_ppm,
      |  p2.a0 AS a0_ppm, p2.a1 AS a1_ppm, p2.a2 AS a2_ppm,
      |  p2.b0 AS b0_ppm, p2.b1 AS b1_ppm, p2.b2 AS b2_ppm
      |FROM p2""".stripMargin

  /** q288's oracle: one more E projection through the fitted row —
    * per unit, the exact-ppm posterior and the MAP label. */
  private val dawidSkenePosteriorSql: String =
    dawidSkeneSql + """
      |  doc_id AS unit, r AS posterior_ppm,
      |  CAST(r >= 500000 AS INTEGER) AS label
      |FROM e3 ORDER BY doc_id""".stripMargin

  /** q282's oracle: the shared linkage CTEs plus the tf-adjusted
    * rescoring — the per-field branch is generated once and
    * instantiated per field name so the two fields can never drift;
    * the agreed value's count (ac_k, carried on the a-side row; both
    * sides share the value, hence the count) replaces the field-level
    * u inside the SAME clamp shape. Presented as DOUBLE: a both-agree
    * tf score can exceed int64, and an exact-integer → double cast is
    * correctly rounded identically in both engines. */
  private val linkageTfSql: String = {
    def branch(n: String) =
      s"""    (CASE WHEN a_$n IS NULL OR b_$n IS NULL
         |       THEN CAST(1000000 AS HUGEINT)
         |     WHEN a_$n = b_$n
         |       THEN CAST(700000 AS HUGEINT) * 1000000
         |         // greatest(1, least(999999,
         |           CASE WHEN CAST(n_$n AS HUGEINT) * (n_$n - 1) > 0
         |           THEN CAST(CAST(ac_$n AS HUGEINT) * (ac_$n - 1)
         |             * 1000000 // (CAST(n_$n AS HUGEINT) * (n_$n - 1))
         |             AS BIGINT)
         |           ELSE 500000 END))
         |     ELSE CAST(300000 AS HUGEINT) * 1000000
         |       // (1000000 - u_$n) END)""".stripMargin
    def agree(n: String) =
      s"(CASE WHEN a_$n IS NOT NULL AND b_$n IS NOT NULL " +
        s"AND a_$n = b_$n THEN 1 ELSE 0 END)"
    "WITH " + linkagePairsCtes + ",\n" +
      s"""nn AS (SELECT
        |    max(CASE WHEN f = 'seg' THEN n END) AS n_seg,
        |    max(CASE WHEN f = 'cents' THEN n END) AS n_cents
        |  FROM g),
        |bt AS (SELECT b.pid, b.blk, b.f_seg, b.f_cents,
        |    cs.c AS c_seg, cc.c AS c_cents
        |  FROM base b
        |  LEFT JOIN cnt cs ON cs.f = 'seg' AND cs.v = b.f_seg
        |  LEFT JOIN cnt cc ON cc.f = 'cents' AND cc.v = b.f_cents),
        |pt AS (SELECT a.pid AS id_a, b.pid AS id_b,
        |    a.f_seg AS a_seg, b.f_seg AS b_seg, a.c_seg AS ac_seg,
        |    a.f_cents AS a_cents, b.f_cents AS b_cents,
        |    a.c_cents AS ac_cents
        |  FROM bt a JOIN bt b ON a.blk = b.blk AND a.pid < b.pid),
        |sct AS (SELECT id_a, id_b,
        |    ${agree("seg")} + ${agree("cents")} AS n_agree,
        |${branch("seg")}
        |    *
        |${branch("cents")} AS score_pp
        |  FROM pt, u, nn)
        |SELECT id_a, id_b, CAST(n_agree AS INTEGER) AS n_agree,
        |       CAST(score_pp AS DOUBLE) AS score_pp
        |FROM sct WHERE score_pp > CAST(1000000 AS HUGEINT) * 1000000
        |ORDER BY score_pp DESC, id_a, id_b""".stripMargin
  }

  /** q279's oracle: the two unrolled EM iterations as chained CTE
    * pairs (E-step responsibilities, M-step clamped updates),
    * assembled from per-pattern fragments that mirror
    * `Dedup.linkageEmMU`'s column expressions term by term — fixed
    * operand order, HUGEINT products, truncating `//` on non-negative
    * operands only, the [1, 10⁶−1] clamp on every update. */
  private val linkageEmSql: String = {
    val ps = Seq((0, 0), (0, 1), (1, 0), (1, 1))
    def eBlock(src: String, out: String): String = {
      val cols = ps.map { case (g1, g2) =>
        val t1 = if (g1 == 1) "m1" else "(1000000 - m1)"
        val t2 = if (g2 == 1) "m2" else "(1000000 - m2)"
        val s1 = if (g1 == 1) "u1" else "(1000000 - u1)"
        val s2 = if (g2 == 1) "u2" else "(1000000 - u2)"
        val wm = s"(CAST(lam AS HUGEINT) * $t1 * $t2)"
        val wu = s"(CAST(1000000 - lam AS HUGEINT) * $s1 * $s2)"
        s"CAST($wm * 1000000 // ($wm + $wu) AS BIGINT) AS r_$g1$g2"
      }
      s"$out AS (SELECT n_00, n_01, n_10, n_11, lam, m1, m2, u1, u2," +
        s"\n    ${cols.mkString(",\n    ")}\n  FROM $src)"
    }
    def mBlock(src: String, out: String): String = {
      def S(f: ((Int, Int)) => String) = ps.map(f).mkString(" + ")
      val t = S { case (a, b) => s"CAST(r_$a$b AS HUGEINT) * n_$a$b" }
      val tc = S { case (a, b) =>
        s"CAST(1000000 - r_$a$b AS HUGEINT) * n_$a$b" }
      val n = S { case (a, b) => s"CAST(n_$a$b AS HUGEINT)" }
      def clamp(x: String) =
        s"greatest(1, least(999999, CAST($x AS BIGINT)))"
      def mu(k: Int) = {
        val num = ps.filter(p => (if (k == 1) p._1 else p._2) == 1)
          .map { case (a, b) => s"CAST(r_$a$b AS HUGEINT) * n_$a$b" }
          .mkString(" + ")
        s"CASE WHEN ($t) > 0 THEN " +
          s"${clamp(s"($num) * 1000000 // ($t)")} END AS m$k"
      }
      def uu(k: Int) = {
        val num = ps.filter(p => (if (k == 1) p._1 else p._2) == 1)
          .map { case (a, b) =>
            s"CAST(1000000 - r_$a$b AS HUGEINT) * n_$a$b" }
          .mkString(" + ")
        s"CASE WHEN ($tc) > 0 THEN " +
          s"${clamp(s"($num) * 1000000 // ($tc)")} END AS u$k"
      }
      val lam = s"CASE WHEN ($n) > 0 THEN " +
        s"${clamp(s"($t) // ($n)")} END AS lam"
      s"$out AS (SELECT n_00, n_01, n_10, n_11,\n    $lam," +
        s"\n    ${mu(1)},\n    ${mu(2)},\n    ${uu(1)},\n    ${uu(2)}" +
        s"\n  FROM $src)"
    }
    val blocks = (1 to 2).flatMap(i => Seq(
      eBlock(if (i == 1) "it0" else s"it${i - 1}", s"e$i"),
      mBlock(s"e$i", s"it$i"))).mkString(",\n")
    """WITH base AS (SELECT c_custkey AS pid,
      |    concat_ws('_', c_nationkey,
      |      CAST(floor(c_acctbal / 100) AS BIGINT)) AS blk,
      |    CAST(c_mktsegment AS VARCHAR) AS f1,
      |    CAST(CAST(floor(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS f2
      |  FROM customer
      |  WHERE c_custkey IS NOT NULL),
      |pp AS (SELECT CAST(a.f1 = b.f1 AS INTEGER) AS g1,
      |    CAST(a.f2 = b.f2 AS INTEGER) AS g2
      |  FROM base a JOIN base b ON a.blk = b.blk AND a.pid < b.pid
      |  WHERE a.f1 IS NOT NULL AND b.f1 IS NOT NULL
      |    AND a.f2 IS NOT NULL AND b.f2 IS NOT NULL),
      |c AS (SELECT
      |    CAST(count(CASE WHEN g1 = 0 AND g2 = 0 THEN 1 END) AS BIGINT)
      |      AS n_00,
      |    CAST(count(CASE WHEN g1 = 0 AND g2 = 1 THEN 1 END) AS BIGINT)
      |      AS n_01,
      |    CAST(count(CASE WHEN g1 = 1 AND g2 = 0 THEN 1 END) AS BIGINT)
      |      AS n_10,
      |    CAST(count(CASE WHEN g1 = 1 AND g2 = 1 THEN 1 END) AS BIGINT)
      |      AS n_11
      |  FROM pp),
      |it0 AS (SELECT *, CAST(10000 AS BIGINT) AS lam,
      |    CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
      |    CAST(100000 AS BIGINT) AS u1, CAST(100000 AS BIGINT) AS u2
      |  FROM c),
      |""".stripMargin + blocks + """
      |SELECT CAST(n_00 + n_01 + n_10 + n_11 AS BIGINT) AS n_pairs,
      |  lam AS lambda_ppm, m1 AS m1_ppm, m2 AS m2_ppm,
      |  u1 AS u1_ppm, u2 AS u2_ppm
      |FROM it2""".stripMargin
  }

  /** q274's oracle, assembled from per-tier fragments so the 3×2×3
    * conditional-aggregate block and the fixed-order float folds stay
    * mechanically in lockstep with `Behavior.postStratifiedAte`. */
  private val ateStratifiedSql: String = {
    val tiers = 0 until 3
    def sides = Seq(0 -> "a", 1 -> "b")
    val aggs = tiers.flatMap { t => sides.flatMap { case (a, s) =>
      val in = s"t = $t AND v = $a"
      Seq(s"count(CASE WHEN $in THEN 1 END) AS n_${t}_$s",
        s"coalesce(sum(CASE WHEN $in THEN CAST(m AS HUGEINT) END), 0)" +
          s" AS s1_${t}_$s",
        s"coalesce(sum(CASE WHEN $in THEN CAST(m AS HUGEINT) * m END)," +
          s" 0) AS s2_${t}_$s")
    } }.mkString(",\n    ")
    def testable(t: Int) = s"(n_${t}_a >= 2 AND n_${t}_b >= 2)"
    val nUsed = tiers.map(t => s"(CASE WHEN ${testable(t)} THEN " +
      s"n_${t}_a + n_${t}_b ELSE 0 END)").mkString(" + ")
    val nStr = tiers.map(t =>
      s"(CASE WHEN ${testable(t)} THEN 1 ELSE 0 END)").mkString(" + ")
    def w(t: Int) = s"((CAST(n_${t}_a AS DOUBLE) + " +
      s"CAST(n_${t}_b AS DOUBLE)) / CAST(nu AS DOUBLE))"
    def diff(t: Int) =
      s"(CAST(s1_${t}_b AS DOUBLE) / CAST(n_${t}_b AS DOUBLE) - " +
        s"CAST(s1_${t}_a AS DOUBLE) / CAST(n_${t}_a AS DOUBLE))"
    def vm(t: Int, s: String) =
      s"(CAST(CAST(n_${t}_$s AS HUGEINT) * s2_${t}_$s - s1_${t}_$s * " +
        s"s1_${t}_$s AS DOUBLE) / (CAST(n_${t}_$s AS DOUBLE) * " +
        s"(CAST(n_${t}_$s AS DOUBLE) - 1.0)) / CAST(n_${t}_$s AS DOUBLE))"
    val ate = tiers.map(t => s"(CASE WHEN ${testable(t)} THEN " +
      s"${w(t)} * ${diff(t)} ELSE 0.0 END)").mkString(" + ")
    val se2 = tiers.map(t => s"(CASE WHEN ${testable(t)} THEN " +
      s"${w(t)} * ${w(t)} * (${vm(t, "a")} + ${vm(t, "b")}) " +
      "ELSE 0.0 END)").mkString(" + ")
    s"""WITH pu AS (SELECT user_id % 2 AS v, user_id AS u,
       |    CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
       |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
       |  GROUP BY 1, 2),
       |pt AS (SELECT v, u, m,
       |         least(greatest(cnt - 50, 0) // 10, 2) AS t FROM pu),
       |g AS (SELECT
       |    $aggs
       |  FROM pt),
       |n0 AS (SELECT *, $nUsed AS nu, $nStr AS ns FROM g),
       |f AS (SELECT *, $ate AS ate, $se2 AS se2 FROM n0)
       |SELECT CAST(nu AS BIGINT) AS n_used, CAST(ns AS INTEGER) AS n_strata,
       |  CASE WHEN ns >= 1 THEN round(ate, 4) + 0.0 END AS ate,
       |  CASE WHEN ns >= 1 AND se2 > 0.0
       |    THEN round(sqrt(se2), 4) + 0.0 END AS se,
       |  CASE WHEN ns >= 1 AND se2 > 0.0
       |    THEN round(ate / sqrt(se2), 4) + 0.0 END AS z,
       |  CAST(coalesce(CASE WHEN abs(CASE WHEN ns >= 1 AND se2 > 0.0
       |    THEN round(ate / sqrt(se2), 4) + 0.0 END) >= 1.96
       |    THEN 1 ELSE 0 END, 0) AS INTEGER) AS significant
       |FROM f""".stripMargin
  }

  /** The one EWMA oracle recursion, shared verbatim by q269 (direct
    * form) and q270 (append/state form): the two Spark plans differ,
    * the semantics must not. ts IS NOT NULL mirrors the operators'
    * null-day drop (a NULL ts has no day; engines disagree on where a
    * NULL sorts, so it must not seed the recursion). */
  private val ewmaRecursionSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT event_type AS k,
      |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND ts IS NOT NULL
      |  GROUP BY 1, 2),
      |r0 AS (SELECT k, d, x,
      |         row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |       FROM b),
      |rec AS (
      |  SELECT k, d, x, rn, x AS s FROM r0 WHERE rn = 1
      |  UNION ALL
      |  SELECT r0.k, r0.d, r0.x, r0.rn,
      |         (1 * r0.x + 3 * rec.s) // 4
      |  FROM r0 JOIN rec ON r0.k = rec.k AND r0.rn = rec.rn + 1)
      |SELECT k, d, x, CAST(s AS BIGINT) AS ewma
      |FROM rec ORDER BY k, d""".stripMargin

  /** One k-means ASSIGNMENT CTE block: nearest centroid in `c` for every
    * vector, squared-L2 via dot products (all left folds), ties to the
    * lowest cid — the DuckDB twin of `Similarity.assignTo`. */
  private def kmeansAssignBlock(a: String, c: String,
      corpus: String = "e"): String =
    s"""$a AS (SELECT vec_id, cid FROM (
       |    SELECT $corpus.vec_id, $c.cid,
       |           row_number() OVER (PARTITION BY $corpus.vec_id ORDER BY
       |             list_dot_product($corpus.v, $corpus.v)
       |             - 2 * list_dot_product($corpus.v, $c.c)
       |             + list_dot_product($c.c, $c.c), $c.cid) AS rk
       |    FROM $corpus, $c) WHERE rk = 1)""".stripMargin

  /** One k-means UPDATE CTE block: element-wise cluster mean, rounded to
    * 6 decimals — the DuckDB twin of the Spark update step. */
  private def kmeansUpdateBlock(cOut: String, aIn: String,
      corpus: String = "e"): String =
    s"""${cOut}m AS (SELECT $aIn.cid, t.pos,
       |        round(avg($corpus.v[CAST(t.pos AS INTEGER)]), 6) AS m
       |      FROM $aIn JOIN $corpus USING (vec_id),
       |           LATERAL unnest(range(1, len($corpus.v) + 1)) t(pos)
       |      GROUP BY $aIn.cid, t.pos),
       |$cOut AS (SELECT cid, list(m ORDER BY pos) AS c FROM ${cOut}m
       |      GROUP BY cid)""".stripMargin

  /** Squared-L2 between a corpus vector `e.v` and a seed table's vector —
    * the left-fold-exact distance every k-means oracle block uses. */
  private def d2Sql(seed: String): String =
    s"list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, $seed.v)" +
      s" + list_dot_product($seed.v, $seed.v)"

  /** Farthest-first seed CTEs s1..s`k` + the init codebook `c0` — the
    * DuckDB twin of `Similarity.kmeansAssignFarthest`'s seeding. */
  private def farthestSeedsSql(k: Int): String = {
    val blocks = new scala.collection.mutable.ArrayBuffer[String]
    blocks += "s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)"
    for (i <- 2 to k) {
      val prev = (1 until i).map(j => s"s$j")
      val minD = prev.map(d2Sql) match {
        case Seq(one) => one
        case many => s"least(${many.mkString(", ")})"
      }
      blocks += s"""s$i AS (SELECT e.vec_id, e.v FROM e, ${prev.mkString(", ")}
        |      ORDER BY $minD DESC, e.vec_id LIMIT 1)""".stripMargin
    }
    blocks += (1 to k).map(i =>
      s"SELECT vec_id AS cid, v AS c FROM s$i").mkString(
      "c0 AS (", " UNION ALL ", ")")
    blocks.mkString(",\n")
  }

  /** k-means++ D²-sampling seed CTEs s1..s`k` + init codebook `c0` — the
    * DuckDB twin of `Similarity.kmeansAssignPlusPlus`'s seeding: integer
    * weights round(d²·10⁶) clamped at 0, inclusive window cumsum in
    * vec_id order, threshold (h_r · Σw) div 2³² with h_r replayed from
    * md5("kmeanspp:" + r)'s first 8 hex digits, winner = lowest vec_id
    * with cum > threshold. All integer after the row-local rounding, so
    * both engines pick identical seeds. */
  private def ppSeedsSql(k: Int): String = {
    val blocks = new scala.collection.mutable.ArrayBuffer[String]
    blocks += "s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)"
    for (i <- 2 to k) {
      val prev = (1 until i).map(j => s"s$j")
      val minD = prev.map(d2Sql) match {
        case Seq(one) => one
        case many => s"least(${many.mkString(", ")})"
      }
      val h = s"list_reduce([CAST(strpos('0123456789abcdef', c) - 1 " +
        s"AS BIGINT) for c in string_split(substr(md5('kmeanspp:$i'), " +
        "1, 8), '')], (a, b) -> a * 16 + b)"
      blocks += s"""pw$i AS (SELECT e.vec_id, e.v,
        |      greatest(CAST(round(($minD) * 1000000.0) AS BIGINT), 0) AS w
        |      FROM e, ${prev.mkString(", ")}),
        |pc$i AS (SELECT vec_id, v, sum(w) OVER (ORDER BY vec_id) AS cum,
        |      sum(w) OVER () AS tot FROM pw$i),
        |s$i AS (SELECT vec_id, v FROM pc$i
        |      WHERE cum > (CAST(($h) AS HUGEINT) * tot) // 4294967296
        |      ORDER BY vec_id LIMIT 1)""".stripMargin
    }
    blocks += (1 to k).map(i =>
      s"SELECT vec_id AS cid, v AS c FROM s$i").mkString(
      "c0 AS (", " UNION ALL ", ")")
    blocks.mkString(",\n")
  }

  /** w·x for the q145 logistic oracle — FIXED left-to-right add order,
    * bias first, mirroring `Learn.zOf`'s fold. `w`/`f` are the weight-row
    * and feature-row aliases. */
  private val lrZSql: String = "w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"

  /** Logistic-regression GD chain for the q145 oracle: expects a `feat`
    * CTE (doc_id, x1, x2, x3, y); emits w0 (zeros) then g`i`/w`i` pairs
    * up to w`iters`. Each gradient is a LONG sum of per-row integer
    * micro-gradients round((σ(z)−y)·xⱼ·10⁶) — the same partition-order-
    * proof construction as `Learn.trainLogistic`, so both engines agree
    * on every 64-bit total and hence every weight. */
  private def lrChainSql(iters: Int): String = {
    val blocks = new scala.collection.mutable.ArrayBuffer[String]
    blocks += "w0 AS (SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS w1," +
      " CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3)"
    for (i <- 1 to iters) {
      val sigma = s"1.0 / (1.0 + exp(-($lrZSql)))"
      val gs = ("1.0" +: Seq("f.x1", "f.x2", "f.x3")).zipWithIndex.map {
        case (x, j) =>
          s"sum(CAST(round(($sigma - f.y) * $x * 1000000.0) AS BIGINT)) AS g$j"
      }
      blocks += s"""g$i AS (SELECT ${gs.mkString(",\n      ")},
        |      count(*) AS n FROM feat f, w${i - 1} w),
        |w$i AS (SELECT
        |      w.b - 0.5 * (g.g0 / CAST(1000000 AS DOUBLE) / g.n) AS b,
        |      w.w1 - 0.5 * (g.g1 / CAST(1000000 AS DOUBLE) / g.n) AS w1,
        |      w.w2 - 0.5 * (g.g2 / CAST(1000000 AS DOUBLE) / g.n) AS w2,
        |      w.w3 - 0.5 * (g.g3 / CAST(1000000 AS DOUBLE) / g.n) AS w3
        |      FROM w${i - 1} w, g$i g)""".stripMargin
    }
    blocks.mkString(",\n")
  }

  /** Product-quantization chain for the q146 oracle: per subspace j,
    * slice CTE e`j` (1-based inclusive list slice = Spark's slice), init
    * codebook from the k lowest vec_ids, one assign→update Lloyd step,
    * final assignment — all via the q136-proven blocks parameterized on
    * the subspace corpus. */
  private def pqChainSql(m: Int = 4, w: Int = 16, k: Int = 8): String = {
    val blocks = new scala.collection.mutable.ArrayBuffer[String]
    blocks += "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v" +
      " FROM embeddings)"
    for (j <- 1 to m) {
      val lo = (j - 1) * w + 1
      blocks += s"e$j AS (SELECT vec_id, v[$lo:${j * w}] AS v FROM e)"
      blocks += s"p${j}c0 AS (SELECT vec_id AS cid, v AS c FROM e$j" +
        s" ORDER BY vec_id LIMIT $k)"
      blocks += kmeansAssignBlock(s"p${j}a1", s"p${j}c0", s"e$j")
      blocks += kmeansUpdateBlock(s"p${j}c1", s"p${j}a1", s"e$j")
      blocks += kmeansAssignBlock(s"p${j}a2", s"p${j}c1", s"e$j")
    }
    "WITH " + blocks.mkString(",\n")
  }

  /** BM25 scoring chain shared by the q144 and q164 oracles: all counts
    * (N, df, tf, Σdl) are exact integers; the per-(doc,term) contribution
    * is row-local double math rounded to an integer micro-score; the
    * per-doc sum is a LONG sum (partition-order proof). Float literals
    * are forced to DOUBLE context (a bare DuckDB decimal literal op an
    * INTEGER stays DECIMAL); (CAST(1.2 AS DOUBLE) + 1.0) replays Scala's
    * k1 + 1.0 bit-exactly. Ends at `score` = (doc_id, bm25). */
  private val bm25ChainSql: String =
    """WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                     len(string_split(text, ' ')) AS dl
      |              FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM base),
      |q(term) AS (VALUES ('dup'), ('vector'), ('stream')),
      |tfh AS (SELECT doc_id, dl, term,
      |               len(list_filter(toks, x -> x = term)) AS tf
      |        FROM base, q
      |        WHERE len(list_filter(toks, x -> x = term)) > 0),
      |dfs AS (SELECT term, count(*) AS df FROM tfh GROUP BY term),
      |contrib AS (SELECT t.doc_id,
      |    CAST(round(
      |      ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5)
      |                / (CAST(f.df AS DOUBLE) + 0.5))
      |      * t.tf * (CAST(1.2 AS DOUBLE) + 1.0)
      |      / (t.tf + 1.2 * (0.25 + 0.75 * CAST(t.dl AS DOUBLE)
      |                       / (s.total_len / CAST(s.n_docs AS DOUBLE))))
      |      * 1000000.0) AS BIGINT) AS w
      |    FROM tfh t JOIN dfs f USING (term), stats s),
      |score AS (SELECT b.doc_id,
      |            coalesce(sum(c.w), 0) / CAST(1000000 AS DOUBLE) AS bm25
      |          FROM base b LEFT JOIN contrib c USING (doc_id)
      |          GROUP BY b.doc_id)""".stripMargin

  /** BPE merge-round chain for the q147 oracle: v0 = word-frequency
    * vocab, s0 = char-split symbol sequences; each round counts adjacent
    * pairs (freq-weighted exact long sums), picks the (f DESC, l, r)
    * argmax, and applies the merge via list_reduce — the accumulator is
    * the space-joined symbol string, and appending `r` with no separator
    * when the last symbol equals `l` replays Spark's `aggregate` fold
    * exactly (leftmost-first non-overlapping merge). */
  private def bpeChainSql(rounds: Int): String = {
    val blocks = new scala.collection.mutable.ArrayBuffer[String]
    blocks += """v0 AS (SELECT word, count(*) AS freq
      |      FROM (SELECT unnest(string_split(text, ' ')) AS word
      |            FROM documents)
      |      WHERE word <> '' GROUP BY word)""".stripMargin
    blocks += "s0 AS (SELECT word, freq, " +
      "array_to_string(string_split(word, ''), ' ') AS seq FROM v0)"
    for (i <- 1 to rounds) {
      blocks += s"""p$i AS (SELECT t.toks[CAST(u.j AS INTEGER)] AS l,
        |      t.toks[CAST(u.j + 1 AS INTEGER)] AS r, sum(t.freq) AS f
        |      FROM (SELECT freq, string_split(seq, ' ') AS toks
        |            FROM s${i - 1}) t,
        |           LATERAL unnest(range(1, len(t.toks))) u(j)
        |      GROUP BY 1, 2)""".stripMargin
      blocks += s"m$i AS (SELECT l, r, f FROM p$i ORDER BY f DESC, l, r LIMIT 1)"
      // LEFT JOIN + the m.l IS NULL passthrough mirror the Spark side's
      // pair.nonEmpty guard: an empty merge round (no adjacent pair left
      // anywhere — degenerate all-single-char vocab) leaves the seqs
      // unchanged instead of emptying every downstream s-table (ADVICE r6)
      blocks += s"""s$i AS (SELECT s.word, s.freq,
        |      CASE WHEN m.l IS NULL
        |             OR len(string_split(s.seq, ' ')) = 1 THEN s.seq
        |      ELSE list_reduce(string_split(s.seq, ' '),
        |        (a, x) -> CASE WHEN x = m.r AND (a = m.l OR a LIKE '% ' || m.l)
        |                  THEN a || x ELSE a || ' ' || x END) END AS seq
        |      FROM s${i - 1} s LEFT JOIN m$i m ON TRUE)""".stripMargin
    }
    "WITH " + blocks.mkString(",\n")
  }

  /** k=8, iters=2 Lloyd chain ending in the final assignment `a3` —
    * shared by the q136 and q137 oracles. */
  private def kmeansChainSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS c FROM e ORDER BY vec_id LIMIT 8),
       |${kmeansAssignBlock("a1", "c0")},
       |${kmeansUpdateBlock("c1", "a1")},
       |${kmeansAssignBlock("a2", "c1")},
       |${kmeansUpdateBlock("c2", "a2")},
       |${kmeansAssignBlock("a3", "c2")}""".stripMargin

  /** Shared DuckDB oracle for exact trigram-shingle Jaccard pairs (and for
    * the exact-verified MinHash+LSH variant, whose result coincides). */
  /** DuckDB twin of `graft.plans.RollingHash` — one definition for every
    * oracle that depends on the content hash (fingerprint, split
    * assignment, contamination, domain mixing), so a change to
    * `RollingHash.compute` has exactly one SQL string to keep in
    * lockstep. */
  private def rollingHashSql(col: String): String =
    s"list_reduce([ascii(c) for c in string_split($col, '')], " +
      "(a, b) -> (CAST(a AS BIGINT) * 31 + b) % 2147483647)"

  private val jaccardOracle: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |     for i in range(1, len(toks) - 1)])) AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle
      |                              AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       round(c / (sa.n_sh + sb.n_sh - c), 4) AS jaccard
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** One q226/q248 MMR greedy stage: candidates = pool minus already-
    * selected, marginal = 7·rel − 3·max(sim to any selected) (integer,
    * λ = 7/10 in 1e-4 units), argmax with vec_id tiebreak — the DuckDB
    * twin of one iteration of `Similarity.mmrGreedy`. */
  private def mmrStage(ci: String, si: String, selPrev: String,
      pool: String = "mpool", sims: String = "msims"): String =
    s"""$ci AS (SELECT p.vec_id, p.rel,
       |        7 * p.rel - 3 * max(s.sim) AS mmr
       |      FROM $pool p JOIN $sims s ON s.sa = p.vec_id
       |      WHERE s.sb IN (SELECT vec_id FROM $selPrev)
       |        AND p.vec_id NOT IN (SELECT vec_id FROM $selPrev)
       |      GROUP BY p.vec_id, p.rel),
       |$si AS (SELECT vec_id, rel, mmr FROM $ci
       |      ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin

  /** The per-query CTE block of q248's batch-MMR oracle: scored pool,
    * pairwise sims, and the 3 unrolled greedy stages for one qid. */
  private def mmrBatchBlock(t: String, qid: Long): String =
    s"""q$t AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |        FROM embeddings WHERE vec_id = $qid),
       |pool$t AS (SELECT e.vec_id,
       |        CAST(round(list_dot_product(CAST(e.embedding
       |            AS DOUBLE[]), q$t.qv) /
       |          (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
       |            CAST(e.embedding AS DOUBLE[]))) *
       |           sqrt(list_dot_product(q$t.qv, q$t.qv))) * 10000, 0)
       |          AS BIGINT) AS rel,
       |        CAST(e.embedding AS DOUBLE[]) AS v
       |      FROM embeddings e, q$t WHERE e.vec_id <> $qid
       |      ORDER BY rel DESC, e.vec_id LIMIT 10),
       |sims$t AS (SELECT a.vec_id AS sa, b.vec_id AS sb,
       |        CAST(round(list_dot_product(a.v, b.v) /
       |          (sqrt(list_dot_product(a.v, a.v)) *
       |           sqrt(list_dot_product(b.v, b.v))) * 10000, 0)
       |          AS BIGINT) AS sim
       |      FROM pool$t a JOIN pool$t b ON a.vec_id <> b.vec_id),
       |s${t}1 AS (SELECT vec_id, rel, 7 * rel AS mmr FROM pool$t
       |       ORDER BY rel DESC, vec_id LIMIT 1),
       |sel${t}1 AS (SELECT vec_id FROM s${t}1),
       |${mmrStage(s"c${t}2", s"s${t}2", s"sel${t}1", s"pool$t", s"sims$t")},
       |sel${t}2 AS (SELECT vec_id FROM sel${t}1
       |         UNION ALL SELECT vec_id FROM s${t}2),
       |${mmrStage(s"c${t}3", s"s${t}3", s"sel${t}2", s"pool$t", s"sims$t")}""".stripMargin

  /** One q250 k-core PEEL round: drop nodes under degree `k` in the
    * round's edge set, keep only edges between survivors — the DuckDB
    * twin of one `Graph.kCore` iteration; a converged graph passes
    * through unchanged, so unrolling a FIXED round count equals the
    * Spark side's converged-within-that-count fixpoint. */
  private def kCorePeel(i: Int, k: Int): String =
    s"""n$i AS MATERIALIZED (SELECT node FROM
       |        (SELECT a AS node FROM e${i - 1}
       |          UNION ALL SELECT b FROM e${i - 1})
       |        GROUP BY 1 HAVING count(*) >= $k),
       |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
       |        WHERE a IN (SELECT node FROM n$i)
       |          AND b IN (SELECT node FROM n$i))""".stripMargin

  /** Cosine spelled out with sequential dot products — the exact formula
    * the Spark side computes, so doubles agree bit-for-bit pre-round. */
  private val cosSql: String =
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), qv) / " +
      "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), " +
      "CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(qv, qv)))"
}
