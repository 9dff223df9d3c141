package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's whole pipeline in one expression — JSON parse →
    * stream-static enrich → event-time tumbling window — run in batch;
    * the identical transforms drive the streaming path
    * (graft.streaming.StreamPipelines.endToEnd). */
  def entry(spark: SparkSession): DataFrame = {
    // entry() is called with the DRIVER's session, which has not been
    // through our builders — set the conf events.parquet needs
    // (TIMESTAMP(NANOS)) before the scan's schema is resolved
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, dir)
    val dim = graft.core.Tables.customer(spark, dir)
    graft.streaming.StreamPipelines.endToEnd(events, dim)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q1_pricing_summary"     -> (Relational.q1PricingSummary _),
    "q3_top_unshipped"       -> (Relational.q3TopUnshipped _),
    "q5_region_revenue"      -> (Relational.q5RegionRevenue _),
    "top_parts_by_revenue"   -> (Relational.topPartsByRevenue _),
    "window_rank_suppliers"  -> (Relational.windowRankSuppliers _),
    "semi_anti_join"         -> (Relational.semiAntiJoin _),
    "value_percentiles"      -> (Relational.valuePercentiles _),
    "rollup_revenue"         -> (Relational.rollupRevenue _),
    "cube_segment_revenue"   -> (Relational.cubeSegmentRevenue _),
    "pivot_segment_revenue"  -> (Relational.pivotSegmentRevenue _),
    "unpivot_revenue"        -> (Relational.unpivotSegmentRevenue _),
    "q17_small_qty_revenue"  -> (Relational.q17SmallQtyRevenue _),
    "q4_order_priority"      -> (Relational.q4OrderPriority _),
    "q13_customer_distribution" -> (Relational.q13CustomerDistribution _),
    "q18_large_orders"       -> (Relational.q18LargeOrders _),
    "q22_global_sales"       -> (Relational.q22GlobalSales _),
    "q7_nation_trade"        -> (Relational.q7NationTrade _),
    "q6_forecast_revenue"    -> (Relational.q6Revenue _),
    "q10_returned_items"     -> (Relational.q10ReturnedItems _),
    "grouping_sets_revenue"  -> (Relational.groupingSetsRevenue _),
    "range_join_bins"        -> (Relational.rangeJoinBins _),
    "bloom_semi_join"        -> (BloomJoin.bloomSemiJoinQuery _),
    "zorder_key"             -> (LayoutOps.zorderKeyQuery _),
    "fuzzy_name_pairs"       -> (FuzzyJoin.fuzzyNamePairsQuery _),
    "variant_props_stats"    -> (SemiStructured.variantPropsStats _),
    "variant_shape_stats"    -> (SemiStructured.variantShapeStats _),
    "variant_explode_items"  -> (SemiStructured.variantExplodeItems _),
    "variant_open_fields"    -> (SemiStructured.variantOpenFields _),
    // remaining TPC-H shapes (all 22 now covered; see TpchExtra)
    "q2_min_cost_supplier"   -> (TpchExtra.q2MinCostSupplier _),
    "q8_market_share"        -> (TpchExtra.q8MarketShare _),
    "q9_product_profit"      -> (TpchExtra.q9ProductProfit _),
    "q11_important_parts"    -> (TpchExtra.q11ImportantParts _),
    "q12_ship_priority"      -> (TpchExtra.q12ShipPriority _),
    "q14_promo_revenue"      -> (TpchExtra.q14PromoRevenue _),
    "q15_top_supplier"       -> (TpchExtra.q15TopSupplier _),
    "q16_supplier_part_counts" -> (TpchExtra.q16SupplierPartCounts _),
    "q19_disjunctive_revenue" -> (TpchExtra.q19DisjunctiveRevenue _),
    "q20_promo_suppliers"    -> (TpchExtra.q20PromoSuppliers _),
    "q21_waiting_suppliers"  -> (TpchExtra.q21WaitingSuppliers _),
    // reference-derived sensor pipeline
    "json_flatten"           -> (SensorPipeline.jsonFlattenQuery _),
    "ts_parse_format"        -> (SensorPipeline.tsParseFormatQuery _),
    "enrich_join"            -> (SensorPipeline.enrichJoinQuery _),
    "udf_double_string"      -> (SensorPipeline.udfDoubleStringQuery _),
    "to_json_struct"         -> (SensorPipeline.toJsonStructQuery _),
    "typed_filter_map"       -> (SensorPipeline.typedFilterMapQuery _),
    "asof_join"              -> (AsofJoin.asofLatestOrderQuery _),
    "asof_join_forward"      -> (AsofJoin.asofNextOrderQuery _),
    "asof_join_nearest"      -> (AsofJoin.asofNearestOrderQuery _),
    "rolling_median"         -> (Timeseries.rollingMedianQuery _),
    "zipf_fit"               -> (CorpusStats.zipfFitQuery _),
    "heaps_fit"              -> (CorpusStats.heapsFitQuery _),
    "span_corruption_plan"   -> (TextAnalysis.spanCorruptionPlanQuery _),
    // windows / state
    "tumbling_window"        -> (Windows.tumblingQuery _),
    "sliding_window"         -> (Windows.slidingQuery _),
    "session_window_agg"     -> (Windows.sessionizedQuery _),
    "stateful_running_count" -> (Windows.statefulRunningCountQuery _),
    "event_gap_quartiles"    -> (Windows.eventGapQuartilesQuery _),
    "funnel_conversion"      -> (Windows.funnelConversionQuery _),
    "trailing_hour_stats"    -> (Windows.trailingHourStatsQuery _),
    "wordcount"              -> (Windows.wordCountQuery _),
    // CDC / time-series maintenance
    "scd2_intervals"         -> (Cdc.scd2IntervalsQuery _),
    "merge_upserts"          -> (Cdc.mergeUpsertsQuery _),
    "gap_fill_daily"         -> (Timeseries.gapFillDailyQuery _),
    "outlier_events"         -> (Timeseries.outlierEventsQuery _),
    "mad_outliers"           -> (Timeseries.madOutliersQuery _),
    "rate_spikes"            -> (Timeseries.rateSpikesQuery _),
    "ewma_smooth"            -> (Timeseries.ewmaSmoothQuery _),
    "resample_ohlc"          -> (Timeseries.resampleOhlcQuery _),
    "corpus_checksum"        -> (Cdc.corpusChecksumQuery _),
    // product analytics over the event log
    "session_paths"          -> (ProductAnalytics.sessionPathsQuery _),
    "retention_cohorts"      -> (ProductAnalytics.retentionCohortsQuery _),
    "value_histogram"        -> (ProductAnalytics.valueHistogramQuery _),
    "attribution_first_last" -> (ProductAnalytics.attributionFirstLastQuery _),
    "event_pagerank"         -> (GraphRank.eventPageRankQuery _),
    "token_triangles"        -> (GraphRank.tokenTrianglesQuery _),
    "token_communities"      -> (GraphRank.tokenCommunitiesQuery _),
    "token_kcore"            -> (GraphRank.tokenKcoreQuery _),
    // LLM-data-pipeline: text analysis
    "dedup_exact"            -> (TextAnalysis.dedupExactQuery _),
    "dedup_exact_norm"       -> (TextAnalysis.dedupExactNormQuery _),
    "temperature_sample"     -> (TextAnalysis.temperatureSampleQuery _),
    "text_quality"           -> (TextAnalysis.textQualityQuery _),
    "lang_id"                -> (TextAnalysis.langIdQuery _),
    "lang_id_ngram"          -> (TextAnalysis.langIdNgramQuery _),
    "token_count"            -> (TextAnalysis.tokenCountQuery _),
    "doc_fingerprint"        -> (TextAnalysis.docFingerprintQuery _),
    "curation_summary"       -> (TextAnalysis.curationSummaryQuery _),
    "pack_token_budget"      -> (TextAnalysis.packTokenBudgetQuery _),
    "pack_token_budget_sharded" -> (TextAnalysis.packTokenBudgetShardedQuery _),
    "pack_token_budget_global" -> (TextAnalysis.packTokenBudgetGlobalQuery _),
    "pack_materialize"       -> (TextAnalysis.materializePacksQuery _),
    "chunk_tokens"           -> (TextAnalysis.chunkTokensQuery _),
    "keyword_extract"        -> (TextAnalysis.keywordExtractQuery _),
    "cap_per_source"         -> (TextAnalysis.capPerSourceQuery _),
    "repetition_stats"       -> (TextAnalysis.repetitionStatsQuery _),
    "source_stats"           -> (TextAnalysis.sourceStatsQuery _),
    "blocklist_redact"       -> (TextAnalysis.blocklistRedactQuery _),
    "pii_redact"             -> (TextAnalysis.piiRedactQuery _),
    "upsample_mixture"       -> (TextAnalysis.upsampleMixtureQuery _),
    "stratified_sample"      -> (TextAnalysis.stratifiedSampleQuery _),
    "holdout_split"          -> (TextAnalysis.holdoutSplitQuery _),
    "weighted_sample"        -> (TextAnalysis.weightedSampleQuery _),
    "shuffle_shards"         -> (TextAnalysis.shuffleShardsQuery _),
    "corpus_prep"            -> (CorpusPrep.corpusPrepQuery _),
    "bm25_topk"              -> (Retrieval.bm25TopKQuery _),
    "hybrid_rrf_topk"        -> (Retrieval.hybridRrfTopKQuery _),
    "lm_surprisal"           -> (QualityModels.lmSurprisalQuery _),
    "quality_floor_per_source" -> (QualityModels.qualityFloorPerSourceQuery _),
    "dsir_importance"        -> (QualityModels.dsirImportanceQuery _),
    "gopher_rules"           -> (QualityModels.gopherRulesQuery _),
    "quality_logreg"         -> (QualityModels.qualityLogregQuery _),
    "winnowing_fingerprint"  -> (Winnowing.winnowingFingerprintQuery _),
    "source_jaccard"         -> (CorpusStats.sourceJaccardQuery _),
    "embed_centroid_drift"   -> (CorpusStats.centroidDriftQuery _),
    "embed_centroid_outliers" -> (CorpusStats.centroidOutliersQuery _),
    "knn_graph"              -> (Similarity.knnGraphQuery _),
    "winnow_pairs"           -> (Winnowing.winnowPairsQuery _),
    "lsh_recall_eval"        -> (Dedup.lshRecallEvalQuery _),
    "tau_sweep"              -> (Dedup.tauSweepQuery _),
    "score_auc_eval"         -> (QualityModels.scoreAucEvalQuery _),
    "quality_train"          -> (QualityModels.qualityTrainQuery _),
    "score_auc_trained"      -> (QualityModels.scoreAucTrainedQuery _),
    "score_percentile_norm"  -> (QualityModels.scorePercentileNormQuery _),
    "embed_norm_qc"          -> (Similarity.embedNormQcQuery _),
    "embed_exact_dups"       -> (Similarity.embedExactDupsQuery _),
    "top_component"          -> (Similarity.topComponentQuery _),
    "meta_consistency"       -> (CorpusStats.metaConsistencyQuery _),
    "cluster_size_stats"     -> (Dedup.clusterSizeStatsQuery _),
    "fk_integrity"           -> (IntegrityAudit.fkIntegrityQuery _),
    "out_of_order_stats"     -> (Timeseries.outOfOrderStatsQuery _),
    "doc_novelty"            -> (CorpusStats.docNoveltyQuery _),
    "tokenizer_fertility"    -> (CorpusStats.tokenizerFertilityQuery _),
    "ann_recall_eval"        -> (Similarity.annRecallEvalQuery _),
    "bigram_surprisal"       -> (QualityModels.bigramSurprisalQuery _),
    "bigram_surprisal_kn"    -> (QualityModels.bigramSurprisalKnQuery _),
    "lm_heldout_bigram"      -> (QualityModels.lmHeldoutBigramQuery _),
    "vocab_kl_drift"         -> (QualityModels.vocabKlDriftQuery _),
    // LLM-data-pipeline: near-dup detection
    "dedup_ngram_jaccard"    -> (Dedup.ngramJaccardQuery _),
    "dedup_containment"      -> (Dedup.containmentQuery _),
    "dedup_minhash_lsh"      -> (Dedup.minhashLshQuery _),
    "dedup_simhash"          -> (Dedup.simhashQuery _),
    "dedup_clusters"         -> (Dedup.dedupClustersQuery _),
    "dedup_canonical_quality" -> (Dedup.dedupClustersByQualityQuery _),
    "corpus_diff"            -> (Dedup.corpusDiffQuery _),
    "ngram_stats"            -> (Dedup.ngramStatsQuery _),
    "benchmark_decontam"     -> (Dedup.decontaminateQuery _),
    "decontam_report"        -> (Dedup.decontamReportQuery _),
    "decontam_bloom"         -> (Dedup.decontaminateBloomQuery _),
    "decontam_spans"         -> (Dedup.decontamSpansQuery _),
    "incremental_dedup"      -> (Dedup.incrementalDedupQuery _),
    "segment_dedup"          -> (Dedup.segmentDedupQuery _),
    "dup_spans"              -> (Dedup.dupSpansQuery _),
    "dup_spans_redact"       -> (Dedup.dupSpansRedactQuery _),
    "dup_by_source"          -> (Dedup.dupBySourceQuery _),
    "dup_spans_exact"        -> (Dedup.dupSpansExactQuery _),
    "tfidf_cosine_pairs"     -> (TfIdfSim.tfidfCosinePairsQuery _),
    // LLM-data-pipeline: embedding similarity
    "embed_cosine_neardup"   -> (Similarity.cosineNearDupQuery _),
    "embed_clusters"         -> (Similarity.embedClustersQuery _),
    "cluster_purity"         -> (Similarity.clusterPurityQuery _),
    "semdedup"               -> (Similarity.semDedupQuery _),
    "ann_cosine_topk"        -> (Similarity.annCosineTopKQuery _),
    "ann_hard_negatives"     -> (Similarity.annHardNegativesQuery _),
    "kcenter_coreset"        -> (Similarity.kcenterCoresetQuery _),
    "mmr_diversify"          -> (Similarity.mmrDiversifyQuery _),
    "ann_lsh_topk"           -> (Similarity.annLshTopKQuery _),
    "ann_ivf_topk"           -> (Similarity.annIvfTopKQuery _),
    "ann_ivf_topk_trained"   -> (Similarity.annIvfTopKTrainedQuery _),
    "knn_graph_clusters"     -> (Similarity.knnGraphClustersQuery _),
    "knn_graph_refine"       -> (Similarity.knnGraphRefineQuery _),
    "knn_refine_recall"      -> (Similarity.knnRefineRecallQuery _),
    "ann_recall_trained"     -> (Similarity.annRecallTrainedQuery _),
    "embed_quantize_int8"    -> (Similarity.quantizeInt8Query _),
    "embed_project_srp"      -> (Similarity.embedProjectSrpQuery _),
    "ann_int8_topk"          -> (Similarity.annInt8TopKQuery _),
    "ann_rerank_topk"        -> (Similarity.annRerankTopKQuery _),
    "ann_pq_topk"            -> (Similarity.annPqTopKQuery _),
    "ann_ivf_rerank_topk"    -> (Similarity.annIvfRerankTopKQuery _),
    "ann_ivf_from_index"     -> (Similarity.annIvfFromIndexQuery _),
    "embed_decontam"         -> (Similarity.embedDecontamQuery _),
    "embed_decontam_lsh"     -> (Similarity.embedDecontamLshQuery _),
    // LLM-data-pipeline: multimodal plumbing (stubbed decode)
    "multimodal_meta"        -> (Multimodal.multimodalMetaQuery _),
    "multimodal_resize"      -> (Multimodal.multimodalResizeQuery _),
    "multimodal_framesample" -> (Multimodal.multimodalFrameSampleQuery _),
    "multimodal_patchgrid"   -> (Multimodal.multimodalPatchGridQuery _),
    "multimodal_audiochunks" -> (Multimodal.multimodalAudioChunkQuery _),
    "multimodal_decode_png"  -> (Multimodal.multimodalDecodePngQuery _),
    "multimodal_decode_jpeg" -> (Multimodal.multimodalDecodeJpegQuery _),
    "multimodal_decode_wav"  -> (Multimodal.multimodalDecodeWavQuery _),
    "multimodal_phash"       -> (Multimodal.multimodalPhashQuery _),
    "multimodal_phash_pairs" -> (Multimodal.multimodalPhashPairsQuery _),
    "corpus_card"            -> (CorpusStats.corpusCardQuery _),
    "bpe_train"              -> (BpeTrain.trainBpeQuery _),
    "bpe_encode"             -> (BpeTrain.bpeEncodeQuery _),
    "bpe_vocab"              -> (BpeTrain.bpeVocabQuery _),
    "bpe_byte_train"         -> (BpeTrain.bpeByteTrainQuery _),
    "bpe_byte_encode"        -> (BpeTrain.bpeByteEncodeQuery _),
    "unigram_lm_train"       -> (UnigramLm.unigramTrainQuery _),
    "unigram_encode"         -> (UnigramLm.unigramEncodeQuery _),
    "tokenizer_compare"      -> (UnigramLm.tokenizerCompareQuery _),
    "unigram_vocab_curve"    -> (UnigramLm.unigramVocabCurveQuery _),
    "mixture_plan"           -> (MixturePlan.mixturePlanQuery _),
    "mixture_plan_domains"   -> (MixturePlan.mixturePlanDomainsQuery _),
    "mixture_plan_clusters"  -> (MixturePlan.mixturePlanClustersQuery _),
    "vocab_coverage"         -> (CorpusStats.vocabCoverageQuery _),
    "ann_matryoshka_recall"  -> (Similarity.annMatryoshkaRecallQuery _),
    "decontam_redact"        -> (Dedup.decontamRedactQuery _),
    "quality_calibration"    -> (QualityModels.qualityCalibrationQuery _),
    "quality_calibrated"     -> (QualityModels.qualityCalibratedQuery _),
    "ann_ivf_pq_topk"        -> (Similarity.annIvfPqTopKQuery _),
    "ann_ivf_pq_trained"     -> (Similarity.annIvfPqTrainedQuery _),
    "ann_ivf_pq_residual"    -> (Similarity.annIvfPqResidualTopKQuery _),
    "ann_ivf_pq_residual_trained" -> (Similarity.annIvfPqResidualTrainedQuery _),
    "ann_ivf_pq_residual_index" -> (Similarity.annIvfPqResidualFromIndexQuery _),
    "ann_ivf_pq_residual_int4" -> (Similarity.annIvfPqResidualInt4Query _),
    "pq_residual_recall"     -> (Similarity.pqResidualRecallQuery _),
    "rerank_budget_recall"   -> (Similarity.rerankBudgetRecallQuery _),
    "ann_pq_int4_topk"       -> (Similarity.annPqInt4TopKQuery _),
    "pq_int4_recall"         -> (Similarity.pqInt4RecallQuery _),
    "pq_residual_trained_recall" -> (Similarity.pqResidualTrainedRecallQuery _),
    "ann_pq_trained"         -> (Similarity.annPqTrainedQuery _),
    "pq_train_recall"        -> (Similarity.pqTrainRecallQuery _),
    "lm_heldout_eval"        -> (QualityModels.lmHeldoutEvalQuery _),
    "embed_matryoshka_truncate" -> (Similarity.embedMatryoshkaTruncateQuery _),
  )

  /** DuckDB oracle SQL per query key (same parquet tables by name).
    * Every query — including the LSH ANN path (plane matrix embedded
    * as SQL literals) and the multimodal stub (deterministic byte
    * arithmetic) — is oracle-checked. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TpchExtra.oracles ++ SensorPipeline.oracles ++
      Windows.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ AsofJoin.oracles ++
      CorpusPrep.oracles ++ BloomJoin.oracles ++ LayoutOps.oracles ++
      FuzzyJoin.oracles ++ SemiStructured.oracles ++ Cdc.oracles ++
      Timeseries.oracles ++ ProductAnalytics.oracles ++
      Retrieval.oracles ++ QualityModels.oracles ++ TfIdfSim.oracles ++
      GraphRank.oracles ++ Winnowing.oracles ++ CorpusStats.oracles ++
      IntegrityAudit.oracles ++ BpeTrain.oracles ++ MixturePlan.oracles ++
      UnigramLm.oracles
}
