"""Regenerate the PLANS.md physical-plan audit table (round 4, sf0.1)."""
import re
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from codex_africanus_spark.queries import registry

QUERIES = [
    "predict_vis_point_gauss", "predict_full_corr_2x2",
    "corrupt_vis_apply_gains", "time_and_channel_average",
    "uv_grid_histogram", "q1_pricing_summary", "q3_shipping_priority",
    "q5_region_revenue", "topk_parts_by_revenue", "events_tumbling_window",
    "time_index_dense_rank", "minhash_lsh_near_dup_pairs",
    "embedding_cosine_topk", "events_sessionize_relational",
    "rime_compiled_predict", "kmv_theta_distinct_customers", "ann_ivf_topk",
    "approx_percentile_price", "compute_and_corrupt_vis_dde",
    "gp_phase_screen_corrupt", "chunk_dedup_corpus", "eval_decontamination",
    "events_asof_prior_join", "winnowing_fingerprints", "sequence_packing",
    "unigram_logprob_quality", "tfidf_top_terms",
    # round-4 additions
    "hll_sketch_distinct_parts", "hll_union_rollup", "ann_ivf_recall_eval",
    "asof_freq_grid_interp",
    # round-4 continuation additions
    "semantic_dedup_embeddings", "quality_classifier_scores",
    "quality_classifier_source_rollup", "zipf_lexical_stats",
    "source_overlap_matrix", "events_attribution_interval_join",
    "curation_funnel_multimodal", "kmv_intersection_customers",
    "events_funnel_conversion", "events_cohort_retention",
    "lang_id_confusion_matrix", "events_pivot_weekday",
    "events_value_deciles", "ann_pq_topk", "cms_token_frequency",
    "fuzzy_name_match_pairs", "events_gap_fill_daily",
    "events_json_props_stats", "snapshot_merge_upsert",
    # round-4 session additions
    "bpe_pair_merge_counts", "bigram_surprisal_quality",
    "mixture_temperature_weights", "bloom_source_overlap",
    "lsh_dedup_pr_eval", "kmeans_lloyd_stats", "pii_redaction_stats",
    "lsh_candidates_horizon", "pagerank_lsh_graph",
    "weighted_sample_documents", "clean_restore_image",
    # round-5 additions
    "rephase_visibilities", "ms_row_average_full",
    "time_and_channel_average_full", "bda_sinc_decorrelation",
    "closure_phases_triangles", "antenna_flag_statistics",
    "rfi_zscore_flag_report", "uvlin_continuum_subtract",
    "bandpass_autocorr_estimate", "fit_delay_phase_slope",
    "stokes_general_circular_subset", "sliding_window_chunks",
    "kmeans_nscaled_stats", "quality_threshold_sweep",
    "token_budget_selection", "trigram_backoff_quality",
    "cms_heavy_hitter_users", "clean_restore_beam_sweep",
    "ann_ivf_persisted_topk", "ann_pq_persisted_topk",
    # round-6 additions
    "fringe_fit_delay_rate", "gains_time_linear_interp",
    "spi_weighted_binned_fit", "flag_occupancy_waterfall",
    "hanning_smooth_spectra", "vis_noise_estimate_diffchan",
    "contamination_span_report", "stratified_eval_split",
    "dsir_importance_weights", "ann_recall_vs_probes_sweep",
    "ann_sq8_recall_eval", "containment_dup_pairs",
    "ngram_novelty_scores", "oov_rate_scores",
    "beam_stokes_dde_predict", "bm25_keyword_topk",
    "pmi_collocations_topk", "char_trigram_entropy",
    "prefix_filter_jaccard_join", "lsh_band_bucket_stats",
    "dedup_storage_savings", "uvdist_radial_profile",
    "redundant_baseline_average", "baseline_observation_segments",
    "antenna_elevation_flags",
    "simhash_hamming_histogram", "dup_cluster_size_histogram",
    "wstack_plane_occupancy", "briggs_robust_sweep", "bda_smearing_report",
    "lm_train_test_gap", "beam_pointing_error_sampling",
    "embedding_pca_power_iteration", "minhash_calibration_curve",
    "length_quality_correlation", "beam_dde_full_predict",
    # round-7 additions
    "rime_custom_term_predict", "incremental_dedup_ingest",
    "ann_ivf_pq_persisted_topk", "contamination_run_diff",
    "facet_wproj_kernel_sweep", "closure_amplitudes_quads",
    "airmass_opacity_correction", "polarization_leakage_apply",
    "bandpass_curvature_fit", "scan_time_average",
    "noise_weighted_average", "distinctive_ngrams_by_source",
    "length_outliers_mad", "simhash_bit_balance_report",
    "ngram_coverage_curve", "dead_antenna_detection", "quack_flagging",
    "fringe_stop_apply", "sefd_sensitivity_report",
    "embedding_norm_outliers", "lexical_diversity_by_source",
    "winnowing_density_sweep", "template_cohort_quality",
    "uvw_closure_residuals", "autocorr_power_ratio",
    "peel_brightest_source", "token_length_histogram",
    "source_quality_drift",
    # round-7 late additions
    "snapshot_zorder_uv_box_scan", "incremental_dedup_rank_drift",
    "spectral_regrid_linear", "rag_document_retrieval_topk",
    "jaccard_threshold_sweep", "uv_annulus_noise_profile",
    "ivf_cell_label_purity", "primary_beam_attenuation_map",
    "observation_summary_listing", "flag_reason_breakdown",
    "cross_source_template_matrix", "stopword_profile_by_lang",
    # round-8 additions
    "bda_salted_average", "dedup_index_rebuild",
    "rime_custom_transformer_predict", "faceted_mosaic_predict",
    "ann_ivf_appended_topk", "van_vleck_correction",
    "redundant_baseline_groups", "lst_binning", "hour_angle_coverage",
    "faraday_rm_correction", "suffix_prefix_stitch_pairs",
    "knn_graph_degree_stats", "domain_balance_gini",
    "mixture_temperature_reweighting", "tokens_per_byte_by_source",
    "delay_spectrum_per_baseline", "lsh_params_planner",
    "band_edge_flagging", "coherence_time_estimate",
    "duplicate_text_cross_lang",
    # round-8 wave 2-4 additions
    "sumthreshold_rfi_flags", "flag_grow_extend", "flagged_channel_interp",
    "uv_taper_response", "contrastive_triplet_mining",
    "classifier_reliability_bins", "events_rfm_segmentation",
    "events_markov_transitions", "dft_image_pbcor", "mfs_taylor_term_grids",
    "gain_solution_qa_report", "rag_context_packing",
    "antenna_delay_decomposition", "filter_rule_ablation_matrix",
    "label_centroid_similarity_matrix", "events_rate_burst_flags",
    "snapshot_compaction_scan", "mfs_alpha_map", "events_hazard_curve",
    "multimodal_av_align_asof", "baseline_weighted_median_amp",
    # round-9 additions
    "ann_pq_appended_topk", "multi_field_gain_predict",
    "heldout_perplexity_topk", "spw_aware_regrid", "uv_coverage_entropy",
    "heaps_law_vocab_growth", "multimodal_frame_dedup", "events_top_paths",
    "uvw_from_antenna_positions", "vis_model_chi2_report",
    "quality_vs_dedup_interaction", "snapshot_schema_evolution_scan",
    # round-10 additions
    "multiscale_clean_components", "flag_version_tables",
    "pq_codebook_retrain_drift", "paragraph_minhash_dedup",
    "cross_modal_retrieval_eval", "statwt_reweight",
    "sault_mosaic_weights", "uv_completeness_vs_time",
    "events_periodicity_autocorr", "dedup_rate_ingest_curve",
    "av_sync_drift_report", "psf_sidelobe_profile",
    "wproj_planes_planner", "embedding_sq8_error_by_label",
    "events_weekday_profile", "antenna_rfi_attribution",
    "near_dup_chain_audit", "snapshot_branch_merge",
    "cross_source_fuzzy_matrix", "market_basket_brand_lift",
    "events_session_duration_quantiles", "supplier_concentration_hhi",
    "embedding_norm_ingest_drift",
    # round-11 additions
    "lineitem_rollup_pricing", "ms_flag_cube_summary",
    "events_grouping_sets_profile", "corpus_rollup_source_lang",
    "phase_unwrap_per_baseline", "baseline_rolling_flag_rate",
    "snapshot_merge_conflict", "aqe_skew_bot_user_join",
    "snapshot_incremental_changes", "ms_corr_unpivot_long",
    "ann_probe_at_flag_version", "phase_unwrap_salted",
    "events_latest_state_compaction",
]

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
reg = registry()
print("| query | Exch | BcastExch | BHJ/BNLJ | SMJ | scans | global Sort |")
print("|---|---|---|---|---|---|---|")
for name in QUERIES:
    df = reg[name].fn(spark, "/root/testdata/sf0.1")
    p = df._jdf.queryExecution().executedPlan().toString()
    exch = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition", p))
    bcast = p.count("BroadcastExchange")
    bj = p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin")
    smj = p.count("SortMergeJoin")
    scans = p.count("Scan parquet")
    gsort = len(re.findall(r"Sort \[[^\]]*\], true", p))
    print(f"| {name} | {exch} | {bcast} | {bj} | {smj} | {scans} | {gsort} |")
spark.stop()
