"""The oracle-checked query corpus — SURVEY.md §2's operator inventory.

Each module contributes ``QUERIES`` (name → ``fn(spark, sf_dir) -> DataFrame``,
the Spark-native implementation) and ``ORACLE`` (name → ANSI SQL DuckDB runs
over the same parquet tables). Names follow SURVEY §2 ids (c05 = row C5…).

Determinism discipline (SURVEY §7 "hash-match discipline"):

* SUMs over doubles go through ``DECIMAL(18,4)`` (exact, associative — immune
  to partial-aggregation order) and are cast back to double at the end.
* Per-row double arithmetic is bit-identical across engines (same IEEE ops on
  the same inputs), so computed columns need no rounding.
* Statistical moments / libm functions are rounded (4–6 dp).
* Dates/timestamps leave queries as strings or epoch integers.
* Arrays/maps/structs never appear in outputs — joined to strings instead.
* Anything order- or seed-dependent (sample, approx sketches, LSH) is
  declared rows-only (no ORACLE entry).
"""

from . import (
    aggregation,
    composite,
    eventtime,
    llm,
    relational,
    scalars,
    sortset,
    udfs,
    windows,
)

_MODULES = (
    relational,
    aggregation,
    windows,
    sortset,
    scalars,
    eventtime,
    udfs,
    llm,
    composite,
)

# Names already hash-verified by the driver in CORRECTNESS_r01.json.  The
# driver's per-round correctness file caps at ~50 entries, so declaration
# order decides which queries get a driver row.  Rotate: queries with no
# driver row yet come FIRST; the r01-green set rides the tail.  (VERDICT.md
# round-1 item #1.)
_R01_VERIFIED = frozenset(
    """c01_scan_parquet c02_scan_csv c02b_scan_json c03_write_partitioned
    c04_ingest_pandas c05_select c06_computed_column c07_rename c08_drop
    c09_filter c10_distinct c11_null_handling c12_cast c13_case_when
    c14_join_inner c15_join_left c15b_join_full c16_join_multikey
    c17_semi_join c18_anti_join c19_cross_join c20_range_join c21_asof_join
    c22_broadcast_join c15c_join_right c20b_scalar_subquery c01b_scan_orc
    c02c_export_jsonl_shards c21b_asof_tolerance c23_groupby_agg
    c24_multi_agg c25_count_distinct c26_approx_count_distinct c27_global_agg
    c28_stats_moments c29_quantiles c29b_approx_quantiles c30_rollup
    c30b_cube c31_pivot c32_unpivot c33_collect_list c34_first_last
    c24b_filtered_agg c28b_corr_covar c30c_grouping_sets c33b_string_agg
    c35_ranking c36_lag_lead c37_cumsum""".split()
)

# Names driver-checked in CORRECTNESS_r02.json (round-2 window: D tier,
# TPC-H composites, UDF surface, event-time windows).
_R02_VERIFIED = frozenset(
    """d01_exact_dedup d02_minhash_lsh d02d_dedup_corpus d02b_simhash
    d02c_ngram_jaccard d03_cosine_topk d03b_ann_lsh d03d_ann_ivf
    d03f_ann_pq d03c_embedding_near_dup d04_vector_ops d05_tfidf
    d06_facet_stats d07_multimodal d08_char_stats d09_language_id
    d10_quality_score d11_token_count d12_fingerprint d13_repetition_ratio
    d14_pii_flags d16_incremental_dedup d17_sequence_packing
    d05b_stopword_filter d18_prep_pipeline d19_decontaminate d20_top_ngrams
    d21_unigram_logprob d22_shard_assign x01_shipping_priority
    x02_local_supplier_volume x03_returned_items x04_large_volume_customers
    x05_late_shipments x06_promo_revenue x07_disjunctive_revenue
    x08_supplier_part_counts c61_pandas_udf_scalar c62_apply_in_pandas
    c63_grouped_agg_udaf c64_map_in_pandas c65_table_function
    c65b_python_udtf c64b_map_in_arrow c62b_cogroup_in_pandas
    c55_tumbling_window c56_sliding_window c57_session_window""".split()
)

# Names driver-checked in CORRECTNESS_r03.json (round-3 window: the 49
# long-unchecked scalar/set/event-time families + the d15 oracle upgrade).
# d03e_dedup_by_embedding was queued for that window but the ~50-row cap
# cut it — it stays in the round-4 backlog below.
_R03_VERIFIED = frozenset(
    """c02d_ref_chunk_source c16b_nullsafe_join c69_data_checks
    c14b_bucketed_join c28c_mode c28d_freq_items c28e_describe
    c29c_winsorize c28f_histogram c38_rolling c39_range_window
    c40_topk_per_group c35b_value_windows c37b_cummax_pct_change
    c41_sort c42_limit c43_topk c44_sample c45_union_all
    c46_union_distinct c47_intersect c47b_except c47c_except_all
    c47d_intersect_all c45b_union_missing_columns c42b_offset_pagination
    c41b_global_row_index c48_string_fns c49_date_fns c50_math_fns
    c51_array_fns c52_map_struct c53_json c54_hash c48b_regex_parts
    c48c_fuzzy_strings c49b_date_series c50b_bitwise c51b_array_setops
    c52b_map_ops c50c_bucketize c53b_variant c58_late_data_window
    c59_dedup_by_key c60_stateful_running_max c66_resample c67_ffill
    c58b_interval_join c68_interpolate d15_stratified_sample""".split()
)

# The round-4 backlog: queries with NO driver row yet.  d03e was oracle-
# upgraded in r3 but missed the window; _R03_NEW never had a row.  These
# sort FIRST so the round-4 window certifies all of them (VERDICT round-3
# item #1 — done = 177/177 driver-certified).
_RECHECK = frozenset({"d03e_dedup_by_embedding"})

_R03_NEW = frozenset(
    """x09_min_cost_supplier x10_order_priority_check x11_forecast_revenue
    x12_nation_volume x13_market_share x14_product_profit
    x15_important_parts x16_customer_distribution x17_top_supplier
    x18_small_quantity_revenue x19_part_promotion_suppliers
    x20_waiting_suppliers x21_dormant_customers d23_gopher_quality
    d24_domain_mix_weights d25_length_percentile_filter
    d26_embedding_centroids d27_nearest_centroid d28_similarity_histogram
    d29_contamination_score d30_text_normalize c11b_replace_values
    c15d_combine_first d31_semantic_dedup d03g_ann_ivf_pq
    x22_conversion_funnel x23_cohort_retention x24_market_basket""".split()
)

# Queries ADDED in round 4 (never had a driver row).  They sort AFTER the
# 29-query backlog above: the window (~50 rows) certifies the backlog
# first, then as many of these as fit; leftovers take the round-5 window.
# Any NEW query added this round MUST be listed here (VERDICT round-3
# item #1: never ahead of the backlog).
_R04_NEW = frozenset(
    """d17b_packing_invariants d32_vocab_per_source d33_token_truncate
    d34_length_buckets d35_dup_rate_by_source d36_centroid_outliers
    d37_intra_label_cosine d38_hard_negatives c36b_diff
    c31b_pivot_multi_agg c57b_session_stats c21c_asof_forward
    c12b_try_cast c48d_string_fns2 c49c_calendar c50d_math_ext
    d39_gram_doc_frequency d40_dedup_keep_longest x25_order_gap
    x26_revenue_concentration c02e_scan_xml c02f_scan_text
    d07b_binary_file_source d02e_lsh_guarantees d03h_ann_self_retrieval
    c26b_approx_distinct_error c29d_approx_quantile_error
    c44b_sample_invariants d18b_pipeline_invariants
    d41_chunk_documents d42_source_quota_sample
    d43_train_split d44_pii_redact d45_importance_weight
    x27_event_paths c51c_posexplode
    d46_bigram_perplexity d47_split_leakage_scrub
    d48_media_headers c15e_merge_indicator c10b_duplicated_flag
    c31c_get_dummies c44c_deterministic_sample""".split()
)


# Queries added in the round-4 closing session (never had a driver row).
# They sort AFTER _R04_NEW: the certification window services the older
# backlog first; these ride the round-5 window with the _R04_NEW leftovers.
_R04B_NEW = frozenset(
    """d49_bloom_prune_join d50_heavy_hitters d51_vocab_growth
    d52_weighted_sample d53_edit_distance_pairs d54_normalized_dedup
    d55_corpus_novelty d56_template_prefixes d57_waterfill_quota
    d58_zipf_fit d59_dup_cluster_sizes d60_snapshot_drift
    d61_stratified_weighted_sample d62_curriculum_order
    d31b_semantic_dedup_guarantees
    c70_profile_table c71_skew_report c72_rolling_anomaly
    c73_group_regression c74_corr_matrix c75_weighted_median
    c76_crosstab_margins c77_qcut
    x28_brand_revenue_trend x29_customer_rfm x30_supplier_scorecard""".split()
)


# Names driver-checked in CORRECTNESS_r04.json (round-4 window: the 29-query
# backlog + 21 of the _R04_NEW additions).  These ride the tail so the
# round-5 window certifies the 48 never-checked queries (the _R04_NEW
# leftovers + all of _R04B_NEW) — VERDICT round-4 item #1: done =
# 246/246 driver-certified.
_R04_VERIFIED = frozenset(
    """d03e_dedup_by_embedding c11b_replace_values c15d_combine_first
    d23_gopher_quality d24_domain_mix_weights d25_length_percentile_filter
    d26_embedding_centroids d27_nearest_centroid d28_similarity_histogram
    d29_contamination_score d30_text_normalize d31_semantic_dedup
    d03g_ann_ivf_pq x09_min_cost_supplier x10_order_priority_check
    x11_forecast_revenue x12_nation_volume x13_market_share
    x14_product_profit x15_important_parts x16_customer_distribution
    x17_top_supplier x18_small_quantity_revenue
    x19_part_promotion_suppliers x20_waiting_suppliers
    x21_dormant_customers x22_conversion_funnel x23_cohort_retention
    x24_market_basket c21c_asof_forward c12b_try_cast c02e_scan_xml
    c02f_scan_text d07b_binary_file_source c15e_merge_indicator
    c10b_duplicated_flag c31b_pivot_multi_agg c26b_approx_distinct_error
    c29d_approx_quantile_error c31c_get_dummies c36b_diff
    c44b_sample_invariants c44c_deterministic_sample c48d_string_fns2
    c49c_calendar c50d_math_ext c51c_posexplode c57b_session_stats
    d17b_packing_invariants d32_vocab_per_source""".split()
)


# Queries whose SEMANTICS changed in round 5 after an earlier driver row:
# c18/c28d were certified on EMPTY results (trivial hash match — fixture
# has no order-less customers and no n/50 heavy hitter) and now produce
# non-trivial rows; d68/d69 moved to span granularity / a lower threshold
# for the same reason.  Their old rows are stale — they sort right after
# the never-checked backlog.
_R05_RECHECK = frozenset(
    """c18_anti_join c28d_freq_items d68_crossdup_matrix
    d69_suffix_array_ngrams""".split()
)


# Queries ADDED in round 5 (never had a driver row).  They sort AFTER the
# 48-query backlog above (VERDICT round-4 item #1: "add nothing ahead of
# them") — the round-5 window certifies the backlog first; these ride the
# round-6 window with any leftovers.
_R05_NEW = frozenset(
    """d63_soft_dedup_weights d64_rouge_overlap d65_doc_graph_pagerank
    d66_mmr_diverse_sample d67_embedding_quantize_int8
    d68_crossdup_matrix d69_suffix_array_ngrams d70_wordpiece_tokenize
    c78_sessionize_gap c79_funnel_windows c80_entropy_by_group
    c81_benford_digits x31_reorder_rate x32_supplier_lead_time
    d71_ccnet_perplexity_buckets d72_minhash_band_tuning
    d73_token_budget_pack d74_embedding_standardize
    d75_idf_rarity_score d76_near_dup_clusters_simhash
    d66b_mmr_guarantees d77_hierarchy_depth x33_overlapping_shipments""".split()
)


# Names driver-checked in CORRECTNESS_r05.json (round-5 window: the 48-query
# backlog — _R04_NEW leftovers + _R04B_NEW — plus the c18/c28d stale-row
# rechecks).  They ride the tail so the round-6 window certifies the 25-row
# backlog (_R05_RECHECK's d68/d69 + _R05_NEW) first — VERDICT round-5
# item #1: done = 269/269 driver-certified.
_R05_VERIFIED = frozenset(
    """c70_profile_table c71_skew_report c73_group_regression c74_corr_matrix
    c75_weighted_median c76_crosstab_margins c77_qcut c72_rolling_anomaly
    d33_token_truncate d34_length_buckets d35_dup_rate_by_source
    d36_centroid_outliers d37_intra_label_cosine d38_hard_negatives
    d39_gram_doc_frequency d40_dedup_keep_longest d02e_lsh_guarantees
    d03h_ann_self_retrieval d18b_pipeline_invariants d41_chunk_documents
    d42_source_quota_sample d43_train_split d44_pii_redact
    d45_importance_weight d46_bigram_perplexity d47_split_leakage_scrub
    d48_media_headers d49_bloom_prune_join d50_heavy_hitters
    d51_vocab_growth d52_weighted_sample d53_edit_distance_pairs
    d54_normalized_dedup d55_corpus_novelty d56_template_prefixes
    d57_waterfill_quota d58_zipf_fit d59_dup_cluster_sizes
    d60_snapshot_drift d61_stratified_weighted_sample
    d31b_semantic_dedup_guarantees d62_curriculum_order x25_order_gap
    x26_revenue_concentration x27_event_paths x28_brand_revenue_trend
    x29_customer_rfm x30_supplier_scorecard c18_anti_join
    c28d_freq_items""".split()
)


# Queries ADDED in round 6 (never had a driver row).  They sort AFTER the
# 25-row round-6 backlog (_R05_NEW + _R05_RECHECK) — VERDICT round-5 item
# #1: "any round-6 additions go in a _R06_NEW set sorting after them".
_R06_NEW = frozenset(
    """d47b_leakage_scrub_guarantees d76b_simhash_cluster_guarantees
    d78_kmv_distinct c82_ewma d79_triangle_count d80_set_similarity_join
    c83_ohlc_resample d48b_jpeg_headers d81_cms_frequency d82_token_pmi
    d83_containment_join d84_silhouette c84_seasonal_decompose
    x34_retention_cohorts d85_tfidf_doc_similarity c85_mad_outliers
    d86_bm25_topk d87_cluster_medoids c86_acf_daily_revenue
    c87_welch_ttest c88_chi_square_independence x35_survival_km
    x36_revenue_concentration x37_multitouch_attribution
    d88_embedding_covariance d89_source_kl_divergence c89_mann_whitney
    x38_supplier_skyline d90_kmv_set_ops d91_k_anonymity_audit
    d92_source_data_card c90_holt_linear x39_order_velocity
    d93_raw_pixel_stats x40_cohort_ltv""".split()
)

# Queries whose SEMANTICS changed in round 6 after an earlier driver row
# (the _R05_RECHECK pattern): x15's fixed 0.0008-of-total threshold
# degenerated to an empty result at sf0.1, so it moved to a scale-free
# 1.6x-mean threshold — the old driver row certifies the dead form.
_R06_RECHECK = frozenset({"x15_important_parts"})


# Names driver-checked in CORRECTNESS_r06.json (round-6 window: the full
# 25-row backlog plus 25 round-6 additions — 48 hash-green, d66/d76
# rows-only by design).  They ride the tail; the NINE _R06_NEW members
# past that window (d92/d93, x34–x40) are round 7's backlog and sort
# first.
_R06_VERIFIED = frozenset(
    """c78_sessionize_gap c79_funnel_windows c80_entropy_by_group
    c81_benford_digits c82_ewma c83_ohlc_resample c84_seasonal_decompose
    c85_mad_outliers c86_acf_daily_revenue c87_welch_ttest
    c88_chi_square_independence c89_mann_whitney c90_holt_linear
    d47b_leakage_scrub_guarantees d48b_jpeg_headers d63_soft_dedup_weights
    d64_rouge_overlap d65_doc_graph_pagerank d66_mmr_diverse_sample
    d66b_mmr_guarantees d67_embedding_quantize_int8 d68_crossdup_matrix
    d69_suffix_array_ngrams d70_wordpiece_tokenize
    d71_ccnet_perplexity_buckets d72_minhash_band_tuning
    d73_token_budget_pack d74_embedding_standardize d75_idf_rarity_score
    d76_near_dup_clusters_simhash d76b_simhash_cluster_guarantees
    d77_hierarchy_depth d78_kmv_distinct d79_triangle_count
    d80_set_similarity_join d81_cms_frequency d82_token_pmi
    d83_containment_join d84_silhouette d85_tfidf_doc_similarity
    d86_bm25_topk d87_cluster_medoids d88_embedding_covariance
    d89_source_kl_divergence d90_kmv_set_ops d91_k_anonymity_audit
    x15_important_parts x31_reorder_rate x32_supplier_lead_time
    x33_overlapping_shipments""".split()
)


# Queries ADDED in round 7 (never had a driver row).  They sort AFTER the
# 9-row round-7 backlog (_R06_NEW members with no CORRECTNESS_r06 row).
_R07_NEW = frozenset(
    """d94_connected_components d95_bfs_hops d96_skipgram_ppmi
    c91_ks_test c92_lead_lag_xcorr c93_changepoint_cusum
    x41_shipment_coverage d97_kneser_ney_bigram d98_bpe_merges
    d98b_bpe_first_merge c94_cramers_v c95_monthly_psi""".split()
)


# Names driver-checked in CORRECTNESS_r07.json (round-7 window: the 9-row
# backlog + all 12 round-7 additions + 29 round-6 re-certifications — 49
# hash-green, d98 rows-only by design with d98b its certification twin).
_R07_VERIFIED = frozenset(
    """d92_source_data_card d93_raw_pixel_stats x34_retention_cohorts
    x35_survival_km x36_revenue_concentration x37_multitouch_attribution
    x38_supplier_skyline x39_order_velocity x40_cohort_ltv c91_ks_test
    c92_lead_lag_xcorr c93_changepoint_cusum c94_cramers_v c95_monthly_psi
    d94_connected_components d95_bfs_hops d96_skipgram_ppmi
    d97_kneser_ney_bigram d98_bpe_merges d98b_bpe_first_merge
    x41_shipment_coverage c80_entropy_by_group c81_benford_digits
    c85_mad_outliers c86_acf_daily_revenue c87_welch_ttest
    c88_chi_square_independence c89_mann_whitney c78_sessionize_gap
    c79_funnel_windows c82_ewma c83_ohlc_resample c84_seasonal_decompose
    c90_holt_linear d47b_leakage_scrub_guarantees
    d76b_simhash_cluster_guarantees d78_kmv_distinct d48b_jpeg_headers
    d63_soft_dedup_weights d68_crossdup_matrix d75_idf_rarity_score
    d64_rouge_overlap d67_embedding_quantize_int8
    d71_ccnet_perplexity_buckets d72_minhash_band_tuning
    d73_token_budget_pack d74_embedding_standardize d65_doc_graph_pagerank
    d70_wordpiece_tokenize d69_suffix_array_ngrams""".split()
)


# Round-8 re-certification head (VERDICT round-7 item #1): every ledger
# row is green, but the c01–c37 block was last driver-checked in ROUND 1 —
# seven rounds stale.  The 40 stalest (of 49 r1-only rows, module order)
# lead the round-8 window so "zero hash mismatches ever" stays a live
# claim; _R08_NEW rides behind them (~10 slots of the ~50-row window);
# the 9 r1 leftovers + the r2 block queue for round 9.
_R08_STALE_FIRST = frozenset(
    """c01_scan_parquet c02_scan_csv c02b_scan_json c03_write_partitioned
    c04_ingest_pandas c05_select c06_computed_column c07_rename c08_drop
    c09_filter c10_distinct c11_null_handling c12_cast c13_case_when
    c14_join_inner c15_join_left c15b_join_full c16_join_multikey
    c17_semi_join c19_cross_join c20_range_join c21_asof_join
    c22_broadcast_join c15c_join_right c20b_scalar_subquery c01b_scan_orc
    c02c_export_jsonl_shards c21b_asof_tolerance c23_groupby_agg
    c24_multi_agg c25_count_distinct c26_approx_count_distinct
    c27_global_agg c28_stats_moments c29_quantiles c29b_approx_quantiles
    c30_rollup c30b_cube c31_pivot c32_unpivot""".split()
)


# Queries ADDED in round 8 (never had a driver row).  They sort right
# after the 40-row stale-first head.
_R08_NEW = frozenset(
    """d99_bmp_ppm_decode d98c_bpe_merge_replay d100_shortest_paths
    d101_ivf_nprobe_recall d102_bpe_encode d103_logreg_quality
    d104_html_extract""".split()
)


# Names driver-checked in CORRECTNESS_r08.json (round-8 window: the 40-row
# stale-first head + the 7 round-8 additions + 3 more of the r1 leftovers
# — 48 hash-green, c26/c29b rows-only by design with their certified
# error-band twins).
_R08_VERIFIED = frozenset(
    """c01_scan_parquet c02_scan_csv c02b_scan_json c03_write_partitioned
    c04_ingest_pandas c05_select c06_computed_column c07_rename c08_drop
    c09_filter c10_distinct c11_null_handling c12_cast c13_case_when
    c14_join_inner c15_join_left c15b_join_full c16_join_multikey
    c17_semi_join c19_cross_join c20_range_join c21_asof_join
    c22_broadcast_join c15c_join_right c20b_scalar_subquery c01b_scan_orc
    c02c_export_jsonl_shards c21b_asof_tolerance c23_groupby_agg
    c24_multi_agg c25_count_distinct c26_approx_count_distinct
    c27_global_agg c28_stats_moments c29_quantiles c29b_approx_quantiles
    c30_rollup c30b_cube c31_pivot c32_unpivot c33_collect_list
    c34_first_last c24b_filtered_agg d99_bmp_ppm_decode
    d98c_bpe_merge_replay d100_shortest_paths d101_ivf_nprobe_recall
    d102_bpe_encode d103_logreg_quality d104_html_extract""".split()
)


# Round-9 re-certification head (VERDICT r8 #1): the 6 rows still
# r1-checked lead the window; this round's additions ride behind them
# (so d105-d107 certify THIS round); then the 48-row r2 block (c55-c65
# streaming/UDF surface + d01-d08 core + TPC-H composites) fills the
# rest of the ~50-row window — its last ~7 rows queue as the round-10
# backlog head, after which no declared row is older than r3.
_R09_STALE_FIRST = frozenset(
    """c28b_corr_covar c30c_grouping_sets c33b_string_agg c35_ranking
    c36_lag_lead c37_cumsum""".split()
)


# Queries ADDED in round 9 (never had a driver row).
_R09_NEW = frozenset(
    """d105_png_decode d106_bpe_batched_merges d107_softmax_language_id
    d108_jpeg_decode d109_audio_resample d110_jpeg_color_decode
    d111_url_canonicalize d112_warc_extract d113_warc_gz_extract
    d114_robots_filter d115_image_ahash""".split()
)


# Names driver-checked in CORRECTNESS_r09.json (round-9 window: the 6
# r1-stale rows + all 11 round-9 additions + the first 33 rows of the
# r2 block — 44 hash-green, 6 rows-only by design).  The 15 r2 rows the
# window did NOT reach (d05b/d17–d22 + x01–x08) are round 10's stale
# head below.
_R09_VERIFIED = frozenset(
    """c28b_corr_covar c30c_grouping_sets c33b_string_agg c35_ranking
    c36_lag_lead c37_cumsum c55_tumbling_window c56_sliding_window
    c57_session_window c61_pandas_udf_scalar c62_apply_in_pandas
    c62b_cogroup_in_pandas c63_grouped_agg_udaf c64_map_in_pandas
    c64b_map_in_arrow c65_table_function c65b_python_udtf d01_exact_dedup
    d02_minhash_lsh d02b_simhash d02c_ngram_jaccard d02d_dedup_corpus
    d03_cosine_topk d03b_ann_lsh d03c_embedding_near_dup d03d_ann_ivf
    d03f_ann_pq d04_vector_ops d05_tfidf d06_facet_stats d07_multimodal
    d08_char_stats d09_language_id d105_png_decode d106_bpe_batched_merges
    d107_softmax_language_id d108_jpeg_decode d109_audio_resample
    d10_quality_score d110_jpeg_color_decode d111_url_canonicalize
    d112_warc_extract d113_warc_gz_extract d114_robots_filter
    d115_image_ahash d11_token_count d12_fingerprint d13_repetition_ratio
    d14_pii_flags d16_incremental_dedup""".split()
)


# Round-10 re-certification head (VERDICT r9 #1): the 15 rows still
# r2-checked — the r9 window's leftovers — lead; this round's additions
# ride behind them (so they certify THIS round); then the 49-row r3
# block (scalar/set/window/event-time families) fills the rest of the
# ~50-row window — its last ~15-20 rows queue as the round-11 backlog
# head, after which no declared row is older than r4.
_R10_STALE_FIRST = frozenset(
    """d05b_stopword_filter d17_sequence_packing d18_prep_pipeline
    d19_decontaminate d20_top_ngrams d21_unigram_logprob d22_shard_assign
    x01_shipping_priority x02_local_supplier_volume x03_returned_items
    x04_large_volume_customers x05_late_shipments x06_promo_revenue
    x07_disjunctive_revenue x08_supplier_part_counts""".split()
)


# Queries ADDED in round 10 that certify THIS round (right behind the
# stale head): the flagship crawl/cluster ops whose oracles are NEW
# decision replays.
_R10_NEW = frozenset(
    """d114b_robots_wildcards d117_image_near_dup_clusters
    d117b_image_cluster_guarantees d116_crawl_pipeline
    d124_sitemap_extract d125_surt_urlkeys
    d129_warc_cdx_random_access""".split()
)

# Round-10 additions that DELIBERATELY yield their window slots to the
# r3 re-certification loop (VERDICT r9 #1 outranks instant
# certification): the codec-ladder variants d118–d128, whose oracles
# are VERBATIM twins of already-certified rows (d108/d110/d105 — the
# result-invisible isolation discipline, so those rows staying green
# already certifies the shared surface; d127's is d105 scaled 257x)
# and whose new machinery is unit-pinned (restart/Adam7/palette/
# progressive/SA/16-bit roundtrips vs baseline) plus d119, whose tap
# table is unit-pinned.  They sort right AFTER the r3 block and ride
# the round-11 window.
_R10_NEW_DEFERRED = frozenset(
    """d118_jpeg_restart_decode d119_audio_resample_sinc
    d120_png_adam7_decode d121_jpeg_progressive_decode
    d122_png_palette_decode d123_jpeg_progressive_sa_decode
    d126_jpeg_color_progressive_decode d127_png_16bit_decode
    d128_jpeg_color_sa_decode d130_unigram_lm_vocab
    d130b_unigram_lm_guarantees d131_robots_sitemap_discovery
    d132_pca_embeddings d132b_pca_guarantees""".split()
)


# Names driver-checked in CORRECTNESS_r10.json (round-10 window: the
# 15-row r2-stale head + the 7 _R10_NEW flagships + d133 + 27 rows of
# the r3 block — 46 hash-green, 4 rows-only by design).  The 22 r3 rows
# the window did NOT reach (c48b–c54 scalars, c58–c68 event-time/
# timeseries extras, d15) are round 11's stale head.
_R10_VERIFIED = frozenset(
    """c02d_ref_chunk_source c14b_bucketed_join c16b_nullsafe_join
    c28c_mode c28e_describe c28f_histogram c29c_winsorize
    c35b_value_windows c37b_cummax_pct_change c38_rolling
    c39_range_window c40_topk_per_group c41_sort c41b_global_row_index
    c42_limit c42b_offset_pagination c43_topk c44_sample c45_union_all
    c45b_union_missing_columns c46_union_distinct c47_intersect
    c47b_except c47c_except_all c47d_intersect_all c48_string_fns
    c69_data_checks d05b_stopword_filter d114b_robots_wildcards
    d116_crawl_pipeline d117_image_near_dup_clusters
    d117b_image_cluster_guarantees d124_sitemap_extract
    d125_surt_urlkeys d129_warc_cdx_random_access
    d133_crawl_discovery_chain d17_sequence_packing d18_prep_pipeline
    d19_decontaminate d20_top_ngrams d21_unigram_logprob
    d22_shard_assign x01_shipping_priority x02_local_supplier_volume
    x03_returned_items x04_large_volume_customers x05_late_shipments
    x06_promo_revenue x07_disjunctive_revenue
    x08_supplier_part_counts""".split()
)


# Queries ADDED in round 11 (never had a driver row).  They sort after
# the round-11 stale head (the 22 r3 leftovers) and the 14 deferred
# round-10 rows, so they certify THIS round if the window reaches them;
# the r4-stale block fills any remaining slots behind them.
_R11_NEW = frozenset(
    """d134_duplicate_spans d134b_duplicate_span_guarantees
    d135_warc_cdx_index_fetch d136_politeness_schedule
    d137_connected_components_star
    d130c_unigram_lm_encode d130d_unigram_encode_guarantees
    d138_c4_line_filter d139_line_dedup_corpus d140_temperature_mix
    d141_image_phash d142_audio_stft d143_y4m_frame_sample
    d144_image_resize_area d145_kcore d146_encoding_quality
    d147_url_blocklist d148_lpa_communities
    d149_ts_similarity_search d150_sax_blocking
    d151_revisit_schedule d152_wet_conversion d153_anchor_text
    d154_image_dhash d155_code_switch x42_cleaning_funnel""".split()
)


# Names driver-checked in CORRECTNESS_r11.json (round-11 window: the 22
# r3 leftovers + the 14 deferred round-10 rows + the first 14 round-11
# additions — 47 hash-green, 3 rows-only by design).  The 12 _R11_NEW
# rows the window did NOT reach (d145–d155, x42) are round 12's stale
# head (VERDICT r11 #1).
_R11_VERIFIED = frozenset(
    """c49_date_fns c50_math_fns c51_array_fns c52_map_struct c53_json
    c54_hash c48b_regex_parts c48c_fuzzy_strings c49b_date_series
    c50b_bitwise c51b_array_setops c52b_map_ops c50c_bucketize
    c53b_variant c58_late_data_window c59_dedup_by_key
    c60_stateful_running_max c66_resample c67_ffill c58b_interval_join
    c68_interpolate d15_stratified_sample d118_jpeg_restart_decode
    d119_audio_resample_sinc d120_png_adam7_decode
    d121_jpeg_progressive_decode d122_png_palette_decode
    d123_jpeg_progressive_sa_decode d126_jpeg_color_progressive_decode
    d127_png_16bit_decode d128_jpeg_color_sa_decode d130_unigram_lm_vocab
    d130b_unigram_lm_guarantees d131_robots_sitemap_discovery
    d132_pca_embeddings d132b_pca_guarantees d134_duplicate_spans
    d134b_duplicate_span_guarantees d136_politeness_schedule
    d130c_unigram_lm_encode d130d_unigram_encode_guarantees
    d137_connected_components_star d135_warc_cdx_index_fetch
    d138_c4_line_filter d139_line_dedup_corpus d140_temperature_mix
    d141_image_phash d143_y4m_frame_sample d144_image_resize_area
    d142_audio_stft""".split()
)


# Queries ADDED in round 12 (never had a driver row).  They ride right
# behind the 12-row r11 stale head so they certify THIS round; the
# r4-stale block fills the remaining slots.
_R12_NEW = frozenset(
    """d156_audio_fingerprint d156b_audio_fp_guarantees
    d157_ts_similarity_join d157b_ts_join_self_retrieval
    x43_crawl_ops_funnel d158_branch_lineage_card
    d159_exif_extract d159b_exif_strip_guarantees
    d156c_audio_near_dup_clusters d161_sft_loss_mask
    d163_schema_evolution_card""".split()
)


# Names driver-checked in CORRECTNESS_r12.json (round-12 window: the 12-row
# r11 stale head + all 11 round-12 additions + 27 rows of the r4-stale
# block — 50/50 hash-green, the first all-hash window).  The 22 r4 rows the
# window did NOT reach are round 13's stale head (VERDICT r12 #1).
_R12_VERIFIED = frozenset(
    """d145_kcore d146_encoding_quality d147_url_blocklist
    d148_lpa_communities d149_ts_similarity_search d150_sax_blocking
    d151_revisit_schedule d152_wet_conversion d153_anchor_text
    d154_image_dhash d155_code_switch x42_cleaning_funnel
    d156_audio_fingerprint d156b_audio_fp_guarantees
    d157_ts_similarity_join d157b_ts_join_self_retrieval
    d158_branch_lineage_card d159_exif_extract d159b_exif_strip_guarantees
    d156c_audio_near_dup_clusters d161_sft_loss_mask
    d163_schema_evolution_card x43_crawl_ops_funnel c11b_replace_values
    c15d_combine_first c21c_asof_forward c12b_try_cast c02e_scan_xml
    c02f_scan_text d07b_binary_file_source c15e_merge_indicator
    c10b_duplicated_flag c31b_pivot_multi_agg c26b_approx_distinct_error
    c29d_approx_quantile_error c31c_get_dummies c36b_diff
    c44b_sample_invariants c44c_deterministic_sample c48d_string_fns2
    c49c_calendar c50d_math_ext c51c_posexplode c57b_session_stats
    d03e_dedup_by_embedding d17b_packing_invariants d23_gopher_quality
    d24_domain_mix_weights d25_length_percentile_filter
    d26_embedding_centroids""".split()
)


# Queries ADDED in round 13 (never had a driver row).  They ride right
# behind the 22-row r4 stale head so they certify THIS round; the 50-row
# r5-stale block fills the remaining slots (VERDICT r12 #1: burn the
# ≤r6 tail oldest-first — r14 takes the r5 leftovers + the r6 block).
_R13_NEW = frozenset(
    """d164_dpo_pair_prep d164b_dpo_leakage_guarantees
    d165_vad_segments d165b_vad_volume_invariance
    d166_ivf_drift_card d167_video_near_dup
    d167b_video_trim_guarantees d168_tokenizer_fertility
    d169_replay_convergence d170_audio_chunk_fingerprints
    d170b_chunk_fp_guarantees d171_vad_segment_extract
    d172_audio_chunk_near_dup""".split()
)


# Queries whose SEMANTICS changed in round 13 after an earlier driver
# row (the _R05_RECHECK pattern): d156 grew the n_frames_used column
# (the r12 ADVICE head-coverage fix), so its r12 row certifies the old
# schema — it re-certifies with this round's additions.
_R13_RECHECK = frozenset({"d156_audio_fingerprint"})


# Names driver-checked in CORRECTNESS_r13.json (round-13 window: the
# 22-row r4 stale head + all 13 round-13 additions + the d156 recheck +
# 14 stalest-tail rows — 48 hash-green, d31/d03g rows-only by design
# with their certified twins).  The 36 r5 rows + 21 r6 rows the window
# did NOT reach are round 14's stale head (VERDICT r13 #1).
_R13_VERIFIED = frozenset(
    """d27_nearest_centroid d28_similarity_histogram
    d29_contamination_score d30_text_normalize d31_semantic_dedup
    d03g_ann_ivf_pq d32_vocab_per_source x09_min_cost_supplier
    x10_order_priority_check x11_forecast_revenue x12_nation_volume
    x13_market_share x14_product_profit x16_customer_distribution
    x17_top_supplier x18_small_quantity_revenue
    x19_part_promotion_suppliers x20_waiting_suppliers
    x21_dormant_customers x22_conversion_funnel x23_cohort_retention
    x24_market_basket d156_audio_fingerprint d164_dpo_pair_prep
    d164b_dpo_leakage_guarantees d165_vad_segments
    d165b_vad_volume_invariance d167_video_near_dup
    d167b_video_trim_guarantees d168_tokenizer_fertility
    d166_ivf_drift_card d169_replay_convergence
    d170_audio_chunk_fingerprints d170b_chunk_fp_guarantees
    d171_vad_segment_extract d172_audio_chunk_near_dup c18_anti_join
    c70_profile_table c71_skew_report c28d_freq_items
    c73_group_regression c74_corr_matrix c75_weighted_median
    c76_crosstab_margins c77_qcut c72_rolling_anomaly d33_token_truncate
    d34_length_buckets d35_dup_rate_by_source d36_centroid_outliers""".split()
)


# Queries ADDED in round 14 (never had a driver row).  They ride right
# behind the 36-row r5 stale head so they certify THIS round; the r6
# block fills the remaining slots (VERDICT r13 #1: its ~14-row residue
# clears in r15).
_R14_NEW = frozenset(
    """d173_audio_phase_robust_near_dup d174_rejection_sampling_prep
    d174b_rejection_sampling_guarantees d175_video_rescale_near_dup
    d176_multiturn_loss_mask d176b_multiturn_mask_guarantees
    d177_video_fps_near_dup d177b_fps_tick_guarantees""".split()
)


# Queries whose SEMANTICS changed in round 14 after an earlier driver
# row (the _R05_RECHECK pattern): none — d169's convergence hash moved
# from a driver-side collect+sha256 to a distributed per-row sha2 +
# order-insensitive aggregate (VERDICT r13 #4), but its EMITTED values
# (equality flags + count) are unchanged, so the r13 row still
# certifies it and the slot goes to the stale r6 tail instead.
_R14_RECHECK = frozenset()


def _merged(attr):
    out = {}
    for m in _MODULES:
        entries = getattr(m, attr)
        overlap = set(out) & set(entries)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(entries)
    return out


def all_queries():
    """Declaration order = driver-certification priority (the driver's
    per-round correctness file caps at ~50 rows). Round-14 rotation
    (VERDICT round-13 item #1: burn the 57-row ≤r6 tail oldest-first):
    the 36 r5-stale rows lead (d37–d62, d02e, d03h, x25–x30), then this
    round's additions + the d169 recheck (so they certify in their
    debut round), then the 21-row r6 block fills the remaining ~7 slots
    — its ~14-row residue is round 15's backlog, after which no row is
    older than r7. Everything else sorts by ascending freshness. Within
    each group, original module order is preserved (stable sort). A
    name in no set is treated as newest (sorts with _R14_NEW), so a
    forgotten registration can never starve the backlog."""
    out = _merged("QUERIES")

    def key(name):
        # Round-14 rotation: stalest-first re-certification budget.
        # Membership is checked newest-round-first so a row re-certified
        # later sorts by its LATEST check (e.g. the 14 stale-tail rows
        # the r13 window reached hit _R13_VERIFIED first and sort as
        # fresh; the r5/r6 rows it missed fall through to the stale
        # head).  _R14_RECHECK is checked FIRST: d169 is in
        # _R13_VERIFIED, but its r13 row certifies the old hash
        # discipline.
        if name in _R14_NEW or name in _R14_RECHECK:
            return 1  # this round's additions + semantics rechecks
        if name in _R13_VERIFIED:
            return 15
        if name in _R12_VERIFIED:
            return 14
        if name in _R11_VERIFIED:
            return 13
        if name in _R10_VERIFIED:
            return 12
        if name in _R09_VERIFIED:
            return 11
        if name in _R08_VERIFIED:
            return 10
        if name in _R07_VERIFIED:
            return 9
        if name in _R06_VERIFIED:
            return 2  # r6 block: fills this window behind the new rows
        if name in _R05_VERIFIED:
            return 0  # the 36-row r5 stale head: this window leads
        if name in _R04_VERIFIED:
            return 3  # safety: r4 rows in no newer set (none expected)
        if name in _R03_VERIFIED:
            return 4  # safety: r3 rows in no newer set (none expected)
        if name in _R02_VERIFIED:
            return 4  # safety: r2 rows in no newer set (none expected)
        return 1  # not in any set: newest, with the _R14_NEW group

    names = sorted(out, key=key)
    return {n: out[n] for n in names}


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
