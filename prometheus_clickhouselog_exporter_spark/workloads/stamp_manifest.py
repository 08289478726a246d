"""Static driver-stamp priority manifest (round 11).

Evidence basis (judged from CORRECTNESS_r01..r10.json mapped onto
registry positions): the driver stamps the HEAD-50 of the order that
``__spark_entry__.queries()`` returns — r9 took the first 50
never-stamped entries of the r9 ordering, r10 the first 50 of the r10
ordering.  The r10 prio-1 tie-break used raw registry rank, and the
36 r2/r3-era never-stamped queries live in ``pipeline_ops*`` /
``diagnostics`` modules that import LAST, so every round's new modules
outranked the old debt and it was never reached.

``STAMP_PRIORITY`` pins the never-stamped pool explicitly,
oldest-first: the 36 r2/r3-era queries, then the 31 r10 batch-10..13
queries that landed after the r10 driver run.  ``_registration_order``
in ``__spark_entry__`` ranks never-stamped names by their index here;
never-stamped names NOT listed (i.e. any round-11+ additions) rank
after every manifest entry, so new work cannot displace the debt.

Remove names from this list only when their driver stamp lands green;
VERDICT r10 "Next round #1" is the directive this implements.
"""

STAMP_PRIORITY: list[str] = [
    # --- 36 r2/r3-era queries, in registry order among themselves ---
    "events_markov_transitions",
    "drift_psi_value_halves",
    "keyskew_gini_customers",
    "incremental_agg_merge",
    "graph_pagerank_names",
    "scd2_customer_priority_history",
    "dedup_cluster_canonical",
    "sample_hash_bernoulli",
    "sample_stratified_lang",
    "sample_coordinated_users",
    "text_quantile_stats",
    "text_repetition_filter",
    "dedup_jaccard_pruned",
    "heavy_hitter_tokens",
    "dedup_substring_spans",
    "dedup_incremental_bloom",
    "curation_manifest_end2end",
    "sample_source_quota",
    "cohort_retention_events",
    "attribution_last_touch",
    "split_train_valid_test",
    "stats_robust_mad",
    "layout_zorder_manifest",
    "text_bpe_merge_candidates",
    "text_boilerplate_chunk_df",
    "pack_padding_efficiency",
    "sample_epoch_shuffle",
    "quality_ccnet_buckets",
    "quantile_disc_doclen",
    "er_fuzzy_levenshtein_join",
    "window_rolling_distinct_users",
    "stats_weighted_median",
    "stats_grouped_ols",
    "stats_multivar_ols_2f",
    "stats_ab_test_zscore",
    "stats_bootstrap_ci_mean",
    # --- 31 r10 batch-10..13 queries (landed after the r10 driver run) ---
    "layout_hilbert_manifest",
    "graph_closeness_centrality",
    "clickhouse_summap_battery",
    "sample_horvitz_thompson",
    "stats_hodges_lehmann",
    "ml_mrmr_feature_select",
    "stats_granger_causality",
    "timeseries_technical_indicators",
    "stats_page_trend",
    "promql_vector_matching",
    "eval_fleiss_kappa",
    "stats_cronbach_alpha",
    "eval_brier_decomposition",
    "stats_quade_test",
    "promql_offset_atmodifier",
    "embedding_ledoit_wolf",
    "eval_chrf_pairs",
    "text_distinct_n",
    "dedup_tfidf_cosine_pairs",
    "eval_weighted_kappa",
    "promql_histogram_moments",
    "ml_auc_delong_ci",
    "stats_brunner_munzel",
    "audit_hash_uniformity_ad",
    "graph_rich_club",
    "sql_lateral_column_alias",
    "dedup_minhash_calibration",
    "stats_dunn_posthoc",
    "timeseries_hurst_rs",
    "stats_ansari_bradley",
    "text_js_divergence",
]
