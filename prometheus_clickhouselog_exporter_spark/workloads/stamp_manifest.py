"""Static driver-stamp priority manifest (round 12).

Evidence basis (judged from CORRECTNESS_r01..r11.json mapped onto
registry positions): the driver stamps the HEAD-50 of the order that
``__spark_entry__.queries()`` returns — r9 took the first 50
never-stamped entries of the r9 ordering, r10 the first 50 of the r10
ordering, and r11 took all 50 from this manifest (verified in the r11
verdict).  ``_registration_order`` in ``__spark_entry__`` ranks
never-stamped names by their index here; never-stamped names NOT
listed (i.e. any round-12+ additions) rank after every manifest entry,
so new work cannot displace the debt.

Round-12 pruning (VERDICT r11, Next round #1): the 50 entries whose
r11 driver stamp landed green were removed; what remains is exactly
the 30 queries never sampled by any driver round — 17 late-r10
registrations followed by the 13 round-11 additions, each group in
registry order among themselves.  With registry growth held ≤20 this
round, the next head-50 window = these 30 + up to 20 re-certs, so the
debt clears in round 12.

Remove names from this list only when their driver stamp lands green.
"""

STAMP_PRIORITY: list[str] = [
    # --- 17 late-r10 registrations (landed after the r10 driver run,
    #     not reached by the r11 head-50), in registry order ---
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
    # --- 13 round-11 additions (landed after the r11 driver run),
    #     in registry order ---
    "stats_bartlett_test",
    "stats_moods_median",
    "stats_kuiper_uniformity",
    "stats_watson_u2",
    "stats_esd_outlier_rounds",
    "eval_kendalls_w",
    "timeseries_stl_strength",
    "ml_platt_scaling",
    "promql_holt_winters",
    "graph_ktruss_edges",
    "stats_conover_squared_ranks",
    "stats_pettitt_changepoint",
    "er_consonant_skeleton_blocking",
]
