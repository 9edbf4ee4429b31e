"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose
the full SURVEY.md §2 operator catalog (entwiner_spark/catalog.py) for
the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from entwiner_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.flagship(spark, "/root/testdata/sf0.001")


# Sampling priority: the driver verifies a 50-query subset of the
# catalog each round, drawing from the head of this dict.  Rotation
# rule (r9 verdict, amended r10): (a) never-sampled new queries at
# the head, then (b) queries whose implementation or oracle CHANGED
# since their newest driver-green row ("changed outranks stale"),
# then (c) everything else in staleness order (oldest newest-green
# round first, alphabetical within a round).  r16 head = 5 new
# (time-profile CCH buckets, the buckets×restrictions composition,
# time-windowed restrictions, exact via-way splitting, turn-aware
# route matrix) + 15 changed-since-green (the OSM restriction/
# conditional parser and ban expansion; to_linegraph ban refactor +
# via_splits; PHAST leveled down-sweep consumers; LPA local twin;
# maneuver-walk matching; the slimmed forced-pregel alts gate) + 30
# of the 31 remaining r11-vintage rows = 50 (u4_props_json_roundtrip
# slides to 51st; the oldest vintage after this round is r11 by that
# one row, r12 otherwise — r15 verdict task #8).  Regenerate every
# round with the same rule.
_PRIORITY = [
    # --- never sampled (new in round 16) ---
    "g_ch_turn_matrix",
    "g_time_profile",
    "g_time_profile_turn",
    "g_time_restriction",
    "g_via_way_exact",
    # --- changed in r16 since newest driver-green (see comment
    # above; full list regenerated per-rule) ---
    "g_ch_persist",
    "g_ch_phast",
    "g_ch_turn",
    "g_ch_turn_alts",
    "g_closeness_landmarks",
    "g_cost_profile",
    "g_harmonic_landmarks",
    "g_isochrone_ch",
    "g_kshortest_ch",
    "g_lpa_communities",
    "g_maneuver_classes",
    "g_turn_restriction",
    "g_turn_routing",
    "geo_map_match_route",
    "s15_osm_ingest",
    # --- newest driver-green row: round 11 ---
    "g_am_weighted_degree",
    "g_msf",
    "g_p5_successors",
    "g_scc_components",
    "geo_a4_linestring_length",
    "geo_f6_haversine_within",
    "geo_j3_bbox_count",
    "geo_o1_knn",
    "geo_s13_simplify",
    "j2_revenue_by_nation",
    "j_outer_order_counts",
    "m1_keyed_update",
    "m2_delete_keys",
    "mm1_binary_meta",
    "mm4_media_neardup",
    "o1_top10_orders",
    "p2_point_lookup",
    "p4_semi_join",
    "p4b_anti_join",
    "p7_distinct_pairs",
    "q1_pricing_summary",
    "s11_standardize",
    "s13_ivfpq_search",
    "s1_fwd_rev_ingest",
    "s2_cosine_top10",
    "s3_knn_join",
    "samp5_weighted",
    "t12_unigram_logprob",
    "t13_repetition_ratio",
    "t6b_quantiles_kll",
    "u4_props_json_roundtrip",
    # --- newest driver-green row: round 12 ---
    "d17_bloom_contamination",
    "g_anf",
    "g_astar_route",
    "g_betweenness",
    "g_closeness",
    "g_contract_chains",
    "g_eff_diameter",
    "g_j1_khop",
    "g_layer_routing",
    "g_linegraph",
    "g_neighbor_jaccard",
    "g_p3_node_lookup",
    "g_p6_predecessors",
    "g_p8_pred_nodes",
    "g_pagerank",
    "g_ppr_sources",
    "g_relabel_roundtrip",
    "geo_gtfs_stops",
    "geo_j5_spatial_join",
    "q10_returned_items",
    "q11_important_stock",
    "q13_order_histogram",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_discounted_revenue",
    "q22_global_sales",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "s14_node_attr_ingest",
    "s4_lsh_buckets",
    "set_except_custkeys",
    "set_intersect_custkeys",
    "t1_doc_stats",
    "t22_repetition_removal",
    "t22b_repetition_removal_explode",
    "t24_heavy_hitters",
    "t2_stopword_langid",
    # --- newest driver-green row: round 13 ---
    "d10_dup_ngram_coverage",
    "d11_sorted_neighborhood",
    "d12_minhash_calibration",
    "d13_er_pipeline",
    "d9_embedding_dedup_clusters",
    "e11_hll_weekly_rollup",
    "e12_ewma",
    "e13_anomaly_zscore",
    "e7_hourly_unique_users",
    "e8_funnel_conversion",
    "e9_cohort_retention",
    "ev2_json_schema",
    "g_condensation",
    "g_diameter_lb",
    "g_feature_prop",
    "g_isochrone",
    "g_kcore",
    "g_motif_anchored",
    "g_scc_fwbw",
    "g_triangles",
    "geo_a5_bbox",
    "geo_f7_meter_bbox",
    "geo_f8_point_distance",
    "geo_j6_nearest_edge",
    "mm2_frame_sample",
    "mm3_resize_meta",
    "o2_first_row",
    "q16_supplier_cnt",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q3_shipping_priority",
    "s5_ivf_assign",
    "s5b_ivf_topk",
    "s5c_ivf_multiprobe",
    "s6_derived_nodes",
    "s7_quantize_int8",
    "t23_url_normalize",
    "t3_fingerprint",
    "t4_quality_score",
    "u1_union_parties",
    "u2_last_write_wins",
    "u3_union_missing_cols",
    "w1_top3_per_customer",
    # --- newest driver-green row: round 14 ---
    "a1_table_counts",
    "a2_orders_per_customer",
    "a3_weighted_size",
    "agg_cube_docs",
    "agg_rollup_status",
    "d14_semdedup",
    "d15_dsir_weights",
    "d1_exact_dedup",
    "d2_minhash_signatures",
    "d3_minhash_lsh_pairs",
    "d4_simhash",
    "e1_tumbling_hourly",
    "e2_sliding_30min",
    "e4_topk_users",
    "ev_json_extract",
    "g_a2_out_degree",
    "g_cc_components",
    "g_clustering_coef",
    "g_condensation_depth",
    "g_harmonic",
    "g_j1_bfs_hops",
    "g_j1_sssp_weighted",
    "g_kshortest",
    "g_ktruss",
    "g_motif_ffw_triangle",
    "g_motif_open_wedge",
    "geo_map_match",
    "samp1_stratified",
    "samp2_hash_bernoulli",
    "t10_corpus_filter",
    "t5_bpe_tokens",
    "t6_length_quantiles",
    "t7_pack_chunks",
    "t8_tfidf_top_terms",
    "t9_winnow_fingerprints",
    "w2_moving_avg",
    "w3_rank_dense",
    "w4_lag_lead",
    "w5_distribution_ranks",
    # --- newest driver-green row: round 15 ---
    "a2b_approx_degree",
    "d16_dup_span_removal",
    "d4b_simhash_neardup",
    "d5_ngram_jaccard_pairs",
    "d6_embedding_neardup",
    "d6b_embedding_neardup_lsh",
    "d7_contamination",
    "d8_dedup_clusters",
    "e3_sessionize",
    "e5_asof_last_view",
    "e6_interval_join",
    "g_adamic_adar",
    "g_ch_full",
    "g_ch_matrix",
    "g_ch_route",
    "g_ch_route_matrix",
    "g_node2vec_walks",
    "g_skipgram_pairs",
    "g_topo_levels",
    "g_walks",
    "m3_scd2_history",
    "q12_late_priority",
    "s10_random_projection",
    "s12_ivfpq_encode",
    "s8_ivf_recall",
    "s9_pq_encode",
    "samp3_token_budget",
    "samp4_temperature",
    "t11_pii_redact",
    "t14_gopher_rules",
    "t15_bm25_rank",
    "t16_bigram_logprob",
    "t17_lm_buckets",
    "t18_kl_divergence",
    "t19_pipeline_e2e",
    "t20_split_leakage",
    "t21_feature_hashing",
    "w6_range_interval",
    "x5_zorder_values",
]

def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return {**head, **{k: v for k, v in d.items() if k not in head}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(catalog.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every catalog query — including the iterative
    ones (g_pagerank runs a fixed-iteration unrolled CTE oracle)."""
    return _ordered(dict(catalog.ORACLES))
