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


# Sampling priority: the driver verifies a subset of the catalog each
# round, drawing from the head of this dict.  Round-6 order: (1) the
# three queries never driver-sampled in rounds 1-5 (they sat at
# positions 51-53, one past the 50-query cut); (2) s11/geo_s13, the
# r5 driver-red rows, now emitting string-serialized (scaled-int)
# outputs instead of raw arrays; (3) queries whose implementation or
# oracle changed this round (g_harmonic oracle d>0 guard, samp5
# lazy-validation rewrite, g_msf pointer-jump relabel, g_ktruss
# degree-oriented wedges, g_scc trivial-SCC trim); (4) the round-6
# additions (d14 SemDeDup, d15 DSIR, s13 IVF-PQ ADC search); (5) the
# 47 rows last driver-sampled in round 1, then round 3 — so
# cumulative claims stay fresh against code drift.
_PRIORITY = [
    "t12_unigram_logprob",
    "g_clustering_coef",
    "t13_repetition_ratio",
    "s11_standardize",
    "geo_s13_simplify",
    "g_harmonic",
    "samp5_weighted",
    "g_msf",
    "g_ktruss",
    "g_scc_components",
    "d14_semdedup",
    "d15_dsir_weights",
    "s13_ivfpq_search",
    "mm4_media_neardup",
    "a1_table_counts",
    "a2_orders_per_customer",
    "a3_weighted_size",
    "agg_cube_docs",
    "agg_rollup_status",
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
    "g_j1_bfs_hops",
    "g_j1_sssp_weighted",
    "g_p5_successors",
    "geo_a4_linestring_length",
    "geo_f6_haversine_within",
    "geo_j3_bbox_count",
    "geo_o1_knn",
    "j2_revenue_by_nation",
    "j_outer_order_counts",
    "m1_keyed_update",
    "m2_delete_keys",
    "mm1_binary_meta",
    "o1_top10_orders",
    "p2_point_lookup",
    "p4_semi_join",
    "p4b_anti_join",
    "p7_distinct_pairs",
    "q1_pricing_summary",
    "s1_fwd_rev_ingest",
    "s2_cosine_top10",
    "s3_knn_join",
    "s4_lsh_buckets",
    "set_except_custkeys",
    "set_intersect_custkeys",
    "t1_doc_stats",
    "t2_stopword_langid",
    "t3_fingerprint",
    "t4_quality_score",
    "u1_union_parties",
    "u2_last_write_wins",
    "u3_union_missing_cols",
    "w1_top3_per_customer",
    "g_betweenness",
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
