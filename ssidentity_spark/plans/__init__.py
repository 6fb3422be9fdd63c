"""Driver-facing query plans. Importing this package registers every query.

Modules (one per SURVEY.md §2 family):
- analytics  — aggregations / windows / set ops over ``events`` (A*, W*, O*)
- tpch       — join-heavy queries over the star schema (J*)
- scalars    — scalar-function surface incl. FSPL math (D1, D7)
- dedup      — exact + MinHash-LSH + SimHash + Jaccard + embedding near-dup
- similarity — ANN / top-k cosine over ``embeddings`` (U5)
- text       — language-ID, quality, tokens, fingerprints over ``documents`` (U6)
- multimodal — binary-column plumbing (decode stubs, typed metadata)

Registration ORDER is part of the driver contract: the driver's correctness
gate records the first 50 ``queries()`` entries in insertion order, so
``DRIVER_WINDOW`` below pins an explicit 50-query priority set chosen to
cover every module and every SURVEY §2 row (round 1 shipped 32 queries —
the whole tpch/similarity/text surface — outside the window because modules
registered alphabetically). Queries past the window stay registered: they
are still part of the public surface and the local oracle harness
(tests/test_queries_oracle.py, tools/check_correctness.py) runs all of
them; they are redundant *variants* of rows already driver-verified by a
windowed query (tests/test_registry_window.py enforces exactly that).
"""

from ssidentity_spark.plans import (  # noqa: F401
    analytics,
    dedup,
    extras,
    multimodal,
    pipeline,
    reference_pipeline,
    scalars,
    similarity,
    sqlapi,
    text,
    tpch,
    tpch2,
    tpch3,
    tpch4,
)
from ssidentity_spark.registry import REGISTRY

# The 50 queries the driver's correctness gate will record, in order.
# Selection rule: >=1 query per module, every bench.py headline query, and —
# round 3+ — ROTATION: queries the driver has hash-verified green in >=2
# prior rounds park past the window (their CORRECTNESS_r*.json rows stand as
# evidence) to make room for queries the driver has never seen. §2-row
# coverage is therefore CUMULATIVE: window ∪ driver-green-history must cover
# every batch-testable row (tests/test_registry_window.py enforces both the
# cumulative cover and that each rotation adds first-time-verified queries).
# Rows-only entries are admitted only where no oracled query can evidence
# the row.
DRIVER_WINDOW: tuple[str, ...] = (
    # bench headliners (window rule: every bench=True query stays windowed
    # so the perf artifact and the correctness artifact cover the same set).
    # r5 adds three EXT-family headliners (VERDICT r4 ask #6).
    "flagship_hourly_top_types",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "j1_region_revenue",
    "j9_q3_top_orders",
    "j4_range_join_funnel",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "sim_topk_bruteforce",
    "sim_ivfpq_rerank_topk",
    "text_token_stats",
    "pipe_decontaminate",
    # ROTATED IN r5: the 13 remaining never-driver-verified oracled queries
    # (VERDICT r4 ask #2 — after this round cumulative driver verification
    # covers every oracled query in the registry)
    "j5_asof_payload",
    "text_fingerprint",
    "text_repetition_scores",
    "corpus_length_profile",
    "pipe_domain_mix",
    "sql_api_source_quality_rank",
    "j3_active_customer_nations",
    "j2_supplier_volume",
    "j1_brand_pricing",
    "pivot_status_by_priority",
    "agg_percentiles",
    "agg_min_max_by",
    "j9_above_nation_avg",
    # reference sniffer pipeline — r5 gives visits/companions/watchlist (and
    # the parse-derivation columns) snapshot-backed DuckDB oracles
    # (VERDICT r4 ask #3)
    "ref_parse_pipeline",
    "ref_trilateration",
    "ref_trilateration_inputs",
    "ref_visit_sessions",
    "ref_companion_clusters",
    "ref_watchlist_alerts",
    # ANN distributed-trainer variant: rows-only by nature (k-means model),
    # windowed so the driver artifact at least records its row evidence
    "sim_ivf_topk_distributed",
    # re-verification picks (all history-green): the r3 NTZ-breakage set,
    # the r4 first-timer oracles, and >=1 query per module
    "a8_exact_percentiles",
    "w2_event_gaps",
    "w4_sessionize",
    "j5_asof_last_login",
    "dedup_cc_clusters",
    "sim_ivf_pinned_topk",
    "sim_lsh_multiprobe",
    "sim_probe_batch",
    "text_tfidf_top_terms",
    "mm_decoded_features",
    "mm_frame_sample",
    "mm_png_decode",
    "mm_wav_decode",
    "d1_fspl_distance",
    "j9_q16_supplier_variety",
    "w2_value_functions",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
)

# r6 ROTATION QUEUE (after regenerating DRIVER_VERIFIED_HISTORY from
# CORRECTNESS_r05 via tools/driver_history.py): if the r5 window went
# green, every oracled query in the registry is driver-verified — no
# first-timers remain, so r6's window rotates for REGRESSION breadth:
# keep the 12 bench headliners + the ref_* family (the snapshot-oracle
# machinery is new, re-record it), then fill with the least-recently
# driver-verified green queries (r1/r2 vintages first: a1/a2/a3/o1/o3/o4,
# d7_*, w2/w3 variants, sim_lsh_bucketed, text_quality/langid,
# pipe_docs_clean/embed_quantize). Rows-only slots stay limited to
# ref_trilateration + the trainer-based ANN variants.

# Queries hash-verified green by the driver in at least one prior round
# (union of CORRECTNESS_r01..r03.json rows with hash_match=true). A query
# may be parked past the window ONLY if it appears here — its green row is
# the standing evidence — so rotation strictly grows the cumulative
# driver-verified set. Regenerate via tools/driver_history.py.
DRIVER_VERIFIED_HISTORY: frozenset[str] = frozenset(
    {
        "a10_heavy_hitters",
        "a1_user_interests",
        "a2_active_hours",
        "a2_habitual_hour",
        "a3_network_tree",
        "a4_distinct_pairs",
        "a4_mac_key_rollup",
        "a6_value_stats",
        "a8_exact_percentiles",
        "a9_cube_type_dow",
        "a9_rollup_type_hour",
        "agg_ordered_listagg",
        "d1_fspl_distance",
        "d7_array_funcs",
        "d7_array_manipulation",
        "d7_date_funcs",
        "d7_from_json_struct",
        "d7_json_extract",
        "d7_math_funcs",
        "d7_string_funcs",
        "dedup_cc_clusters",
        "dedup_embedding_cosine",
        "dedup_exact",
        "dedup_jaccard_topk",
        "dedup_minhash_lsh_pairs",
        "dedup_minhash_signatures",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "flagship_hourly_top_types",
        "j1_region_revenue",
        "j3_customers_without_orders",
        "j4_range_join_funnel",
        "j5_asof_last_login",
        "j8_cross_region_nation",
        "j9_q10_returned_revenue",
        "j9_q16_supplier_variety",
        "j9_q2_min_cost_supplier",
        "j9_q3_top_orders",
        "j9_q5_local_supplier_volume",
        "mm_binary_metadata",
        "mm_decoded_features",
        "mm_frame_sample",
        "o1_global_sort_top",
        "o3_union_split",
        "o4_except_users",
        "o4_intersect_users",
        "pipe_docs_clean",
        "pipe_embed_quantize",
        "pipe_split_assign",
        "pipe_stratified_sample",
        "pivot_user_type_matrix",
        "sim_ivf_pinned_topk",
        "sim_label_centroids",
        "sim_lsh_bucketed",
        "sim_lsh_multiprobe",
        "sim_topk_bruteforce",
        "sql_api_daily_type_summary",
        "sql_api_nation_order_stats",
        "text_bigram_profile",
        "text_langid",
        "text_quality",
        "text_tfidf_top_terms",
        "text_token_stats",
        "tpch_q11_important_value",
        "tpch_q12_late_priority",
        "tpch_q13_custdist",
        "tpch_q14_promo_share",
        "tpch_q15_top_supplier",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_big_orders",
        "tpch_q19_disjunctive_revenue",
        "tpch_q1_pricing_summary",
        "tpch_q20_excess_suppliers",
        "tpch_q21_waiting_suppliers",
        "tpch_q22_global_sales_opportunity",
        "tpch_q4_priority_count",
        "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_profit_by_nation",
        "unpivot_customer_metrics",
        "w1_distribution_ranks",
        "w2_event_gaps",
        "w2_transitions",
        "w2_value_functions",
        "w3_rolling_avg_rows",
        "w3_rolling_count_10min",
        "w4_sessionize",
    }
)

# §2 rows whose only evidence is pytest (streaming semantics the batch
# oracle gate cannot exercise) — exempt from the window-coverage invariant.
PYTEST_ONLY_SURVEY_ROWS = frozenset({"J6"})


def _apply_window_order() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names unknown queries: {missing}")
    windowed = set(DRIVER_WINDOW)
    tail = [n for n in REGISTRY if n not in windowed]
    ordered = {n: REGISTRY[n] for n in (*DRIVER_WINDOW, *tail)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window_order()
