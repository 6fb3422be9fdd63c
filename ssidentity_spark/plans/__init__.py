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
    # flagship + TPC-H star-schema joins (tpch / tpch2)
    "flagship_hourly_top_types",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "j1_region_revenue",
    "j9_q3_top_orders",
    "j9_q5_local_supplier_volume",
    "j8_cross_region_nation",
    "w1_distribution_ranks",
    "j9_q16_supplier_variety",
    "tpch_q7_volume_shipping",
    # third-wave TPC-H shapes (tpch3)
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_global_sales_opportunity",
    # fourth-wave TPC-H shapes (tpch4)
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    # ROTATED IN r4: never-driver-verified TPC-H analogs (r1-r3 green slots
    # a2/a4/pivot/a10/o3/o4/w3 parked on their CORRECTNESS history)
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_value",
    "tpch_q14_promo_share",
    "tpch_q18_big_orders",
    "tpch_q20_excess_suppliers",
    "tpch_q4_priority_count",
    "j9_q10_returned_revenue",
    "j3_customers_without_orders",
    # events analytics: exact percentiles NEW in r4 — the hash-matchable
    # companion that upgrades A8 from rows-only (the GK sketch stays
    # registered past the window as the bounded-memory variant)
    "a8_exact_percentiles",
    "agg_ordered_listagg",
    "unpivot_customer_metrics",
    # window functions: w2_event_gaps/w4_sessionize/j4/j5 crashed in r3 on
    # the TIMESTAMP_NTZ testdata change (fixed: functions/timeutil.epoch_us)
    # — kept windowed so the driver re-records them green before any parking
    "w2_event_gaps",
    "w4_sessionize",
    # non-equi joins
    "j4_range_join_funnel",
    "j5_asof_last_login",
    # LLM-pipeline: dedup family (minhash/simhash/embedding pair-gen parked
    # with r2+r3 driver-green rows; cc_clusters keeps the iterative-fixpoint
    # oracle shape in the window)
    "dedup_exact",
    "dedup_cc_clusters",
    # LLM-pipeline: training-data preparation — split/stratify first-timers
    # in, clean/quantize parked on r2+r3 green rows
    "pipe_split_assign",
    "pipe_stratified_sample",
    # LLM-pipeline: similarity search — pinned-centroid IVF NEW in r4
    # (hash-matchable twin of sim_ivf_topk), multiprobe LSH first-timer
    "sim_topk_bruteforce",
    "sim_lsh_multiprobe",
    "sim_ivf_pinned_topk",
    # LLM-pipeline: text analysis — tfidf first-timer in, quality/langid/
    # bigram parked on r2+r3 green rows
    "text_token_stats",
    "text_tfidf_top_terms",
    # LLM-pipeline: multimodal binary columns — frame-sample fan-out
    # first-timer joins the decoded-features headliner
    "mm_decoded_features",
    "mm_frame_sample",
    # scalar-function surface
    "d1_fspl_distance",
    "d7_date_funcs",
    # SQL API surface — daily-type-summary first-timer joins the r1-green
    # nation_order_stats
    "sql_api_nation_order_stats",
    "sql_api_daily_type_summary",
    # reference sniffer pipeline (rows-only: no SQL-expressible oracle)
    "ref_parse_pipeline",
    "ref_trilateration",
)

# r5 ROTATION QUEUE (update DRIVER_VERIFIED_HISTORY from CORRECTNESS_r04
# via tools/driver_history.py first): swap r4-green first-timers out for
# the remaining never-driver-verified oracled queries — text_fingerprint,
# sql_api_source_quality_rank, j3_active_customer_nations,
# j2_supplier_volume, j1_brand_pricing, pivot_status_by_priority,
# agg_percentiles, agg_min_max_by, j9_above_nation_avg — plus the late-r4
# additions pipe_decontaminate, pipe_domain_mix, text_repetition_scores,
# j5_asof_payload, corpus_length_profile. Keep the 9 bench headliners.

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
        "a9_cube_type_dow",
        "a9_rollup_type_hour",
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
        "j4_range_join_funnel",
        "j5_asof_last_login",
        "j8_cross_region_nation",
        "j9_q16_supplier_variety",
        "j9_q2_min_cost_supplier",
        "j9_q3_top_orders",
        "j9_q5_local_supplier_volume",
        "mm_binary_metadata",
        "mm_decoded_features",
        "o1_global_sort_top",
        "o3_union_split",
        "o4_except_users",
        "o4_intersect_users",
        "pipe_docs_clean",
        "pipe_embed_quantize",
        "pivot_user_type_matrix",
        "sim_label_centroids",
        "sim_lsh_bucketed",
        "sim_topk_bruteforce",
        "sql_api_nation_order_stats",
        "text_bigram_profile",
        "text_langid",
        "text_quality",
        "text_token_stats",
        "tpch_q12_late_priority",
        "tpch_q13_custdist",
        "tpch_q15_top_supplier",
        "tpch_q17_small_quantity_revenue",
        "tpch_q19_disjunctive_revenue",
        "tpch_q1_pricing_summary",
        "tpch_q21_waiting_suppliers",
        "tpch_q22_global_sales_opportunity",
        "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping",
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
