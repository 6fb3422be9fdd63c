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
    graph,
    multimodal,
    pipeline,
    reference_pipeline,
    scalars,
    similarity,
    sources,
    sqlapi,
    text,
    timeseries,
    tpch,
    tpch2,
    tpch3,
    tpch4,
)
from ssidentity_spark.registry import REGISTRY

# The 50 queries the driver's correctness gate will record, in order.
# Selection rule: >=1 query per module, every bench.py headline query, and —
# round 3+ — ROTATION. r6 policy shift (VERDICT r5 ask #8): after r5 every
# oracled query is driver-verified at least once, so never-verified-first
# rotation is retired in favour of STALENESS-ordered re-verification —
# window = bench headliners + this round's new oracles (the trained-ANN
# snapshot family + the closed-form trilateration solve, all first-time
# hash candidates) + the ref_* snapshot-oracle family (machinery changed
# this round, re-record it) + the least-recently driver-verified greens
# (r1 vintage first, then r3 — none had been re-run under the driver since
# their first green). §2-row coverage stays CUMULATIVE: window ∪
# driver-green-history covers every batch-testable row
# (tests/test_registry_window.py enforces it).
DRIVER_WINDOW: tuple[str, ...] = (
    # bench headliners (window rule: every bench=True query stays windowed
    # so the perf artifact and the correctness artifact cover the same
    # set). r6 adds mm_png_decode — the Arrow-decode headliner.
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
    "mm_png_decode",
    # FIRST-TIME hash candidates (r6): trained-model snapshot oracles for
    # the ANN family (VERDICT r5 ask #1) + the closed-form 2x2
    # normal-equation trilateration oracle (ask #2)
    "sim_ivf_topk",
    "sim_ivf_topk_distributed",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "ref_trilateration",
    # reference sniffer pipeline — snapshot-oracle family, re-recorded
    "ref_parse_pipeline",
    "ref_trilateration_inputs",
    "ref_visit_sessions",
    "ref_companion_clusters",
    "ref_watchlist_alerts",
    # NEW in r6: the composed intake pipeline (clean → decontaminate →
    # split as one plan) — a first-time hash candidate; a1_user_interests
    # parks to history to make room (analytics stays multiply covered)
    "pipe_end_to_end",
    # NEW in r6: hypertable-style gap-fill + linear interpolation — a
    # first-time hash candidate (d7_math_funcs parks to history; the d7
    # scalar family keeps three other windowed members)
    "ts_gapfill_interpolate",
    # NEW in r6: fixed-iteration PageRank on the user-transition graph —
    # first-time hash candidate (d7_from_json_struct parks to history)
    "graph_pagerank",
    # NEW in r6: Rice-coded FLAC compress→decompress under the hash gate
    # (dedup_simhash parks to history; dedup keeps four windowed members)
    "mm_flac_decode",
    # NEW in r6: cross-format Avro container roundtrip — first-time hash
    # candidate (dedup_minhash_signatures parks; dedup keeps three
    # windowed members incl. both bench headliners)
    "src_avro_roundtrip",
    # NEW in r6: correlation matrix, MERGE upsert, SCD2 effective-dating
    # (a9_cube_type_dow / d7_array_manipulation / a4_mac_key_rollup park
    # to history; each family keeps windowed siblings)
    "a11_type_correlation",
    "s5_merge_upsert",
    "s5_scd2_history",
    # NEW in r6: the md5-deterministic sketches — Count-Min and HLL under
    # the hash gate for the first time (a2_active_hours + a6_value_stats
    # park to history)
    "a8_countmin_estimates",
    "a8_hll_distinct",
    # NEW in r6: incremental view maintenance — merged partials proven
    # bit-identical to a full recompute (d7_array_funcs parks; d7 keeps
    # two windowed members)
    "ivm_daily_rollup",
    # NEW in r6: the z-order bit-interleave primitive (mm_binary_metadata
    # parks; mm keeps three decode queries windowed)
    "zorder_key",
    # NEW in r6: Bloom-filter join pruning — first-time hash candidate;
    # the oracle is the PLAIN join, so the green row proves the map-side
    # pre-filter changed nothing (d7_string_funcs parks to history; d7
    # keeps d7_json_extract + d7_date_funcs coverage via history)
    "j10_bloom_pruned_join",
    # NEW in r6: CDC changelog compaction (latest-wins + tombstones) —
    # first-time hash candidate (o4_except_users parks to history; the O4
    # §2 row stays covered by its history-green rows and the module keeps
    # many windowed analytics siblings)
    "s5_cdc_apply",
    # NEW in r6: day-bucketed interval sweep line (max concurrency) —
    # first-time hash candidate (w3_rolling_count_10min parks to history;
    # W3 stays covered by its green rows and w2_transitions below)
    "w5_max_concurrency",
    # NEW in r6: the AVI video-container walk (RIFF hdrl/movi/idx1 →
    # DIB frame decode → keyframe sample) — first-time hash candidate
    # (a9_rollup_type_hour parks to history; A9 keeps green rows and
    # pivot siblings in history)
    "mm_avi_frames",
    # NEW in r6: weight-proportional priority sampling (transcendental-
    # free so the boundary is bit-stable cross-engine) — first-time hash
    # candidate (o1_global_sort_top parks to history; O1/O2 stay covered
    # by green rows and the windowed j9_q3 TakeOrdered)
    "pipe_weighted_sample",
    # NEW in r6: BPE tokenizer training + tokenization under the hash
    # gate — the oracle replays all 6 training rounds as unrolled CTEs
    # (dedup_jaccard_topk and w2_transitions park to history; dedup keeps
    # both bench headliners, W2 stays covered by green rows, and
    # j9_q2_min_cost_supplier stays windowed as extras' module anchor)
    "text_bpe_train",
    "text_bpe_tokenize",
    # NEW in r6: GROUPING SETS lattice + equi-depth histogram profiling
    # (a3_network_tree and sql_api_daily_type_summary park to history;
    # sql_api_grouping_sets anchors the sqlapi module in their place)
    "sql_api_grouping_sets",
    "a12_equidepth_histogram",
    # NEW in r6: triple cross-format gate — ORC + CSV (RFC 4180
    # multiline) + JSONL round-trips meeting in one join
    # (text_unigram_logprob parks to history; text keeps token_stats and
    # both BPE queries windowed; q11/q12 stay as tpch4/tpch3 anchors)
    "src_interchange_roundtrip",
    # staleness rotation: the r1-vintage greens (never re-verified
    # since round 1) ...
    "d7_json_extract",
    "j9_q2_min_cost_supplier",
    # NEW in r6 (first-time hash candidates take the last r3-vintage
    # slots; a10_heavy_hitters + a2_habitual_hour park to history — both
    # lead the r7 queue):
    # ... and the GIF-LZW roundtrip under the Arrow path
    "mm_gif_decode",
    "tpch_q12_late_priority",
    "tpch_q11_important_value",
    # ... with the last three slots spent on the stalest member of each
    # module the staleness order alone would have left unwindowed (the
    # per-module coverage rule outranks strict age order)
)

# r7 ROTATION QUEUE (after regenerating DRIVER_VERIFIED_HISTORY from
# CORRECTNESS_r06 via tools/driver_history.py). FIRST the r6 queries that
# never fit the 50-slot window and so have only LOCAL gate evidence:
# text_unigram_logprob, graph_triangles, a13_analyze_profile, ts_ema,
# src_versioned_timetravel, w6_funnel_progression, src_managed_lookup,
# src_datasource_scan.
# THEN
# staleness-ordered rotation —
# keep the bench headliners, then the remaining r3 vintage
# (a10_heavy_hitters, a2_habitual_hour, a4_distinct_pairs,
# dedup_embedding_cosine, dedup_simhash_pairs, o3_union_split,
# o4_intersect_users, pipe_docs_clean, pipe_embed_quantize,
# pivot_user_type_matrix, sim_label_centroids, sim_lsh_bucketed,
# text_bigram_profile, text_langid, text_quality, w3_rolling_avg_rows),
# then the r4 vintage, then the r1-vintage slots this round displaced
# (d7_string_funcs, o4_except_users, w3_rolling_count_10min,
# a9_rollup_type_hour, o1_global_sort_top, dedup_jaccard_topk,
# w2_transitions, a3_network_tree, sql_api_daily_type_summary,
# tpch_q12's tpch3 sibling rotation).

# Queries hash-verified green by the driver in at least one prior round
# (union of CORRECTNESS_r01..r05.json rows with hash_match=true). A query
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
        "agg_min_max_by",
        "agg_ordered_listagg",
        "agg_percentiles",
        "corpus_length_profile",
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
        "j1_brand_pricing",
        "j1_region_revenue",
        "j2_supplier_volume",
        "j3_active_customer_nations",
        "j3_customers_without_orders",
        "j4_range_join_funnel",
        "j5_asof_last_login",
        "j5_asof_payload",
        "j8_cross_region_nation",
        "j9_above_nation_avg",
        "j9_q10_returned_revenue",
        "j9_q16_supplier_variety",
        "j9_q2_min_cost_supplier",
        "j9_q3_top_orders",
        "j9_q5_local_supplier_volume",
        "mm_binary_metadata",
        "mm_decoded_features",
        "mm_frame_sample",
        "mm_png_decode",
        "mm_wav_decode",
        "o1_global_sort_top",
        "o3_union_split",
        "o4_except_users",
        "o4_intersect_users",
        "pipe_decontaminate",
        "pipe_docs_clean",
        "pipe_domain_mix",
        "pipe_embed_quantize",
        "pipe_split_assign",
        "pipe_stratified_sample",
        "pivot_status_by_priority",
        "pivot_user_type_matrix",
        "ref_companion_clusters",
        "ref_parse_pipeline",
        "ref_trilateration_inputs",
        "ref_visit_sessions",
        "ref_watchlist_alerts",
        "sim_ivf_pinned_topk",
        "sim_label_centroids",
        "sim_lsh_bucketed",
        "sim_lsh_multiprobe",
        "sim_probe_batch",
        "sim_topk_bruteforce",
        "sql_api_daily_type_summary",
        "sql_api_nation_order_stats",
        "sql_api_source_quality_rank",
        "text_bigram_profile",
        "text_fingerprint",
        "text_langid",
        "text_quality",
        "text_repetition_scores",
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
