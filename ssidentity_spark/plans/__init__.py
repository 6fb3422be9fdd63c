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
# r9 ROTATION (executes the queue staged at the end of r8, per VERDICT r8
# asks #1-2): bench headliners stay windowed (perf artifact and
# correctness artifact must cover the same set), THEN the 8 first-timers
# — the 7 late-r8 queries that landed after the window filled (local
# 7/7 PASS at sf0.01 in r8, never driver-recorded) plus
# text_inverted_postings, r8's one driver-red row (raw array<long>
# output crashed the driver canonicalizer; now flattened to CSV per the
# repo convention and local-green) — THEN per-module anchors (stalest
# history member of each module the queue alone leaves unwindowed —
# module coverage outranks strict age), THEN strict staleness-ordered
# re-verification: the r1 vintage, then the r3 vintage. New r9
# first-time hash candidates displace the queue TAIL (the newest
# staleness slots) as they land — first-time verification grows the
# cumulative set, so it outranks refreshing fresher history, while the
# stalest r1/r3 entries at the head keep their slots.
DRIVER_WINDOW: tuple[str, ...] = (
    # bench headliners (window rule: every bench=True query stays windowed)
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
    "ts_gapfill_interpolate",
    "graph_pagerank",
    "j10_bloom_pruned_join",
    "w5_max_concurrency",
    "pipe_pack_sequences",
    "dedup_semantic_cells",
    # the 8 first-timers: 7 late-r8 queries (never driver-recorded) + the
    # repaired r8 driver-red row — first priority, like prior rounds' late
    # batches
    "text_inverted_postings",
    "j11_fuzzy_symspell",
    "dedup_span_exact",
    "dedup_span_trim",
    "dedup_incremental_pairs",
    "pipe_temperature_mix",
    "sim_filtered_topk",
    "src_in_pushdown_scan",
    # per-module anchors: stalest history-green member of each module the
    # queue alone leaves unwindowed (last-green rounds in parens)
    "ref_parse_pipeline",  # reference_pipeline (r6)
    "d1_fspl_distance",  # scalars (r5)
    "sql_api_source_quality_rank",  # sqlapi (r5)
    "tpch_q13_custdist",  # tpch3 (r5)
    "tpch_q21_waiting_suppliers",  # tpch4 (r4)
    # NEW in r9 wave 6: the retrieval-eval scorecard — precision/recall/
    # MRR/NDCG@k of the exact cosine ranking against label qrels, the
    # harness the ANN tiers are tuned against, fully relational and
    # hash-gated (a9_rollup_type_hour — the last r1-vintage
    # re-verification slot — parks to the r10 queue; first-time
    # verification grows the cumulative set, re-verification doesn't)
    "sim_retrieval_eval",
    # staleness rotation: r3 vintage — all six displaced to the r10 queue
    # by the wave-3 first-timers below (a10_heavy_hitters, a2_habitual_hour,
    # a4_distinct_pairs, dedup_embedding_cosine, dedup_simhash_pairs, with
    # text_langid / text_quality / w3_rolling_avg_rows never windowed)
    # NEW in r9: RAG-style overlapping chunking — fixed token windows
    # with stable offsets, chunk md5 under the hash, zero-shuffle map
    # (o3_union_split parks to history, next in the r10 queue)
    "pipe_chunk_documents",
    # NEW in r9: leakage-safe splitting — the md5 split rule applied to
    # the near-dup CLUSTER id, so no test doc has a train-side near-copy
    # (o4_intersect_users parks to history, next in the r10 queue)
    "pipe_cluster_safe_split",
    # NEW in r9: budgeted quality-ordered selection — the global prefix
    # sum in its two-phase scalable form, cum_before under the hash
    # (pipe_docs_clean parks to history, next in the r10 queue)
    "pipe_token_budget",
    # NEW in r9: quality-aware canonical selection per near-dup cluster
    # (keep the longest copy, not the min-id one) — clustering AND the
    # selection rule under one hash (pipe_embed_quantize parks)
    "dedup_cluster_keep_best",
    # NEW in r9: exact containment + Jaccard verify stage over LSH
    # candidate pairs — the asymmetric subset signal doc-level scores
    # miss (pivot_user_type_matrix parks)
    "dedup_containment_pairs",
    # NEW in r9: RESTORE — the rollback verb, manifest-only commit;
    # deleted-era time travel and the zero-copy claim under the hash
    # (sim_label_centroids parks to history, next in the r10 queue)
    "src_restore_timetravel",
    # NEW in r9: the maintained-band-index form of incremental dedup —
    # v0 bootstraps the signature table, the delta appends only its own
    # rows, the probe reads the index from storage (VERDICT r8 ask #5).
    "dedup_incremental_maintained",
    # NEW in r9: filtered ANN composed with the pinned-IVF index —
    # candidates = probed cells ∩ label, recall curve in SCALE.md
    # (VERDICT r8 stretch #8). (sim_lsh_bucketed and text_bigram_profile
    # park to history, next in the r10 queue.)
    "sim_filtered_ivf_topk",
    # NEW in r9 wave 3: CLONE — the branching verb next to RESTORE's
    # rollback; zero-copy + independent-evolution + vacuum-ownership
    # claims in one hash (a2_habitual_hour parks to the r10 queue)
    "src_clone_shallow",
    # NEW in r9 wave 3: DLT-style expectations with a quarantine side
    # output — named rules, severities, NULL-as-violation pinned
    # (a4_distinct_pairs parks to the r10 queue)
    "pipe_expectations_quarantine",
    # NEW in r9 wave 3: deterministic fixed-size shard export — the
    # training-loader handoff; the gate reads the EXPORTED files and pins
    # the physical row-order claim (dedup_embedding_cosine parks)
    "pipe_shard_export",
    # NEW in r9 wave 3: Naive Bayes trained AS aggregation — the
    # fasttext-shaped corpus filter with the model itself under the hash
    # (dedup_simhash_pairs parks to the r10 queue)
    "text_nb_classifier",
    # NEW in r9 wave 3: content-defined chunking — shift-stable chunk
    # dedup (rolling-gram cut rule, running-sum assignment, reassembled
    # chunk md5 and cross-doc sharing all under one hash); insertion
    # re-sync pinned by pytest (a10_heavy_hitters parks to the r10 queue)
    "dedup_cdc_chunks",
    # NEW in r9 wave 4: video keyframe near-dup — keyframe gradient
    # signatures + corpus-wide sharing counts, byte-math oracle from the
    # raw text bytes (w3_rolling_count_10min parks to the r10 queue)
    "mm_video_keyframe_dedup",
    # NEW in r9 wave 4: logistic regression trained as 6 relational
    # gradient rounds — the oracle replays the whole descent as unrolled
    # CTEs, so the training loop itself is hash-gated; learning (not just
    # determinism) pinned by pytest (w2_transitions parks to the r10
    # queue)
    "text_logreg_train",
    # NEW in r9 wave 4: temperature-weighted mixture selection — per-
    # source n^0.5 budget shares spent in quality order, every cumulative
    # window source-partitioned (o4_except_users parks to the r10 queue)
    "pipe_mixture_select",
    # NEW in r9 wave 4: winnowing fingerprints (MOSS) — rightmost-minimal
    # k-gram hash per window as a plain array_min over a sortable
    # composite key; the W+k-1 guarantee pinned by pytest
    # (o1_global_sort_top parks to the r10 queue)
    "text_winnow_fingerprints",
)

# r10 ROTATION QUEUE: after CORRECTNESS_r09 lands, regenerate
# DRIVER_VERIFIED_HISTORY (tools/driver_history.py). FIRST the fourteen
# r9-new-but-parked queries (every r9 slot spent on other first-timers;
# each local-green at all three SFs): text_sparse_cosine_pairs,
# text_wordpiece_tokenize, sim_ann_recall_eval, pipe_quality_fusion,
# a8_hll_set_algebra, dedup_stopgram_remove, pipe_k_anonymity,
# ts_m4_downsample, dedup_lsh_recall_eval, pipe_dataset_card,
# pipe_cross_source_leakage, sim_ivf_probe_curve,
# pipe_split_leakage_eval, text_ngram_novelty — they lead the r10
# window (fourteen parked first-timers) and claim their U6g / T10c /
# E1b / X22 / A8b / X23 / X24 / TS3 / E2 / X25 / X26 / E1c / E3 / U6h
# survey rows there (SURVEY §2.10-2.11 rows added this session). Then
# any r10-new queries.
# Then rotation is pure staleness order: the displaced r1/r3
# entries — r9's eighteen new first-timers pushed out, oldest-display
# first: the r1 vintage five (w3_rolling_count_10min, w2_transitions,
# o4_except_users, o1_global_sort_top, a9_rollup_type_hour — these were
# the stale re-verification slots, so they lead the r10 queue) and the r3 set
# (o3_union_split, o4_intersect_users, pipe_docs_clean,
# pipe_embed_quantize, pivot_user_type_matrix, sim_label_centroids,
# sim_lsh_bucketed, text_bigram_profile, a2_habitual_hour,
# a4_distinct_pairs, dedup_embedding_cosine, dedup_simhash_pairs,
# a10_heavy_hitters) plus the never-windowed r3 rest
# (text_langid, text_quality, w3_rolling_avg_rows), then the r4 vintage
# (j3_customers_without_orders, j8_cross_region_nation,
# j9_q10_returned_revenue, j9_q5_local_supplier_volume,
# pipe_split_assign, pipe_stratified_sample, tpch_q14_promo_share,
# tpch_q18_big_orders, ...), then r5, oldest-first, with the per-module
# coverage rule outranking strict age as usual.
# Queries hash-verified green by the driver in at least one prior round
# (union of CORRECTNESS_r01..r08.json rows with hash_match=true). A query
# may be parked past the window ONLY if it appears here — its green row is
# the standing evidence — so rotation strictly grows the cumulative
# driver-verified set. Regenerate via tools/driver_history.py.
DRIVER_VERIFIED_HISTORY: frozenset[str] = frozenset(
    {
        "a10_heavy_hitters",
        "a11_type_correlation",
        "a12_equidepth_histogram",
        "a13_analyze_profile",
        "a1_user_interests",
        "a2_active_hours",
        "a2_habitual_hour",
        "a3_network_tree",
        "a4_distinct_pairs",
        "a4_mac_key_rollup",
        "a6_value_stats",
        "a8_countmin_estimates",
        "a8_exact_percentiles",
        "a8_hll_distinct",
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
        "dedup_image_neardup_pairs",
        "dedup_jaccard_topk",
        "dedup_minhash_lsh_pairs",
        "dedup_minhash_signatures",
        "dedup_semantic_cells",
        "dedup_semantic_trained",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "flagship_hourly_top_types",
        "graph_pagerank",
        "graph_triangles",
        "ivm_daily_rollup",
        "j10_bloom_pruned_join",
        "j11_fuzzy_part_match",
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
        "mm_audio_features",
        "mm_avi_frames",
        "mm_binary_metadata",
        "mm_decoded_features",
        "mm_flac_decode",
        "mm_frame_sample",
        "mm_gif_decode",
        "mm_image_dhash",
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
        "pipe_end_to_end",
        "pipe_global_row_ids",
        "pipe_pack_nosplit",
        "pipe_pack_sequences",
        "pipe_pii_redact",
        "pipe_split_assign",
        "pipe_stratified_sample",
        "pipe_tokenize_pack",
        "pipe_weighted_sample",
        "pivot_status_by_priority",
        "pivot_user_type_matrix",
        "ref_companion_clusters",
        "ref_parse_pipeline",
        "ref_trilateration",
        "ref_trilateration_inputs",
        "ref_visit_sessions",
        "ref_watchlist_alerts",
        "s5_cdc_apply",
        "s5_merge_upsert",
        "s5_scd2_history",
        "sim_ivf_pinned_topk",
        "sim_ivf_topk",
        "sim_ivf_topk_distributed",
        "sim_ivfpq_rerank_topk",
        "sim_ivfpq_topk",
        "sim_label_centroids",
        "sim_lsh_bucketed",
        "sim_lsh_multiprobe",
        "sim_pq_adc_topk",
        "sim_probe_batch",
        "sim_topk_bruteforce",
        "sql_api_daily_type_summary",
        "sql_api_grouping_sets",
        "sql_api_nation_order_stats",
        "sql_api_source_quality_rank",
        "src_avro_roundtrip",
        "src_change_feed",
        "src_change_feed_deletes",
        "src_change_feed_updates",
        "src_compacted_timetravel",
        "src_datasource_scan",
        "src_delete_dv",
        "src_delete_where",
        "src_interchange_roundtrip",
        "src_managed_lookup",
        "src_merge_versioned",
        "src_minmax_range_scan",
        "src_range_pushdown_scan",
        "src_schema_evolution",
        "src_update_where",
        "src_versioned_timetravel",
        "text_bigram_logprob",
        "text_bigram_profile",
        "text_bm25_scores",
        "text_bpe_tokenize",
        "text_bpe_train",
        "text_fingerprint",
        "text_langid",
        "text_quality",
        "text_repetition_scores",
        "text_source_kl_divergence",
        "text_tfidf_top_terms",
        "text_token_stats",
        "text_unigram_logprob",
        "text_wordpiece_train",
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
        "ts_ema",
        "ts_gapfill_interpolate",
        "unpivot_customer_metrics",
        "w1_distribution_ranks",
        "w2_event_gaps",
        "w2_transitions",
        "w2_value_functions",
        "w3_rolling_avg_rows",
        "w3_rolling_count_10min",
        "w4_sessionize",
        "w5_max_concurrency",
        "w6_funnel_progression",
        "zorder_key",
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
