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
# Selection rule: >=1 query per module, >=1 oracled query per batch-testable
# SURVEY §2 row, all bench.py headline queries included; rows-only entries
# (sketches / iterative / reference-pipeline) are admitted only where no
# oracled query can evidence the row.
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
    # third-wave TPC-H shapes (tpch3): Q12 fact-fact residual, Q13 outer
    # join + two-level agg, Q19 disjunctive pushdown, Q22 threshold + anti
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_global_sales_opportunity",
    # fourth-wave TPC-H shapes (tpch4): Q15 view+max join-back, Q17
    # decorrelated per-key average, Q21 window-decorrelated EXISTS pair
    # (q11/q20/q8/j3-anti stay registered past the window — every §2 row
    # they evidence is carried by a windowed sibling)
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    # events analytics: aggregation families (a3/a6/a9-rollup/mm-metadata
    # parked with r01 driver-green rows on file to make room for tpch3)
    "a2_habitual_hour",
    "a4_distinct_pairs",
    "a8_approx_quantiles",
    "pivot_user_type_matrix",
    "a10_heavy_hitters",
    # set ops / ordering
    "o3_union_split",
    "o4_intersect_users",
    # window functions
    "w2_event_gaps",
    "w3_rolling_avg_rows",
    "w4_sessionize",
    # non-equi joins
    "j4_range_join_funnel",
    "j5_asof_last_login",
    # LLM-pipeline: dedup family (signature-only and verify-stage variants
    # — minhash_signatures/simhash/jaccard_topk — parked with r01
    # driver-green rows on file; the windowed pair-generation queries
    # exercise those signatures end-to-end)
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_cc_clusters",
    # LLM-pipeline: training-data preparation (clean/dedup gate + int8
    # embedding quantization; split/stratified-sample variants parked)
    "pipe_docs_clean",
    "pipe_embed_quantize",
    # LLM-pipeline: similarity search
    "sim_topk_bruteforce",
    "sim_lsh_bucketed",
    "sim_ivf_topk",
    "sim_label_centroids",
    # LLM-pipeline: text analysis
    "text_token_stats",
    "text_quality",
    "text_langid",
    "text_bigram_profile",
    # LLM-pipeline: multimodal binary columns
    "mm_decoded_features",
    # scalar-function surface
    "d1_fspl_distance",
    "d7_date_funcs",
    # SQL API surface
    "sql_api_nation_order_stats",
    # reference sniffer pipeline (rows-only: no SQL-expressible oracle)
    "ref_parse_pipeline",
    "ref_trilateration",
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
