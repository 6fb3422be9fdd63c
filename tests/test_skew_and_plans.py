"""Skew-mitigation operators (equivalence to the plain versions) and
physical-plan regression checks (broadcast where intended, pushdown, no
Python nodes in expression-only paths — the SCALE.md invariants)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ssidentity_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return hot.unionByName(tail).cache()


def test_salted_count_equivalence(skewed):
    plain = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r.k: r.n for r in skew.salted_count(skewed, ["k"]).collect()}
    assert salted == plain


def test_salted_sum_equivalence(skewed):
    plain = {r.k: r.s for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.sum_v for r in skew.salted_sum(skewed, ["k"], "v").collect()}
    assert salted == plain


def test_salted_join_equivalence(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot_label")] + [(f"k{i}", f"l{i}") for i in range(50)],
        "k STRING, label STRING",
    )
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = skew.salted_broadcast_join(skewed, dim, "k").groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_topk_per_key_skew_safe(skewed):
    got = skew.top_k_per_key_skew_safe(
        skewed, "k", F.desc("v"), k=3
    )
    plain_top = (
        skewed.groupBy("k").agg(F.max("v").alias("vmax")).collect()
    )
    vmax = {r.k: r.vmax for r in plain_top}
    rows = got.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.k, []).append(r.v)
    for k, vs in per_key.items():
        assert len(vs) <= 3
        assert max(vs) == vmax[k]


# ---------------------------------------------------------------------------
# plan regressions
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark):
    from ssidentity_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    for name in [
        "j1_region_revenue",
        "j2_supplier_volume",
        "j1_brand_pricing",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_profit_by_nation",
    ]:
        plan = _plan(all_queries()[name](spark, sf))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_q1_pushdown_and_pruning(spark):
    from ssidentity_spark.registry import all_queries

    plan = _plan(all_queries()["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual" in plan
    # column pruning: never reads the full 11-column lineitem schema
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_text_queries_stay_jvm_side(spark):
    from ssidentity_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    for name in ["text_token_stats", "text_quality", "dedup_minhash_signatures"]:
        assert "Python" not in _plan(all_queries()[name](spark, sf)), name


def test_semi_anti_stay_semi_anti(spark):
    from ssidentity_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    plan = _plan(all_queries()["j3_customers_without_orders"](spark, sf))
    assert "LeftAnti" in plan
    plan = _plan(all_queries()["j3_active_customer_nations"](spark, sf))
    assert "LeftSemi" in plan


def test_embedding_neardup_has_no_nested_loop(spark):
    """Round-1 regression: dedup_embedding_cosine theta-joined on
    vec_id<vec_id — a BroadcastNestedLoop over all pairs. The banded-LSH
    rewrite must keep every join an equi(-hash/merge) join."""
    from ssidentity_spark.registry import all_queries

    plan = _plan(all_queries()["dedup_embedding_cosine"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_distribution_ranks_no_global_window(spark):
    """The full-table window must partition on the derived bucket; the only
    single-partition exchange allowed is the <=256-row bucket-count cumsum."""
    from ssidentity_spark.registry import all_queries

    plan = _plan(all_queries()["w1_distribution_ranks"](spark, "/root/testdata/sf0.001"))
    assert "hashpartitioning(_bucket" in plan
    # the orders-sized window runs per-bucket, not globally
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert any("_bucket" in ln for ln in windows)


def test_scalable_row_number_matches_global_window(spark):
    from pyspark.sql import Window

    from ssidentity_spark.operators.analytics import (
        ntile_from_rn,
        scalable_global_row_number,
    )

    # adversarial sizes: n % 4 in {0,1,2,3}, duplicate leading values,
    # negative values, and a constant column (min == max edge)
    for n, const in [(17, False), (16, False), (18, False), (19, False), (5, True)]:
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.lit(0) if const else ((F.col("id") * 37) % 11 - 5).cast("double")).alias(
                "x"
            ),
        )
        got = scalable_global_row_number(df, ["x", "k"], n_buckets=4)
        w = Window.orderBy("x", "k")
        want = df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("q4"),
        )
        got_rows = {
            r.k: (r.rn, r.q4)
            for r in got.select(
                "k", "rn", ntile_from_rn(F.col("rn"), F.col("n_total"), 4).alias("q4")
            ).collect()
        }
        want_rows = {r.k: (r.rn, r.q4) for r in want.collect()}
        assert got_rows == want_rows, f"n={n} const={const}"


def test_semantic_dedup_pair_join_is_equi(spark):
    """dedup_semantic_cells: the ONLY nested-loop join allowed is the
    model-sized centroid-assignment broadcast (the inherent O(corpus x k)
    pass every IVF variant pays). The duplicate-pair generation must be
    an equi join on the cell id — a theta self-join over vectors would be
    the O(n^2) SemDeDup anti-pattern."""
    from ssidentity_spark.registry import all_queries

    plan = _plan(
        all_queries()["dedup_semantic_cells"](spark, "/root/testdata/sf0.001")
    )
    assert "CartesianProduct" not in plan
    # the intra-cell pair join appears as a hash/merge EQUI join keyed on
    # the cell column
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        plan.count("BroadcastHashJoin") >= 1
    )
    # the only allowed nested loop is the centroid-assignment broadcast
    # inside the PERSISTED cells definition (executed once for all three
    # consumers; the explain string re-prints the cached subtree under
    # each InMemoryTableScan, so count structurally, not textually):
    # every BNLJ line must sit strictly below an InMemoryTableScan at
    # shallower indentation — i.e. inside a cached definition, never in
    # the live top-level plan
    def _indent(line):
        return len(line) - len(line.lstrip(" :+-"))

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        covered = any(
            "InMemoryTableScan" in prev and _indent(prev) < _indent(line)
            for prev in lines[:i]
        )
        assert covered, f"live nested-loop join outside the cache:\n{line}"
