"""Bloom-filter join pruning (operators/bloom.py): membership guarantees,
false-positive rate vs theory, join-result equivalence, and the
plan-shape contract (membership test stays JVM-side)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_pruned_join,
    build_bloom,
    might_contain,
)


@pytest.fixture(scope="module")
def dim_fact(spark):
    dim = spark.range(0, 2048).select((F.col("id") * 13 + 7).alias("key"))
    fact = spark.range(0, 60000).select(
        (F.col("id") % 40000).alias("fkey"), (F.col("id") % 97).alias("v")
    )
    return dim.cache(), fact.cache()


def test_no_false_negatives(spark, dim_fact):
    dim, _ = dim_fact
    words = build_bloom(dim, "key")
    # every inserted key must test positive
    n_neg = dim.where(~might_contain(words, F.col("key"))).count()
    assert n_neg == 0


def test_false_positive_rate_near_theory(spark, dim_fact):
    dim, _ = dim_fact
    words = build_bloom(dim, "key")
    n = dim.count()
    # probe keys disjoint from the inserted set (inserted are 13a+7 ≡ 7 mod 13)
    probes = spark.range(0, 50000).select((F.col("id") * 13).alias("key"))
    fp = probes.where(might_contain(words, F.col("key"))).count()
    rate = fp / 50000
    theory = (1 - math.exp(-BLOOM_K * n / BLOOM_M_BITS)) ** BLOOM_K
    # generous band: within 3x of theory and absolutely small
    assert rate <= max(3 * theory, 1e-3), (rate, theory)


def test_join_result_identical_to_plain_join(spark, dim_fact):
    dim, fact = dim_fact
    pruned = (
        bloom_pruned_join(fact, "fkey", dim, "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    plain = (
        fact.join(dim, fact["fkey"] == dim["key"])
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0


def test_membership_expression_is_jvm_only(spark, dim_fact):
    dim, fact = dim_fact
    words = build_bloom(dim, "key")
    plan = (
        fact.where(might_contain(words, F.col("fkey")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_pruning_is_selective(spark, dim_fact):
    """The point of the operator: far fewer fact rows reach the join than
    the full scan, and never fewer than the true matches."""
    dim, fact = dim_fact
    words = build_bloom(dim, "key")
    n_pass = fact.where(might_contain(words, F.col("fkey"))).count()
    n_true = fact.join(dim, fact["fkey"] == dim["key"], "left_semi").count()
    n_total = fact.count()
    assert n_true <= n_pass < 0.25 * n_total, (n_true, n_pass, n_total)


def test_build_rejects_bad_geometry(spark, dim_fact):
    dim, _ = dim_fact
    with pytest.raises(ValueError):
        build_bloom(dim, "key", m_bits=1000)  # not a power of two
    # large bitmaps BUILD fine; only the literal-expression path refuses
    with pytest.raises(ValueError):
        might_contain([0] * ((1 << 22) // 64), F.col("key"), m_bits=1 << 22)


def test_broadcast_membership_matches_literal(spark, dim_fact):
    from ssidentity_spark.operators.bloom import might_contain_broadcast

    dim, fact = dim_fact
    words = build_bloom(dim, "key")
    a = fact.where(might_contain(words, F.col("fkey"))).select("fkey")
    b = fact.where(
        might_contain_broadcast(spark, words, F.col("fkey"))
    ).select("fkey")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_large_bitmap_goes_broadcast(spark, dim_fact):
    from ssidentity_spark.operators.bloom import (
        MAX_LITERAL_BITS,
        might_contain_broadcast,
    )

    dim, _ = dim_fact
    big_m = MAX_LITERAL_BITS * 4  # 2^22 bits — beyond the literal cap
    words = build_bloom(dim, "key", m_bits=big_m)
    # the refusal must NAME the documented alternatives (VERDICT r8 #6)
    with pytest.raises(
        ValueError,
        match="might_contain_broadcast.*fileindex.*bloomFilter.enabled",
    ):
        might_contain(words, F.col("key"), m_bits=big_m)
    n_neg = dim.where(
        ~might_contain_broadcast(spark, words, F.col("key"), m_bits=big_m)
    ).count()
    assert n_neg == 0  # no false negatives through the broadcast path
