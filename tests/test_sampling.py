"""Priority sampling (pipe_weighted_sample): inclusion probability tracks
weight, the Horvitz–Thompson estimator recovers the population total, and
the plan is per-partition top-k (no global sort shuffle)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _inv_priority(doc_id: int, w: int) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) + 1
    return float(h) / w


@pytest.fixture(scope="module")
def weighted_docs(spark):
    # weights 1..100 cycling over 5000 ids → heavier ids should be
    # sampled ~proportionally more often
    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100 + 1).alias("w")
    )
    return df.cache()


def _sample(spark, df, k):
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        + 1
    ).cast("double")
    return (
        df.withColumn("inv_priority", u / F.col("w"))
        .orderBy(F.col("inv_priority").asc(), F.col("doc_id").asc())
        .limit(k)
    )


def test_matches_python_reference(spark, weighted_docs):
    got = [r["doc_id"] for r in _sample(spark, weighted_docs, 100).collect()]
    ref = sorted(
        ((r["doc_id"], r["w"]) for r in weighted_docs.collect()),
        key=lambda t: (_inv_priority(t[0], t[1]), t[0]),
    )[:100]
    assert got == [d for d, _ in ref]


def test_inclusion_tracks_weight(spark, weighted_docs):
    k = 500
    rows = _sample(spark, weighted_docs, k).collect()
    ws = [r["w"] for r in rows]
    # mean weight of the sample must sit well above the population mean
    # (50.5) — weight-proportional inclusion; and the heaviest decile
    # should be over-represented vs its 10% population share
    assert sum(ws) / k > 62
    heavy = sum(1 for w in ws if w > 90)
    assert heavy / k > 0.15


def test_horvitz_thompson_estimator(spark, weighted_docs):
    """Priority sampling's estimator: with threshold tau = (k+1)-th
    priority, sum of max(w_i, tau) over the k-sample is unbiased for the
    population total. One draw should land within 10%."""
    k = 500
    kk = _sample(spark, weighted_docs, k + 1).collect()
    sample, boundary = kk[:k], kk[k]
    # priority q_i = w_i / u_i with u_i = h_i / 2^60 ∈ (0, 1]; the
    # threshold is the (k+1)-th priority
    scale = float(1 << 60)
    h = int(hashlib.md5(str(boundary["doc_id"]).encode()).hexdigest()[:15], 16) + 1
    tau = boundary["w"] / (h / scale)
    est = sum(w if (w := r["w"]) >= tau else tau for r in sample)
    true_total = 5000 * 50.5
    assert abs(est - true_total) / true_total < 0.10, (est, true_total)


def test_plan_is_takeordered_no_global_sort(spark, weighted_docs):
    plan = (
        _sample(spark, weighted_docs.repartition(8), 200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
