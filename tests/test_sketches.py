"""Quantified error bounds for the two rows-only sketch aggregates
(VERDICT r4 ask #8): a8_approx_quantiles (percentile_approx — a
Greenwald-Khanna-style rank sketch) and a8_approx_distinct_users
(approx_count_distinct — HyperLogLog++). No cross-engine oracle exists by
design (sketch internals differ), so these tests pin the published error
bounds against exact values — across three seeded datasets AND on the real
driver testdata the registry queries run over.

Both sketches are deterministic for a given input, so each assertion
either holds forever or fails immediately — no flake budget.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

# the registry queries' own parameters (plans/analytics.py a8_*)
GK_ACCURACY = 10_000
HLL_RSD = 0.01

SF_DIR = "/root/testdata/sf0.01"


def _rank_error(vals: np.ndarray, approx: float, p: float, atol: float = 0.0) -> float:
    """GK bound is a RANK guarantee: the returned value is an actual input
    element whose rank is within n/accuracy of the target rank p*n.
    Returns the best-case rank distance (the value may occupy a run of
    equal elements — any rank in the run counts). ``atol`` admits a value
    rounded after sketching (the registry query rounds to 4 dp)."""
    sv = np.sort(vals)
    n = len(sv)
    lo = int(np.searchsorted(sv, approx - atol, "left"))
    hi = int(np.searchsorted(sv, approx + atol, "right"))
    assert lo < hi, f"approx value {approx} is not an element of the input"
    target = p * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target))


def _synthetic_events(spark, seed: int, n: int = 20_000):
    rng = np.random.default_rng(seed)
    types = rng.choice(["view", "click", "buy"], size=n)
    values = rng.lognormal(mean=2.0, sigma=1.2, size=n)  # heavy right tail
    users = (rng.zipf(1.6, size=n) % 4_000).astype("int64")  # skewed repeats
    rows = [
        (str(t), float(v), int(u)) for t, v, u in zip(types, values, users)
    ]
    return spark.createDataFrame(rows, "event_type STRING, value DOUBLE, user_id LONG")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_percentile_approx_rank_error_bound(spark, seed):
    """GK guarantee: percentile_approx(value, p, acc) returns a value whose
    RANK is within n/acc of the target rank — equivalently, it lies between
    the exact quantiles at p ± 1/acc (a hair widened for interpolation)."""
    df = _synthetic_events(spark, seed)
    pcts = [0.5, 0.9, 0.99]
    got = (
        df.groupBy("event_type")
        .agg(F.percentile_approx("value", pcts, GK_ACCURACY).alias("a"))
        .collect()
    )
    data = {
        r.event_type: np.array(
            [x.value for x in df.filter(F.col("event_type") == r.event_type).collect()]
        )
        for r in got
    }
    for r in got:
        vals = data[r.event_type]
        allowed = len(vals) / GK_ACCURACY + 1  # εn + rounding slack
        for p, approx in zip(pcts, r.a):
            err = _rank_error(vals, approx, p)
            assert err <= allowed, (
                f"seed {seed} {r.event_type} p{p}: rank error {err} > "
                f"{allowed} (n={len(vals)})"
            )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_hll_relative_error_bound(spark, seed):
    """HLL++ with rsd=0.01: the relative standard deviation is 1%; assert
    the observed relative error stays inside 4σ (deterministic sketch —
    this is a fixed property of these inputs, not a probabilistic flake)."""
    df = _synthetic_events(spark, seed)
    rows = (
        df.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", HLL_RSD).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        rel_err = abs(r.approx - r.exact) / r.exact
        assert rel_err <= 4 * HLL_RSD, (
            f"seed {seed} {r.event_type}: approx={r.approx} exact={r.exact} "
            f"rel_err={rel_err:.4f} > {4 * HLL_RSD}"
        )


def test_registry_sketch_queries_error_vs_exact(spark):
    """The registry queries themselves, on the driver testdata: every
    approx value within the published bound of the exact answer computed
    by the exact twin aggregations on the same table."""
    from ssidentity_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # a8_approx_quantiles vs exact percentiles
    approx = {
        (r.event_type, r.pct): r.approx_value
        for r in REGISTRY["a8_approx_quantiles"].fn(spark, SF_DIR).collect()
    }
    groups = {
        r.event_type: np.array(
            [x.value for x in ev.filter(F.col("event_type") == r.event_type).collect()]
        )
        for r in ev.select("event_type").distinct().collect()
    }
    assert approx, "a8_approx_quantiles returned no rows"
    for (etype, pct), val in approx.items():
        vals = groups[etype]
        allowed = len(vals) / GK_ACCURACY + 1
        err = _rank_error(vals, val, pct, atol=1e-4)  # query rounds to 4 dp
        assert err <= allowed, f"{etype} p{pct}: rank error {err} > {allowed}"

    # a8_approx_distinct_users vs exact countDistinct
    approx_u = {
        r.event_type: r.approx_users
        for r in REGISTRY["a8_approx_distinct_users"].fn(spark, SF_DIR).collect()
    }
    exact_u = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for etype, a in approx_u.items():
        rel_err = abs(a - exact_u[etype]) / exact_u[etype]
        assert rel_err <= 4 * HLL_RSD, (
            f"{etype}: approx={a} exact={exact_u[etype]} rel_err={rel_err:.4f}"
        )


# ---------------------------------------------------------------------------
# r6: the DETERMINISTIC md5-based sketches (operators/sketches.py) — these
# are hash-gated for bit-parity by the driver; here we pin their published
# error guarantees on real testdata.
# ---------------------------------------------------------------------------


def test_cms_is_one_sided_and_within_epsilon(spark):
    import math

    from ssidentity_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        cms_point_estimates,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    n_total = ev.count()
    rows = cms_point_estimates(ev, "user_id").collect()
    # one-sided: CMS never undercounts
    assert all(r["overcount"] >= 0 for r in rows)
    # Markov bound per hash row: overcount <= (e/W)·N with prob 1-e^-D;
    # allow the expected tail: at most ceil(len·e^-D) violators
    eps_n = math.e / CMS_W * n_total
    violators = sum(r["overcount"] > eps_n for r in rows)
    assert violators <= math.ceil(len(rows) * math.exp(-CMS_D))


def test_deterministic_hll_within_4_sigma(spark):
    from ssidentity_spark.operators.sketches import (
        hll_error_budget,
        hll_estimates,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    est = {
        r["event_type"]: r["hll_est"]
        for r in hll_estimates(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rsd = hll_error_budget()
    for t, n in exact.items():
        assert abs(est[t] - n) <= 4 * rsd * n, (t, est[t], n)


def test_deterministic_hll_merge_property(spark):
    # registers are max-mergeable: estimating over the union must equal
    # estimating over pre-split halves whose registers were max-merged —
    # here verified indirectly: the estimate is invariant to partitioning
    from ssidentity_spark.operators.sketches import hll_estimates

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    one = hll_estimates(ev.coalesce(1), "event_type", "user_id").collect()
    many = hll_estimates(ev.repartition(16), "event_type", "user_id").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
