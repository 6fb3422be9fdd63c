"""Deterministic, oracle-checkable sketches: Count-Min and HyperLogLog
built from explicit md5-derived hash functions as plain relational plans.

Why this exists next to the engine-native sketches
(``approx_count_distinct`` / ``percentile_approx`` in plans/analytics.py):
the native sketches are the production 100 TB path but their internals are
engine-specific, so the driver can only rows-check them. These
re-implementations choose every bit explicitly — md5 bucket hashes, integer
register arithmetic (the HLL harmonic sum is computed as an EXACT integer
Σ 2^(52-ρ) before a single float division) — so DuckDB reproduces the
sketch bit-for-bit and the hash gate covers the *sketch algorithms
themselves*, not just their row counts. Error-bound tests live in
tests/test_sketches.py alongside the native ones.

Both are one-pass, bounded-memory, mergeable structures — the shapes that
matter at 100 TB:

- Count-Min: d×w counters via a (j, bucket) groupBy — map-side partial
  aggregation does the heavy lifting; the sketch is d·w rows regardless of
  input size, and two sketches merge by adding counters.
- HLL: m registers via (group, bucket) max(ρ) — max is the merge, so
  partial aggregation again collapses everything map-side.

Reference impetus: ssidentity.c:23-26 wants device rosters and per-key
frequencies over an unbounded capture stream — exactly the
distinct-count / heavy-hitter questions these sketches answer in bounded
memory.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Count-Min geometry: overcount ≤ e/W · N with prob 1-e^-D (pytest pins it)
CMS_D = 4
CMS_W = 512

# HLL geometry: p=9 → m=512 registers, rsd ≈ 1.04/√m ≈ 4.6%
HLL_M = 512
HLL_REST_BITS = 52  # md5 60-bit slice // m leaves a 51-bit field; ρ ∈ [1, 52]
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# the exact double both engines divide by S: α · m² · 2^52
HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_REST_BITS)


def _cms_bucket(key: Column, j: int) -> Column:
    """Hash function j: 32-bit md5 slice of ``key#j`` mod W — matches
    DuckDB ``CAST(('0x'||substr(md5(k||'#j'),1,8)) AS BIGINT) % W``."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f"#{j}"))), 1, 8), 16, 10
    ).cast("long")
    return h % CMS_W


def cms_counters(df: DataFrame, key: Column) -> DataFrame:
    """The sketch itself: (j, bucket, c) — d·w rows, one shuffle with
    map-side combine."""
    rows = df.select(
        F.posexplode(
            F.array(*[_cms_bucket(key, j) for j in range(CMS_D)])
        ).alias("j", "bucket")
    )
    return rows.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_point_estimates(df: DataFrame, key_col: str) -> DataFrame:
    """Per-key Count-Min point estimate next to the true count:
    (key, true_cnt, cms_est, overcount). ``cms_est >= true_cnt`` always —
    the one-sided error CMS guarantees."""
    key = F.col(key_col).cast("string")
    sketch = cms_counters(df, key)
    truth = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    probes = truth.select(
        key_col,
        "true_cnt",
        F.posexplode(
            F.array(
                *[
                    _cms_bucket(F.col(key_col).cast("string"), j)
                    for j in range(CMS_D)
                ]
            )
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col, "true_cnt")
        .agg(F.min("c").alias("cms_est"))
        .withColumn("overcount", F.col("cms_est") - F.col("true_cnt"))
    )


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """The mergeable half of the estimator: (group, bucket, rho) register
    maxima. Pure expressions + one max-aggregation, so the same function
    serves batch AND Structured Streaming inputs
    (streaming/sketches.py) — stream ≡ batch by construction."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    # 512 = 2^9, so bucket/rest split via exact integer bit ops — h is a
    # 60-bit value, beyond double-precision float division
    b = df.select(
        F.col(group_col),
        (h % HLL_M).alias("bucket"),
        F.shiftright(h, 9).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(HLL_REST_BITS)).otherwise(
        F.lit(HLL_REST_BITS) - F.length(F.bin("rest"))
    )
    return b.groupBy(group_col, "bucket").agg(F.max(rho).alias("rho"))


def hll_estimates(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HLL distinct estimate: (group, hll_est). Register state is
    m rows per group; the harmonic denominator Σ 2^(52-ρ) is summed as an
    exact BIGINT (empty registers contribute 2^52 each), so the only float
    ops are one division and — in the small-range branch — one log, both
    single fixed-order expressions DuckDB reproduces."""
    regs = hll_registers(df, group_col, key_col)
    return hll_estimate_from_registers(regs, [group_col])


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Estimate from an ALREADY-BUILT (group..., bucket, rho) register
    frame — the merge half of the sketch's contract: registers from any
    union of inputs (other groups, other days, other tables) combine by
    per-bucket max BEFORE this call, so set algebra over sketches never
    touches the raw data (a8_hll_set_algebra)."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_REST_BITS} - rho AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s_total = F.col("s_present") + (HLL_M - F.col("n_present")) * F.lit(
        1 << HLL_REST_BITS
    )
    e_raw = F.lit(HLL_NUMERATOR) / s_total.cast("double")
    v = F.lit(HLL_M) - F.col("n_present")
    small = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double"))
    est = F.when((e_raw <= 2.5 * HLL_M) & (v > 0), small).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_est"))


def hll_error_budget() -> float:
    """The sketch's relative standard deviation: 1.04/√m."""
    return 1.04 / math.sqrt(HLL_M)
