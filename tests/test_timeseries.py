"""Unit semantics for operators/timeseries.resample_interpolate.

The driver-gate hash check (ts_gapfill_interpolate) proves engine
equivalence; these tests pin the SEMANTICS on hand-built series where the
expected grid is computable by eye.
"""

from __future__ import annotations

import datetime as dt

import pytest

from ssidentity_spark.operators.timeseries import resample_interpolate


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def series(spark):
    # key "a": observations in minute-buckets 0, 3 (two rows), 6 → grid
    # 0..6 with gaps at 1,2,4,5. key "b": single observation (degenerate).
    rows = [
        ("a", _ts(0), 10.0),
        ("a", _ts(3), 40.0),
        ("a", _ts(3), 50.0),  # same bucket → mean 45.0
        ("a", _ts(6), 60.0),
        ("b", _ts(2), 7.0),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _result_map(df):
    return {(r["key"], r["bucket"]): r for r in df.collect()}


def test_linear_fill_between_observed_points(series):
    out = resample_interpolate(series, "key", "ts", "value", 60)
    m = _result_map(out)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    # observed buckets pass through untouched
    assert m[("a", base + 0)]["value_interp"] == 10.0
    assert m[("a", base + 180)]["value_interp"] == 45.0  # in-bucket mean
    assert m[("a", base + 360)]["value_interp"] == 60.0
    # gaps: linear blend between (0 → 10.0) and (180 → 45.0)
    assert m[("a", base + 60)]["value_interp"] == pytest.approx(10 + 35 / 3)
    assert m[("a", base + 120)]["value_interp"] == pytest.approx(10 + 70 / 3)
    # and between (180 → 45.0) and (360 → 60.0)
    assert m[("a", base + 240)]["value_interp"] == pytest.approx(50.0)
    assert m[("a", base + 300)]["value_interp"] == pytest.approx(55.0)


def test_gap_flag_and_grid_density(series):
    out = resample_interpolate(series, "key", "ts", "value", 60)
    a = [r for r in out.collect() if r["key"] == "a"]
    assert len(a) == 7  # dense: every minute 0..6
    base = int(dt.datetime(2024, 1, 1).timestamp())
    flags = {r["bucket"] - base: r["gap_filled"] for r in a}
    assert [flags[s] for s in (0, 60, 120, 180, 240, 300, 360)] == [
        False, True, True, False, True, True, False,
    ]


def test_single_observation_key_degenerates_to_point(series):
    out = resample_interpolate(series, "key", "ts", "value", 60)
    b = [r for r in out.collect() if r["key"] == "b"]
    assert len(b) == 1 and b[0]["value_interp"] == 7.0
    assert b[0]["gap_filled"] is False


def test_plan_is_jvm_only(series):
    # no Python nodes anywhere: downsample, grid explode, windows are all
    # native expressions — the 100 TB contract for this operator
    plan = resample_interpolate(series, "key", "ts", "value", 60)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# TS4: median/MAD robust anomaly audit (plans/timeseries.py:ts_anomaly_mad)
# ---------------------------------------------------------------------------


def _mad_rows(spark, tmp_path, series):
    """series: {user_id: [values]} -> gated query output by user."""
    import datetime as dt

    import ssidentity_spark.plans  # noqa: F401  (populates REGISTRY —
    # without it this file only passed when another test file imported
    # plans first; caught by a standalone run in r11)
    from ssidentity_spark.registry import REGISTRY

    rows = [
        (i * 1000 + j, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=j), u, "t", float(v), "{}")
        for i, (u, vals) in enumerate(sorted(series.items()))
        for j, v in enumerate(vals)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = REGISTRY["ts_anomaly_mad"].fn(spark, sf)
    return {r["user_id"]: r.asDict() for r in out.collect()}

def test_mad_planted_spike_is_the_only_anomaly(spark, tmp_path):
    """A tight series with one huge spike: exactly that spike crosses
    |z| > 3, and the spike does NOT poison the threshold (the robustness
    property mean/stddev z-scores lack)."""
    vals = [10.0, 10.1, 9.9, 10.2, 9.8, 10.0, 10.1, 9.9, 500.0]
    got = _mad_rows(spark, tmp_path, {1: vals})[1]
    assert got["n_events"] == 9
    assert got["n_anomalies"] == 1
    assert abs(got["med"] - 10.0) < 1e-9
    assert got["max_z"] > 100  # the spike, measured on the robust scale

def test_mad_constant_series_reports_no_anomalies(spark, tmp_path):
    """MAD = 0 (constant series): no z is defined, so no anomalies and
    NULL max_z — never a divide-by-zero."""
    got = _mad_rows(spark, tmp_path, {2: [5.0] * 10})[2]
    assert got["mad"] == 0.0
    assert got["n_anomalies"] == 0
    assert got["max_z"] is None

def test_mad_zero_mad_with_outlier_still_guarded(spark, tmp_path):
    """Majority-constant series (MAD = 0) with an outlier: the z gate is
    switched off by the mad>0 guard on BOTH engines rather than
    dividing by zero — documented degenerate case."""
    got = _mad_rows(spark, tmp_path, {3: [5.0] * 9 + [99.0]})[3]
    assert got["mad"] == 0.0 and got["n_anomalies"] == 0


# ---------------------------------------------------------------------------
# TS5b: SAX motif discovery (plans/timeseries.py:ts_sax_motifs)
# ---------------------------------------------------------------------------


def test_sax_motifs_planted_shared_pattern(spark, tmp_path):
    """Two users repeating the SAME low-high alternation produce a shared
    motif carried by both; a third user with a monotone ramp shares
    nothing. Counts are consistent with the sliding-window algebra."""
    import datetime as dt

    from ssidentity_spark.plans.timeseries import _SAX_L, _SAX_W

    sf = str(tmp_path / "sfm")
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    # users 1,2: 8 PAA windows alternating low(1.0)/high(9.0) -> word
    # 'abab...'-ish, identical for both; user 3: strictly rising ramp
    for u in (1, 2):
        for w in range(8):
            v = 1.0 if w % 2 == 0 else 9.0
            for i in range(_SAX_W):
                rows.append((eid, base + dt.timedelta(minutes=eid), u, "t", v, "{}"))
                eid += 1
    for w in range(8):
        for i in range(_SAX_W):
            rows.append((eid, base + dt.timedelta(minutes=eid), 3, "t", float(eid), "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    from ssidentity_spark.registry import REGISTRY
    import ssidentity_spark.plans  # noqa: F401

    words = {
        r["user_id"]: r["sax_word"]
        for r in REGISTRY["ts_sax_symbols"].fn(spark, sf).collect()
    }
    assert words[1] == words[2] and len(words[1]) == 8
    motifs = {r["motif"]: r for r in REGISTRY["ts_sax_motifs"].fn(spark, sf).collect()}
    # every length-4 subword of the shared 8-symbol word appears in both
    # users -> n_users == 2 for each distinct subword
    shared = {words[1][o : o + _SAX_L] for o in range(8 - _SAX_L + 1)}
    for m in shared:
        assert m in motifs, (m, motifs)
        assert motifs[m]["n_users"] >= 2
    # occurrence algebra: both users contribute (8-L+1) windows each,
    # distributed across the shared subwords
    assert sum(motifs[m]["n_occurrences"] for m in shared) == 2 * (8 - _SAX_L + 1)
    # the ramp user's word shares NO length-4 subword with the planted
    # alternation, and each of its subwords occurs exactly once — so
    # none may survive the support>=2 filter (a dropped filter or a
    # collision would put one in the motif table; assert the absence)
    ramp = words[3]
    ramp_subs = {ramp[o : o + _SAX_L] for o in range(len(ramp) - _SAX_L + 1)}
    assert ramp_subs.isdisjoint(shared)
    assert ramp_subs.isdisjoint(motifs)


def test_sax_discord_planted_unique_pattern(spark, tmp_path):
    """A user breaking the corpus-wide alternation with a unique spike
    pattern owns a subword nobody else has — the discord candidate
    lands on it with global_count == 1, while conformists' discords tie
    at the shared words' higher counts."""
    import datetime as dt

    from ssidentity_spark.plans.timeseries import _SAX_L, _SAX_W
    from ssidentity_spark.registry import REGISTRY
    import ssidentity_spark.plans  # noqa: F401

    sf = str(tmp_path / "sfd")
    rows, eid = [], 0
    base = dt.datetime(2024, 2, 1)

    def emit(u, pattern):
        nonlocal eid
        for v in pattern:
            for _ in range(_SAX_W):
                rows.append(
                    (eid, base + dt.timedelta(minutes=eid), u, "t", float(v), "{}")
                )
                eid += 1

    # users 1-3: the same low/high alternation (8 windows)
    for u in (1, 2, 3):
        emit(u, [1, 9, 1, 9, 1, 9, 1, 9])
    # user 4: alternation with a mid-series double-high anomaly
    emit(4, [1, 9, 9, 9, 1, 9, 1, 9])
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    got = {
        r["user_id"]: r.asDict()
        for r in REGISTRY["ts_sax_discords"].fn(spark, sf).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # the anomalous user's rarest word is unique corpus-wide
    assert got[4]["global_count"] == 1
    # conformists' rarest words are the shared ones (count >= 3: one per
    # conformist at the same offset, at least)
    for u in (1, 2, 3):
        assert got[u]["global_count"] >= 3
        assert got[u]["discord_word"] != got[4]["discord_word"]


def test_locf_carries_forward_and_never_backfills(spark, tmp_path):
    """LOCF semantics on a planted grid: gaps inherit the LAST observed
    bucket mean (a step function, not a blend), and grid points before
    the first observation stay NULL — a reading is never fabricated
    from the future."""
    import datetime as dt

    import ssidentity_spark.plans  # noqa: F401
    from ssidentity_spark.operators.timeseries import resample_interpolate

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        # user 6: obs in buckets 1 and 4 of a 0..4 span -> bucket 0 has
        # no past (stays NULL under locf), 2 and 3 carry bucket 1's mean
        (1, base + dt.timedelta(hours=4), 6, "t", 10.0, "{}"),
        (2, base + dt.timedelta(hours=5), 6, "t", 20.0, "{}"),
        (3, base + dt.timedelta(hours=16), 6, "t", 99.0, "{}"),
        # and one earlier lonely point to force bucket 0 into the span
        (4, base + dt.timedelta(hours=1), 6, "t", None, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["bucket"]: r.asDict()
        for r in resample_interpolate(
            df, "user_id", "ts", "value", 4 * 3600, method="locf"
        ).collect()
    }
    b0 = int(base.timestamp())
    H4 = 4 * 3600
    assert out[b0]["value_interp"] is None  # no past -> never back-filled
    assert out[b0 + H4]["value_interp"] == 15.0  # mean(10, 20)
    assert out[b0 + 2 * H4]["value_interp"] == 15.0  # carried forward
    assert out[b0 + 3 * H4]["value_interp"] == 15.0  # still carried
    assert out[b0 + 4 * H4]["value_interp"] == 99.0
    assert out[b0 + 2 * H4]["gap_filled"] is True
    # the linear form on the same data BLENDS instead (sanity contrast)
    lin = {
        r["bucket"]: r["value_interp"]
        for r in resample_interpolate(
            df, "user_id", "ts", "value", 4 * 3600, method="linear"
        ).collect()
    }
    assert lin[b0 + 2 * H4] == 43.0  # 15 + (99-15) * 1/3


# ---------------------------------------------------------------------------
# TS6-to-be: seasonal (hour-of-day) strength (plans/timeseries.py:
# ts_seasonal_strength) — planted-seasonality semantics. The driver-gate
# hash proves engine equivalence; these pin that eta² actually measures
# what it claims on series where the answer is computable by eye.
# ---------------------------------------------------------------------------


def _seasonal(spark, tmp_path, rows):
    import ssidentity_spark.plans  # noqa: F401
    from ssidentity_spark.registry import REGISTRY

    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = REGISTRY["ts_seasonal_strength"].fn(spark, sf)
    return {r["user_id"]: r.asDict() for r in out.collect()}


def test_seasonal_strength_separates_cyclic_from_acyclic(spark, tmp_path):
    """User 1's value is a pure function of hour-of-day (100 at noon,
    1 elsewhere; zero within-hour variance) → eta² = 1 exactly and the
    peak is noon. User 2 varies only BY DAY (the same 60/70 mix lands in
    every hour) → between-hour SS is exactly zero → eta² = 0, and the
    all-24-way peak tie resolves to the smallest hour."""
    rows = []
    eid = 0
    for d in range(5):
        for h in range(24):
            ts = dt.datetime(2024, 1, 1 + d, h, 30)
            rows.append((eid, ts, 1, "t", 100.0 if h == 12 else 1.0, "{}"))
            rows.append((eid + 1, ts, 2, "t", 60.0 if d % 2 == 0 else 70.0, "{}"))
            eid += 2
    got = _seasonal(spark, tmp_path, rows)
    assert got[1]["n_events"] == 120 and got[1]["n_hours"] == 24
    assert got[1]["seasonal_strength"] == 1.0
    assert got[1]["peak_hour"] == 12 and got[1]["peak_mean"] == 100.0
    # d%2 over 5 days → every hour sums 3*60 + 2*70 = 320.0: exact zero
    # between-hour variance, and every float op lands on exact integers
    assert got[2]["seasonal_strength"] == 0.0
    assert got[2]["peak_hour"] == 0  # 24-way tie → smallest hour
    assert got[2]["grand_mean"] == 64.0


def test_seasonal_strength_constant_series_is_null(spark, tmp_path):
    """A constant series has SS_total = 0 (exact: decimal sums make the
    sufficient statistics integer-exact) — strength must be NULL, not a
    0/0 NaN and not a clamped 0."""
    rows = [
        (i, dt.datetime(2024, 1, 1 + i // 24, i % 24, 15), 9, "t", 7.25, "{}")
        for i in range(48)
    ]
    got = _seasonal(spark, tmp_path, rows)
    assert got[9]["seasonal_strength"] is None
    assert got[9]["grand_mean"] == 7.25


# ---------------------------------------------------------------------------
# TS7: AMOC changepoint (plans/timeseries.py:ts_changepoint_amoc)
# ---------------------------------------------------------------------------


def _changepoint(spark, tmp_path, rows):
    import ssidentity_spark.plans  # noqa: F401
    from ssidentity_spark.registry import REGISTRY

    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = REGISTRY["ts_changepoint_amoc"].fn(spark, sf)
    return {r["user_id"]: r.asDict() for r in out.collect()}


def test_changepoint_finds_the_planted_step(spark, tmp_path):
    """A clean level shift (30×10.0 then 30×50.0) must split exactly at
    the step with the true segment means; the score equals the closed
    form sqrt(k(n-k)/n)·|Δ| bit-for-bit (all ops are pinned IEEE)."""
    import math

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1, "t",
         10.0 if i < 30 else 50.0, "{}")
        for i in range(60)
    ]
    got = _changepoint(spark, tmp_path, rows)[1]
    assert got["cp_index"] == 30
    assert got["mean_left"] == 10.0 and got["mean_right"] == 50.0
    assert got["cp_score"] == math.sqrt(30 * 30 / 60) * 40.0
    assert got["n_events"] == 60


def test_changepoint_constant_series_ties_to_earliest_split(spark, tmp_path):
    """Constant series: every split scores exactly 0 (decimal-exact
    means), so the (score DESC, k ASC) tie-break must land on k=1 —
    a deterministic answer, not an engine-dependent one."""
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 2, "t", 3.5, "{}")
        for i in range(20)
    ]
    got = _changepoint(spark, tmp_path, rows)[2]
    assert got["cp_score"] == 0.0
    assert got["cp_index"] == 1


def test_changepoint_single_event_series_is_excluded(spark, tmp_path):
    """n=1 has no valid split (k ranges 1..n-1): the user must be absent
    rather than present with a NULL/garbage row."""
    rows = [
        (0, dt.datetime(2024, 1, 1), 3, "t", 9.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 1), 4, "t", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 2), 4, "t", 2.0, "{}"),
    ]
    got = _changepoint(spark, tmp_path, rows)
    assert 3 not in got and 4 in got


# ---------------------------------------------------------------------------
# TS8: autocorrelation function (plans/timeseries.py:ts_acf)
# ---------------------------------------------------------------------------


def _acf(spark, tmp_path, rows):
    import ssidentity_spark.plans  # noqa: F401
    from ssidentity_spark.registry import REGISTRY

    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = REGISTRY["ts_acf"].fn(spark, sf)
    return {r["user_id"]: r.asDict() for r in out.collect()}


def test_acf_alternating_series_is_negative_at_odd_lags(spark, tmp_path):
    """The period-2 series a,b,a,b,…: every odd lag anti-correlates,
    every even lag correlates — and the lag-2 estimator equals the
    closed form (n-2)/n exactly (deviations are ±d, products ±d², and
    the pinned fold sums n-l identical terms over the n-term
    denominator — integer-exact ratios for d=1)."""
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1, "t",
         4.0 if i % 2 == 0 else 6.0, "{}")
        for i in range(40)
    ]
    got = _acf(spark, tmp_path, rows)[1]
    assert got["mean_value"] == 5.0
    assert got["acf_lag1"] == -(39 / 40)
    assert got["acf_lag2"] == 38 / 40
    assert got["acf_lag3"] == -(37 / 40)
    assert got["acf_lag4"] == 36 / 40


def test_acf_constant_series_is_null_and_short_series_truncates(spark, tmp_path):
    """Constant series: zero variance denominator → every lag NULL (not
    NaN). A 3-point series has lags 3,4 out of range → NULL there while
    lags 1,2 still compute."""
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 2, "t", 9.0, "{}")
        for i in range(10)
    ] + [
        (100 + i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 3, "t",
         float(v), "{}")
        for i, v in enumerate([1.0, 5.0, 3.0])
    ]
    got = _acf(spark, tmp_path, rows)
    assert all(got[2][f"acf_lag{l}"] is None for l in (1, 2, 3, 4))
    assert got[3]["acf_lag1"] is not None and got[3]["acf_lag2"] is not None
    assert got[3]["acf_lag3"] is None and got[3]["acf_lag4"] is None


# ---------------------------------------------------------------------------
# TS9: lead-lag cross-correlation (plans/graph.py:ts_leadlag_correlation)
# ---------------------------------------------------------------------------


def test_leadlag_finds_the_planted_shift_in_both_directions(spark, tmp_path):
    """Type bb's hourly series is exactly type aa's shifted one hour
    LATER (aa leads bb) → best_lag = +1; type cc is dd shifted later
    (dd leads, and dd sorts second in the pair) → best_lag = -1. Both
    at near-perfect r."""
    import ssidentity_spark.plans  # noqa: F401
    from ssidentity_spark.registry import REGISTRY

    rows = []
    eid = 0
    for h in range(48):
        k = (h * 7) % 5 + 1  # varied hourly intensity pattern
        for _ in range(k):
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                         1, "aa", 1.0, "{}"))
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h + 1),
                         2, "bb", 1.0, "{}"))
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h + 1),
                         3, "cc", 1.0, "{}"))
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                         4, "dd", 1.0, "{}"))
            eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = REGISTRY["ts_leadlag_correlation"].fn(spark, sf)
    got = {(r["type_a"], r["type_b"]): r.asDict() for r in out.collect()}
    assert got[("aa", "bb")]["best_lag"] == 1
    assert got[("aa", "bb")]["r_best"] > 0.99
    assert got[("cc", "dd")]["best_lag"] == -1
    assert got[("cc", "dd")]["r_best"] > 0.99
