"""D1/D2 golden + property tests: the FSPL derivation must reproduce the
reference's observations.db rows (SURVEY §5/§6) and invert cleanly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ssidentity_spark.fixtures import GOLDEN_ROWS
from ssidentity_spark.functions.fspl import fspl_distance, fspl_rssi

GOLDEN = [(rssi, freq, dist) for _, _, _, rssi, freq, dist in GOLDEN_ROWS]


@pytest.mark.parametrize("rssi,freq,dist", GOLDEN)
def test_golden_rows(spark, rssi, freq, dist):
    df = spark.range(1).select(
        fspl_distance(F.lit(rssi), F.lit(freq)).alias("dist")
    )
    assert df.collect()[0].dist == dist


def test_round_trip(spark):
    """fspl_rssi(fspl_distance(rssi)) ≈ rssi over the full capture range."""
    df = (
        spark.range(-95, -29)
        .select(F.col("id").cast("int").alias("rssi"), F.lit(2437).alias("freq"))
        .select(
            "rssi",
            fspl_rssi(
                fspl_distance(F.col("rssi"), F.col("freq"), round_dp=None),
                F.col("freq"),
            ).alias("back"),
        )
    )
    bad = df.filter(F.abs(F.col("rssi") - F.col("back")) > 1e-9).count()
    assert bad == 0


def test_monotonic_in_rssi(spark):
    """Weaker signal → larger estimated distance."""
    df = spark.range(-95, -29).select(
        F.col("id").cast("int").alias("rssi"),
        fspl_distance(F.col("id").cast("int"), F.lit(2464)).alias("dist"),
    )
    rows = sorted((r.rssi, r.dist) for r in df.collect())
    dists = [d for _, d in rows]
    assert dists == sorted(dists, reverse=True)
