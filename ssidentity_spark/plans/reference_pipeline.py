"""The reference's own pipeline surface as driver-visible queries.

The DuckDB oracle only sees the driver testdata views, so these entries are
rows-only checks (deterministic fixture inputs, seed=42 — FIXTURES.md):
the full capture pipeline (frames → parse → observations), trilateration,
and the batch arrival/sessionization analytics over the reference schema.
They ignore ``sf_dir`` by design; pytest holds their strong assertions
(tests/test_parse.py, test_operators.py, test_trilateration.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.registry import register


@register(
    "ref_parse_pipeline",
    oracle=None,  # fixture-driven; golden/property checks live in pytest
    survey="P1-P12,D1-D6,S1,S2",
)
def ref_parse_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw 802.11 frames → parsed observations (the whole reference program,
    ssidentity.c:65-117, as one declarative plan)."""
    from ssidentity_spark.fixtures import raw_frames_df
    from ssidentity_spark.parse import parse_observations

    return parse_observations(raw_frames_df(spark, n_extra=200))


@register(
    "ref_trilateration",
    oracle=None,
    survey="U2,A5,J1",
)
def ref_trilateration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-truth observations → least-squares positions (ssidentity.c:35)."""
    from ssidentity_spark.fixtures import sensors_df, trilat_truth_observations
    from ssidentity_spark.operators.trilateration import trilaterate

    obs, _ = trilat_truth_observations(spark)
    est = trilaterate(obs, sensors_df(spark))
    return est.select(
        "mac",
        F.round("lat", 4).alias("lat"),
        F.round("lon", 4).alias("lon"),
        "n_sensors",
        F.round("rmse_m", 1).alias("rmse_m"),
    )


@register(
    "ref_visit_sessions",
    oracle=None,
    survey="W4,A2",
)
def ref_visit_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based visit sessions over the observation fixture (README.md:16-17)."""
    from ssidentity_spark.fixtures import observations_df
    from ssidentity_spark.operators.analytics import sessionize

    sess = sessionize(observations_df(spark, n_rows=2000), gap="15 minutes")
    return sess.select(
        "mac",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start"),
        "n_probes",
        F.array_join("sensors", ",").alias("sensors"),
    )


@register(
    "ref_companion_clusters",
    oracle=None,
    survey="J2,A3 (correlation network)",
)
def ref_companion_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Devices that repeatedly co-occur → connected components
    (README.md:15-19 correlation network)."""
    from ssidentity_spark.fixtures import observations_df
    from ssidentity_spark.operators.graph import companion_clusters

    clusters = companion_clusters(
        observations_df(spark, n_rows=800), window="30 seconds", min_cowindows=1
    )
    return clusters.select(
        "component",
        F.array_join("members", ",").alias("members"),
        "n_members",
    )


@register(
    "ref_watchlist_alerts",
    oracle=None,
    survey="J3,J6,W2",
)
def ref_watchlist_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival events for watchlisted devices (README.md:19): batch twin of
    the T7 streaming alert path."""
    from ssidentity_spark.fixtures import observations_df, watchlist_df
    from ssidentity_spark.operators.analytics import arrivals, watchlist_hits

    obs = observations_df(spark, n_rows=2000)
    macs = [r.mac for r in obs.select("mac").distinct().limit(10).collect()]
    hits = watchlist_hits(obs, watchlist_df(spark, macs))
    return arrivals(hits, gap="30 minutes").select(
        "mac",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("arrived_at"),
        "sensor_id",
        F.round("dist", 2).alias("dist"),
    )
