"""S2 scale path (io.write_observations_bucketed): bucketing by mac must
actually buy shuffle-free per-device analytics — pinned on the EXECUTED
plan, with the unbucketed twin proving the assertion isn't vacuous."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.io import write_observations_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(df) -> int:
    return _plan(df).count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def bucketed_table(spark, observations):
    name = f"obs_bucketed_{uuid.uuid4().hex[:8]}"
    write_observations_bucketed(
        observations, name, n_buckets=8, mode="overwrite"
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _no_broadcast(spark):
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return old_thr, old_aqe


def _restore(spark, old):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old[0])
    spark.conf.set("spark.sql.adaptive.enabled", old[1])


def test_groupby_mac_on_bucketed_store_skips_the_shuffle(
    spark, observations, bucketed_table
):
    t = spark.table(bucketed_table)
    agg_bucketed = t.groupBy("mac").agg(F.count(F.lit(1)).alias("n"))
    agg_plain = observations.groupBy("mac").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert _shuffles(agg_bucketed) == 0, _plan(agg_bucketed)
    # non-vacuity: the same aggregate over the unbucketed frame shuffles
    assert _shuffles(agg_plain) >= 1
    # and the answers agree
    got = {r["mac"]: r["n"] for r in agg_bucketed.collect()}
    want = {r["mac"]: r["n"] for r in agg_plain.collect()}
    assert got == want


def test_self_join_on_mac_is_exchange_free(spark, bucketed_table):
    old = _no_broadcast(spark)
    try:
        t = spark.table(bucketed_table)
        a = t.select("mac", "ts")
        b = t.select("mac", F.col("rssi").alias("v"))
        j = a.join(b, "mac")
        assert _shuffles(j) == 0, _plan(j)
        assert "SortMergeJoin" in _plan(j)
        assert j.count() > 0
    finally:
        _restore(spark, old)


def test_bucketed_vs_unbucketed_join_shuffle_delta(
    spark, observations, bucketed_table
):
    """The unbucketed twin of the same join shuffles BOTH sides — the
    bucketed store removes exactly those exchanges."""
    old = _no_broadcast(spark)
    try:
        a = observations.select("mac", "ts")
        b = observations.select("mac", F.col("rssi").alias("v"))
        j = a.join(b, "mac")
        assert _shuffles(j) >= 2, _plan(j)
    finally:
        _restore(spark, old)
