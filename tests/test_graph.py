"""Connected components: known topologies, fixpoint convergence, and the
companion-cluster rollup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ssidentity_spark.operators.graph import companion_clusters, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "mac_a STRING, mac_b STRING")
    return {
        r.vertex: r.component for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"
    assert got["a"] != got["x"]


def test_chain_converges(spark):
    """A long chain needs ~log rounds of HashMin — must still converge."""
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(15)]
    got = _cc(spark, chain)
    assert set(got.values()) == {"n00"}


def test_cycle_and_selfloop(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("z", "z")])
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["z"] == "z"


def test_companion_clusters(spark, observations):
    clusters = companion_clusters(observations, window="30 seconds", min_cowindows=1)
    rows = clusters.collect()
    if rows:  # fixture-dependent: clusters may be sparse
        for r in rows:
            assert r.n_members == len(r.members)
            assert r.component == min(r.members)
