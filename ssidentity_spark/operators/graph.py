"""Relational graph analytics over the co-occurrence network
(/root/reference/README.md:15-19 "things that can be correlated"):
connected components via iterative min-label propagation — the device-
cluster ("traveling companions") analysis built from operators/analytics.py
:co_occurrence edges.

No graph engine: components are computed with joins + aggregations, the
standard large-scale relational formulation (HashMin). Each iteration is one
shuffle on the edge key; iterations stop early when no label changes.
Label state is (vertex → component), checkpoint-truncated every iteration so
the plan doesn't grow unboundedly — the practical requirement for running
this at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "mac_a",
    dst: str = "mac_b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """HashMin label propagation: every vertex adopts the smallest label in
    its neighborhood until fixpoint. Returns (vertex, component) where
    component is the lexicographically smallest member id. When ``stats``
    is passed, records {"iterations": n} — the convergence count the scale
    studies report (tools/dedup_blowup.py).

    HashMin converges in O(component diameter) rounds; the r5 blow-up
    study measured 18 rounds on chain-shaped 10-replica clusters, so the
    default ceiling carries headroom (the fixpoint early-exit makes the
    extra budget free on converged graphs). For adversarially long chains
    at larger scale, swap in pointer-doubling (large-star/small-star,
    O(log diameter)) — the per-iteration shuffle shape is identical.
    """
    spark = edges.sparkSession
    # undirected: symmetrize once
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for it in range(max_iter):
        # candidate labels: own label + min neighbor label
        neighbor_min = (
            sym.join(labels, sym.v == labels.vertex)
            .groupBy(F.col("u").alias("vertex"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        # fixpoint check + plan truncation via localCheckpoint
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if stats is not None:
            stats["iterations"] = it + 1
        if changed == 0:
            break
    sym.unpersist()
    return labels


def companion_clusters(obs: DataFrame, window: str = "30 seconds", min_cowindows: int = 2) -> DataFrame:
    """Device clusters that repeatedly travel together: co-occurrence edges
    above a support threshold → connected components → cluster rollup."""
    from ssidentity_spark.operators.analytics import co_occurrence

    edges = co_occurrence(obs, window).filter(F.col("n_cowindows") >= min_cowindows)
    comp = connected_components(edges)
    return comp.groupBy("component").agg(
        F.sort_array(F.collect_list("vertex")).alias("members"),
        F.count(F.lit(1)).alias("n_members"),
    )
