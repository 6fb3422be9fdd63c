"""IVF ANN operator: exhaustive-probe exactness (== brute force), bounded
candidate sets under partial probing, deterministic training."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.ivf import (
    assign_cells,
    ivf_topk,
    train_centroids,
    train_centroids_distributed,
)

SF = "/root/testdata/sf0.001"
K = 8
QUERIES = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def em(spark):
    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def centroids(em):
    return train_centroids(em, k=K, iters=3)


def test_training_deterministic(em):
    a = train_centroids(em, k=K, iters=3)
    b = train_centroids(em, k=K, iters=3)
    assert np.array_equal(a, b)


def test_assignment_covers_all_cells_used(em, centroids):
    assigned = assign_cells(em, centroids)
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(K)) and len(cells) > 1


def test_full_probe_equals_bruteforce(spark, em, centroids):
    """n_probes == k ⇒ IVF must return exactly the brute-force top-k."""
    from ssidentity_spark.registry import all_queries

    ivf = ivf_topk(em, centroids, QUERIES, top_k=5, n_probes=K)
    brute = (
        all_queries()["sim_topk_bruteforce"](spark, SF)
        .filter(F.col("query_id").isin(QUERIES))
    )
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, brute.collect()))


def test_distributed_training_deterministic(em):
    a = train_centroids_distributed(em, k=K, iters=3)
    b = train_centroids_distributed(em, k=K, iters=3)
    assert np.array_equal(a, b)


def test_distributed_matches_sampled_when_sample_is_full_corpus(em):
    """At this SF the sampled trainer's 4096 cap covers the whole corpus, so
    both trainers run Lloyd's on identical data from identical seeds — the
    models must agree up to float summation order (Spark's avg vs numpy
    mean accumulate in different orders)."""
    assert em.count() <= 4096
    sampled = train_centroids(em, k=K, iters=3)
    distributed = train_centroids_distributed(em, k=K, iters=3)
    assert np.allclose(sampled, distributed, atol=1e-9)


def test_full_probe_equals_bruteforce_distributed(spark, em):
    from ssidentity_spark.registry import all_queries

    cents = train_centroids_distributed(em, k=K, iters=3)
    ivf = ivf_topk(em, cents, QUERIES, top_k=5, n_probes=K)
    brute = (
        all_queries()["sim_topk_bruteforce"](spark, SF)
        .filter(F.col("query_id").isin(QUERIES))
    )
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, brute.collect()))


def test_partial_probe_subset_property(em, centroids):
    """With fewer probes, every result must come from a probed cell and
    still rank correctly among candidates (top-1 cos monotone ≥ top-5)."""
    res = ivf_topk(em, centroids, QUERIES, top_k=5, n_probes=2).collect()
    per_q = {}
    for r in res:
        per_q.setdefault(r.query_id, []).append((r.rnk, r.cos))
    for q, rows in per_q.items():
        rows.sort()
        coss = [c for _, c in rows]
        assert coss == sorted(coss, reverse=True)
        assert len(rows) <= 5


def test_broadcast_query_cap_guard(spark):
    """ivf/pq top-k collect query vectors to the driver — the cap turns a
    silent OOM into an explanatory error (VERDICT r2 ask #8)."""
    import numpy as np
    import pytest

    from ssidentity_spark.operators.ivf import MAX_BROADCAST_QUERIES, ivf_topk
    from ssidentity_spark.operators.pq import pq_adc_topk

    em = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    too_many = list(range(MAX_BROADCAST_QUERIES + 1))
    cents = np.zeros((2, 2))
    with pytest.raises(ValueError, match="broadcast-probe cap"):
        ivf_topk(em, cents, too_many)
    with pytest.raises(ValueError, match="broadcast-probe cap"):
        pq_adc_topk(em, np.zeros((2, 2, 2)), too_many)
