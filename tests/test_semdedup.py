"""Semantic-dedup verdict semantics (plans/dedup._semantic_verdict) on
controlled vectors — the driver-gate hash rows pin Spark ≡ DuckDB; these
pin the RULE itself, especially the chain behavior the docstring
declares (r7 review finding: the rule is dominated-by-lower-id, which is
deliberately more aggressive than a sequential greedy scan)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ssidentity_spark.plans.dedup import SEMDEDUP_COS, _semantic_verdict


def _base(spark, vecs):
    rows = [
        (i, [float(x) for x in v], float(math.sqrt(sum(x * x for x in v))))
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, v array<double>, nrm double"
    )


def _cent(spark, vecs):
    rows = [
        (i, [float(x) for x in v], float(math.sqrt(sum(x * x for x in v))))
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(
        rows, "cid long, cv array<double>, cnrm double"
    )


def _verdict(spark, vecs, cents):
    out = _semantic_verdict(_base(spark, vecs), _cent(spark, cents))
    return {r["vec_id"]: r["kept"] for r in out.collect()}


def _at(deg):
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def test_chain_drops_everything_dominated_by_a_lower_id(spark):
    """v0~v1 (cos 0.5), v1~v2 (cos 0.5), v0!~v2 (cos -0.5): the
    dominated-by-lower-id rule drops BOTH v1 and v2 (v2's dominator v1
    was itself dropped) — a sequential greedy scan would keep v2. This
    conservative over-deletion is the documented contract."""
    assert 0.35 == SEMDEDUP_COS  # the geometry below assumes the 0.35 bar
    kept = _verdict(spark, [_at(0), _at(60), _at(120)], [[1.0, 1.0]])
    assert kept == {0: True, 1: False, 2: False}


def test_independent_vectors_all_kept(spark):
    # pairwise cos 0.5.. wait: 0 vs 120 = -0.5, 120 vs 240 = -0.5,
    # 0 vs 240 = -0.5 — all far below the bar
    kept = _verdict(spark, [_at(0), _at(120), _at(240)], [[1.0, 0.0]])
    assert kept == {0: True, 1: True, 2: True}


def test_cells_isolate_duplicates(spark):
    """Identical vectors in DIFFERENT cells are never compared — the
    SemDeDup trade: candidate generation is intra-cell only."""
    # two tight clusters around +x and +y; centroids at +x / +y
    vecs = [_at(2), _at(5), _at(88), _at(92)]
    kept = _verdict(spark, vecs, [[1.0, 0.0], [0.0, 1.0]])
    # within each cell the higher id is dominated; across cells nothing is
    assert kept == {0: True, 1: False, 2: True, 3: False}


def test_lowest_id_always_survives_per_cell(spark):
    vecs = [_at(1), _at(2), _at(3), _at(4)]  # one tight bundle
    kept = _verdict(spark, vecs, [[1.0, 0.0]])
    assert kept[0] is True
    assert [kept[i] for i in (1, 2, 3)] == [False, False, False]
