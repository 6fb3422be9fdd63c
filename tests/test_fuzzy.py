"""operators/fuzzy.fuzzy_self_join: blocking, pruning, and verification
semantics on controlled strings (the driver-gate hash row
j11_fuzzy_part_match pins Spark ≡ DuckDB on the real table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.fuzzy import fuzzy_self_join


def _df(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )


def _pairs(spark, names, **kw):
    out = fuzzy_self_join(
        _df(spark, names),
        id_col="id",
        text_col="name",
        block=F.element_at(F.split("name", " "), -1),
        **kw,
    )
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_within_block_distance_band(spark):
    names = ["red bolt", "ted bolt", "red volt", "blue bolt", "red bolt"]
    got = _pairs(spark, names)
    # "red bolt"~"ted bolt" (d=1, twice via the duplicate id 4); dist 0
    # (ids 0,4) excluded by default; "blue bolt" is d=3 from the others;
    # "red volt" has noun "volt" — a typo IN the blocking token is a
    # documented miss (recall trade, same as LSH banding)
    assert got == {(0, 1): 1, (1, 4): 1}


def test_length_prune_is_a_true_lower_bound(spark):
    # "a bolt" vs "aaaaaa bolt": same block, length differs by 5 > 2 —
    # pruned before the DP; levenshtein would be 5 anyway, so the prune
    # never changes results, only cost
    got = _pairs(spark, ["a bolt", "aaaaaa bolt"])
    assert got == {}


def test_min_dist_zero_includes_exact_dups(spark):
    got = _pairs(spark, ["red bolt", "red bolt"], min_dist=0)
    assert got == {(0, 1): 0}


def test_invalid_band_rejected(spark):
    with pytest.raises(ValueError, match="min_dist"):
        fuzzy_self_join(
            _df(spark, ["x"]), "id", "name", F.col("name"), max_dist=1, min_dist=2
        )
