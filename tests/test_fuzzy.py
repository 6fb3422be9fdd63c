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


# ---------------------------------------------------------------------------
# deletion_neighborhood_join: exact recall for dist <= k (SymSpell shape)
# ---------------------------------------------------------------------------

from ssidentity_spark.operators.fuzzy import deletion_neighborhood_join  # noqa: E402


def _dn_pairs(spark, names, **kw):
    out = deletion_neighborhood_join(
        _df(spark, names), id_col="id", text_col="name", **kw
    )
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_deletion_neighborhood_exact_recall_k1(spark):
    """Every substitution/insert/delete-1 pair is found — including pairs
    no token/prefix block would catch (typo in the first character)."""
    names = ["hello", "Xello", "hell", "helloo", "world"]
    got = _dn_pairs(spark, names, max_dist=1, min_dist=1)
    assert got == {(0, 1): 1, (0, 2): 1, (0, 3): 1}


def test_deletion_neighborhood_shared_key_does_not_imply_match(spark):
    """'ab'/'ba' share the delete-1 key 'a' but are distance 2 — the
    verify step must reject them at k=1 and admit them at k=2."""
    names = ["ab", "ba"]
    assert _dn_pairs(spark, names, max_dist=1) == {}
    assert _dn_pairs(spark, names, max_dist=2) == {(0, 1): 2}


def test_deletion_neighborhood_k2_transpositions_and_doubles(spark):
    names = ["kitten", "sitten", "sittin", "kitten!"]
    got = _dn_pairs(spark, names, max_dist=2, min_dist=1)
    assert got[(0, 1)] == 1  # one substitution
    assert got[(0, 2)] == 2  # two substitutions
    assert got[(1, 2)] == 1
    assert got[(0, 3)] == 1  # one insertion
    assert (2, 3) not in got  # distance 3


def test_deletion_neighborhood_min_dist_zero_and_validation(spark):
    got = _dn_pairs(spark, ["same", "same"], max_dist=1, min_dist=0)
    assert got == {(0, 1): 0}
    with pytest.raises(ValueError, match="max_dist <= 2"):
        _dn_pairs(spark, ["a"], max_dist=3)
    with pytest.raises(ValueError, match="min_dist"):
        _dn_pairs(spark, ["a"], max_dist=1, min_dist=2)


def test_deletion_neighborhood_matches_exhaustive_truth(spark):
    """Property pin of the exact-recall claim on a brute-forceable corpus
    (the j11_fuzzy_symspell gate pins the same against DuckDB)."""
    import itertools

    names = [
        "alpha", "alpa", "alphas", "blpha", "beta", "betta", "bet",
        "gamma", "gamm", "gqmma", "delta", "delta1", "xelta",
    ]
    got = set(_dn_pairs(spark, names, max_dist=1, min_dist=1))
    rows = _df(spark, names).collect()

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (x["id"], y["id"])
        for x, y in itertools.combinations(rows, 2)
        if lev(x["name"], y["name"]) == 1
    }
    assert got == want


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", [7, 23, 991])
def test_deletion_neighborhood_randomized_exhaustive(spark, seed):
    """Randomized property pin of exact recall at BOTH radii: a small
    alphabet and short lengths force dense near-pair structure
    (hundreds of true pairs per corpus), and every corpus is compared
    against the O(n²) python brute force — the operator must emit
    exactly the distance-banded truth, for k=1 and the heavier k=2
    neighborhood alike."""
    import itertools
    import random

    r = random.Random(seed)
    names = list(
        {
            "".join(r.choice("abc") for _ in range(r.randint(1, 8)))
            for _ in range(120)
        }
    )
    rows = _df(spark, names).collect()
    truth = {}
    for x, y in itertools.combinations(rows, 2):
        d = _lev(x["name"], y["name"])
        if d <= 2:
            truth[(min(x["id"], y["id"]), max(x["id"], y["id"]))] = d
    for k in (1, 2):
        got = _dn_pairs(spark, names, max_dist=k, min_dist=1)
        want = {p: d for p, d in truth.items() if 1 <= d <= k}
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"
    assert sum(1 for d in truth.values() if d == 2) > 50  # non-vacuous


def test_deletion_neighborhood_is_character_based_on_multibyte(spark):
    """Deletion keys are built with substring/length — both CHARACTER
    semantics — so a one-code-point edit in multibyte text is distance
    1 regardless of byte width (é=2, 中=3, 🎈=4 bytes)."""
    names = ["café中🎈", "cafe中🎈", "café中", "café中🎈x", "cafX中🎈"]
    got = _dn_pairs(spark, names, max_dist=1, min_dist=1)
    # substitution of a multibyte char (0-1, 0-4, 1-4), deletion of a
    # 4-byte emoji (0-2), and an ASCII append (0-3) are each ONE edit;
    # every other pair is distance 2 and must be absent
    assert got == {(0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 4): 1, (1, 4): 1}
