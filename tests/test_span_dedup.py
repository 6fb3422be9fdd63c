"""dedup_span_exact: substring-level duplication semantics on controlled
corpora (the driver-gate hash row pins Spark ≡ DuckDB on the real table)."""

from __future__ import annotations

from ssidentity_spark.plans.dedup import SPAN_K
from ssidentity_spark.registry import REGISTRY


def _run(spark, tmp_path, docs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = REGISTRY["dedup_span_exact"].fn(spark, sf)
    return {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in out.collect()}


def test_planted_shared_span_counted_on_both_sides(spark, tmp_path):
    """Two docs share one verbatim K-char span embedded in otherwise
    unique text — every window fully inside the span (and only those)
    is duplicated, on BOTH docs."""
    shared = "S" * SPAN_K
    a = "a" * 100 + shared + "b" * 100
    b = "c" * 50 + shared + "d" * 150
    got = _run(spark, tmp_path, [a, b])
    # windows per doc: len - K + 1; duplicated: the 1 fully-shared window
    assert got[0] == (len(a) - SPAN_K + 1, 1)
    assert got[1] == (len(b) - SPAN_K + 1, 1)


def test_longer_shared_region_yields_span_minus_k_plus_1_windows(spark, tmp_path):
    """A shared region of length L >= K contributes L - K + 1 duplicated
    windows — the exact-substring property stride-1 buys."""
    region = "xyz" * 20  # 60 chars
    a = "a" * 80 + region + "b" * 80
    b = "c" * 30 + region + "d" * 30
    got = _run(spark, tmp_path, [a, b])
    assert got[0][1] == len(region) - SPAN_K + 1 == 21
    assert got[1][1] == 21


def test_within_doc_repetition_is_not_cross_doc_duplication(spark, tmp_path):
    """The same span twice in ONE doc is repetition (X7's job), not
    duplication: ndocs >= 2 requires distinct documents."""
    span = "R" * SPAN_K
    a = span + "m" * 60 + span
    b = "q" * 120
    got = _run(spark, tmp_path, [a, b])
    assert got[0][1] == 0
    assert got[1][1] == 0


def test_short_docs_have_no_windows(spark, tmp_path):
    got = _run(spark, tmp_path, ["tiny", "x" * (SPAN_K - 1), "y" * SPAN_K])
    assert 0 not in got and 1 not in got
    assert got[2] == (1, 0)


def test_identical_docs_are_fully_duplicated(spark, tmp_path):
    t = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    got = _run(spark, tmp_path, [t, t])
    n = 200 - SPAN_K + 1
    assert got[0] == (n, n) and got[1] == (n, n)


# ---------------------------------------------------------------------------
# dedup_span_trim: keep-first, interval merge, rebuilt text
# ---------------------------------------------------------------------------
#
# Fixture discipline: filler text must be APERIODIC — "a" * 50 contains
# eleven identical 40-char windows WITHIN one doc, which keep-first
# correctly dooms (that's the operator working, not a bug), so naive
# constant/periodic filler makes "untouched" expectations wrong. _rand
# gives collision-free filler; every expectation below is then exact.


def _rand(seed, n):
    import random

    r = random.Random(seed)
    return "".join(r.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))


def _trim(spark, tmp_path, docs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = REGISTRY["dedup_span_trim"].fn(spark, sf)
    return {r["doc_id"]: (r["n_cut_chars"], r["n_kept_chars"], r["trimmed_md5"])
            for r in out.collect()}


def _md5(s):
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_trim_keeps_first_occurrence_cuts_second(spark, tmp_path):
    shared = "S" * SPAN_K
    a = _rand(1, 50) + shared + _rand(2, 50)
    b = _rand(3, 50) + shared + _rand(4, 50)
    got = _trim(spark, tmp_path, [a, b])
    # doc 0 holds the first occurrence — untouched
    assert got[0] == (0, len(a), _md5(a))
    # doc 1 loses exactly the shared span
    want_b = _rand(3, 50) + _rand(4, 50)
    assert got[1] == (SPAN_K, len(want_b), _md5(want_b))


def test_trim_merges_overlapping_windows_into_maximal_region(spark, tmp_path):
    """A duplicated region of length L > K dooms L - K + 1 overlapping
    windows in the later doc; the cut must be the single merged region
    of length L, not K*(L-K+1)."""
    region = _rand(10, 60)
    a = _rand(11, 30) + region + _rand(12, 30)
    b = _rand(13, 30) + region + _rand(14, 30)
    got = _trim(spark, tmp_path, [a, b])
    assert got[0] == (0, len(a), _md5(a))
    want_b = _rand(13, 30) + _rand(14, 30)
    assert got[1] == (60, len(want_b), _md5(want_b))


def test_trim_within_doc_repeat_keeps_first_only(spark, tmp_path):
    span = "R" * SPAN_K
    mid = _rand(20, 60)
    a = span + mid + span
    got = _trim(spark, tmp_path, [a])
    want = span + mid
    assert got[0] == (SPAN_K, len(want), _md5(want))


def test_trim_adjacent_cut_regions_merge(spark, tmp_path):
    """Two doomed regions that touch end-to-start form one contiguous
    cut (no phantom 1-char gap survives between them)."""
    r1, r2 = "X" * SPAN_K, "Y" * SPAN_K
    a = _rand(30, 20) + r1 + _rand(31, 20) + r2 + _rand(32, 20)
    b = _rand(33, 20) + r1 + r2 + _rand(34, 20)  # adjacent in the later doc
    got = _trim(spark, tmp_path, [a, b])
    assert got[0] == (0, len(a), _md5(a))
    want_b = _rand(33, 20) + _rand(34, 20)
    assert got[1] == (2 * SPAN_K, len(want_b), _md5(want_b))


def test_trim_cut_at_text_boundaries(spark, tmp_path):
    """Cut intervals touching position 1 and the final char: the fold's
    head segment is empty and the tail substring length is zero — both
    must produce '' rather than NULL-poisoning the concat."""
    span = "Z" * SPAN_K
    a = _rand(40, 60) + span          # first occurrence mid-corpus
    b = span + _rand(41, 30)          # doc starts with the doomed span
    c = _rand(42, 30) + span          # doc ends with it
    got = _trim(spark, tmp_path, [a, b, c])
    assert got[0] == (0, len(a), _md5(a))
    assert got[1] == (SPAN_K, 30, _md5(_rand(41, 30)))
    assert got[2] == (SPAN_K, 30, _md5(_rand(42, 30)))


def test_trim_noop_and_short_docs_pass_through(spark, tmp_path):
    u = _rand(50, 120)
    got = _trim(spark, tmp_path, [u, "tiny"])
    assert got[0] == (0, 120, _md5(u))
    assert got[1] == (0, 4, _md5("tiny"))


def test_trim_is_character_based_on_multibyte_text(spark, tmp_path):
    """Window positions, interval arithmetic, and the rebuild fold are
    all CHARACTER-based, never byte-based: multi-byte text (2-, 3- and
    4-byte UTF-8 code points) around and inside a shared span must trim
    to exactly the python-string expectation. (The driver corpus is
    pure ASCII, so the oracle gate can't pin this — the python md5
    reference here does.)"""
    span = "déjà中文🎈" * 5  # 35 chars, 4 distinct byte widths
    assert len(span) < SPAN_K
    shared = span + "x" * (SPAN_K - len(span))  # exactly K chars
    a = _rand(60, 45) + shared + _rand(61, 45)
    b = _rand(62, 45) + shared + _rand(63, 45)
    got = _trim(spark, tmp_path, [a, b])
    assert got[0] == (0, len(a), _md5(a))
    want_b = _rand(62, 45) + _rand(63, 45)
    assert got[1] == (SPAN_K, len(want_b), _md5(want_b))

    prof = _run(spark, tmp_path, [a, b])
    assert prof[0] == (len(a) - SPAN_K + 1, 1)
    assert prof[1] == (len(b) - SPAN_K + 1, 1)


def test_span_profile_modes_agree(spark):
    """VERDICT r8 ask #4: the three span_profile plan shapes (shipped
    repartition, skew-hardened twophase, salted join) are semantically
    one operator — identical result multisets on a corpus that plants a
    hot gram across most docs (the boilerplate case the modes exist
    for). Timings live in SCALE.md 'span-dedup skew'."""
    from pyspark.sql import functions as F

    from ssidentity_spark.plans.dedup import span_profile

    boiler = "a" * 120
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 4 < 3, F.lit(boiler)
        ).otherwise(
            F.concat(F.lit("unique-"), F.col("id").cast("string"),
                     F.lit("-" * 60), F.col("id").cast("string"))
        ).alias("text"),
    )
    results = [
        {tuple(r) for r in span_profile(docs, mode=m, salt=4).collect()}
        for m in ("repartition", "twophase", "salted")
    ]
    assert results[0] == results[1] == results[2]
    assert results[0]  # non-vacuous
    # the boilerplate docs' windows are all duplicated
    dup = {r for r in results[0] if r[1] == r[2]}
    assert len(dup) == 30


def test_span_profile_rejects_unknown_mode(spark):
    """r9 review: a typo'd mode must raise, not silently fall through to
    a different plan shape."""
    import pytest
    from pyspark.sql import functions as F

    from ssidentity_spark.plans.dedup import span_profile

    docs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("a" * 50).alias("text")
    )
    with pytest.raises(ValueError, match="repartition\\|twophase\\|salted"):
        span_profile(docs, mode="two-phase")
