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
