"""Aggregation-trained classifiers (U6d NB, U6e logistic regression):
the hash gate pins exact values; these pin that the models LEARN —
a degenerate constant predictor would still hash-match a degenerate
oracle."""

from __future__ import annotations

import ssidentity_spark.plans  # noqa: F401 — importing registers every query


def test_logreg_actually_learns(spark):
    """The gradient rounds must move accuracy above the majority-class
    rate — a degenerate all-one-class predictor would still hash-match a
    degenerate oracle, so learning itself needs a pin (the synthetic
    corpus' lang label is text-independent; the target-word label is the
    learnable one)."""
    from ssidentity_spark.registry import REGISTRY

    rows = REGISTRY["text_logreg_train"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(rows)
    acc = sum(r["correct"] for r in rows) / n
    pos = sum(r["pred"] for r in rows) / n
    assert acc >= 0.9, acc  # majority rate is ~0.77
    assert 0.05 < pos < 0.95  # not a constant predictor


def _winnow(spark, docs):
    import os
    import shutil
    import tempfile

    from ssidentity_spark.registry import REGISTRY

    d = tempfile.mkdtemp(prefix="winnow-")
    try:
        # the query takes an sf_dir: stage a one-table corpus
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        return REGISTRY["text_winnow_fingerprints"].fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem: any shared run of >= W+k-1 = 7 words
    yields at least one SHARED fingerprint; and density is bounded
    (>= one fingerprint per W grams)."""
    import random

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(500)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))  # noqa: E731
    shared = mk(7)  # exactly the guarantee threshold
    docs = spark.createDataFrame(
        [
            (1, mk(40) + " " + shared + " " + mk(40)),
            (2, mk(25) + " " + shared + " " + mk(55)),
            (3, mk(80)),
        ],
        "doc_id long, text string",
    )
    rows = _winnow(spark, docs)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram_md5"])
    assert by_doc[1] & by_doc[2], "shared 7-word run must share a fingerprint"
    # density: a doc with G grams selects at least G - W + 1 windows'
    # worth, deduped — at minimum ceil(G / W) distinct fingerprints
    g3 = 80 - 4 + 1
    assert len(by_doc[3]) >= g3 // 4
    # sharing counts: doc 3 shares nothing with the planted run
    assert not (by_doc[3] & (by_doc[1] & by_doc[2]))
