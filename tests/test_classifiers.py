"""Aggregation-trained classifiers (U6d NB, U6e logistic regression):
the hash gate pins exact values; these pin that the models LEARN —
a degenerate constant predictor would still hash-match a degenerate
oracle."""

from __future__ import annotations

import pytest

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


def test_nb_stream_scoring_matches_batch(spark, tmp_path):
    """Train relationally (nb_fit), score a document STREAM with the
    broadcast model — predictions and 6-dp scores must equal the batch
    query's for every doc (stream ≡ batch inference parity)."""
    from ssidentity_spark.io import load_table
    from ssidentity_spark.plans.text import nb_classify, nb_fit
    from ssidentity_spark.streaming.corpus import nb_score_stream

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    model = nb_fit(d)
    src = str(tmp_path / "src")
    d.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "out")
    q = (
        nb_score_stream(stream, model)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (r["pred_lang"], round(r["nb_score"], 6))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["pred_lang"], round(r["nb_score"], 6))
        for r in nb_classify(d).collect()
    }
    assert got == want and len(got) == 500


def test_nb_stream_model_size_guard(spark):
    from ssidentity_spark.streaming.corpus import nb_score_stream

    big = {
        "classes": ["a"],
        "log_prior": [0.0],
        "log_default": [0.0],
        "log_cond": {str(i): [0.0] for i in range(1_000_001)},
    }
    with pytest.raises(ValueError, match="too large to broadcast"):
        nb_score_stream(spark.range(1).selectExpr("id doc_id", "'x' text"), big)
