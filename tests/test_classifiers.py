"""Aggregation-trained classifiers (U6d NB, U6e logistic regression):
the hash gate pins exact values; these pin that the models LEARN —
a degenerate constant predictor would still hash-match a degenerate
oracle."""

from __future__ import annotations


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
