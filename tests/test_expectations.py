"""Expectations/quarantine (operators/expectations.py): severity ladder,
NULL-as-violation gating, name ordering, and the fail-stops-the-batch
contract (the DLT shape of the reference's per-frame validation,
ssidentity.c:134-204)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.expectations import (
    ExpectationFailed,
    apply_expectations,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10, "en"),
            (2, 3, "en"),  # violates min_v (drop)
            (3, 10, "xx"),  # violates lang (drop)
            (4, 3, "xx"),  # violates both
            (5, 200, "en"),  # violates big (warn) only
            (6, None, "en"),  # NULL value -> min_v gates as violation
        ],
        "id long, v long, lang string",
    )


RULES = [
    ("min_v", "v >= 5", "drop"),
    ("lang_ok", "lang = 'en'", "drop"),
    ("big", "v < 100", "warn"),
]


def test_split_and_csv_ordering(spark, frame):
    valid, quarantine, stats = apply_expectations(
        frame, RULES, collect_stats=True
    )
    assert sorted(r["id"] for r in valid.collect()) == [1, 5]
    q = {r["id"]: r["violated"] for r in quarantine.collect()}
    # declaration order in the CSV, not alphabetical
    assert q == {
        2: "min_v",
        3: "lang_ok",
        4: "min_v,lang_ok",
        6: "min_v",
    }
    # row 6's NULL v gates the WARN rule's count too (NULL = violation)
    assert stats == {"min_v": 3, "lang_ok": 2, "big": 2}


def test_warn_keeps_rows_but_labels_them(spark, frame):
    valid, _q, _s = apply_expectations(frame, RULES)
    warned = {r["id"]: r["warned"] for r in valid.collect()}
    assert warned == {1: "", 5: "big"}


def test_null_expectation_is_a_violation(spark, frame):
    # row 6 has v = NULL: "v >= 5" evaluates to NULL, which must gate
    _valid, quarantine, _s = apply_expectations(frame, RULES)
    assert 6 in {r["id"] for r in quarantine.collect()}


def test_fail_rule_raises_with_rule_name_and_count(spark, frame):
    rules = [("min_v", "v >= 5", "fail")]
    with pytest.raises(ExpectationFailed, match="'min_v'.*3 row"):
        apply_expectations(frame, rules)


def test_fail_rule_passes_when_clean(spark, frame):
    rules = [("nonneg", "v IS NULL OR v >= 0", "fail")]
    valid, quarantine, stats = apply_expectations(frame, rules)
    assert valid.count() == 6 and quarantine.count() == 0
    assert stats == {"nonneg": 0}


def test_validation_errors(spark, frame):
    with pytest.raises(ValueError, match="at least one"):
        apply_expectations(frame, [])
    with pytest.raises(ValueError, match="duplicate"):
        apply_expectations(
            frame, [("a", "v > 0", "drop"), ("a", "v < 9", "drop")]
        )
    with pytest.raises(ValueError, match="invalid action"):
        apply_expectations(frame, [("a", "v > 0", "reject")])
    with pytest.raises(ValueError, match="clobber"):
        apply_expectations(
            frame.withColumn("violated", F.lit("x")),
            [("a", "v > 0", "drop")],
        )


def test_no_stats_job_unless_needed(spark, frame):
    # warn/drop-only rule sets stay lazy: stats comes back None and no
    # count job was forced
    _v, _q, stats = apply_expectations(frame, RULES, collect_stats=None)
    assert stats is None


def test_streaming_twin_matches_batch(spark, tmp_path):
    """expectations_stream imports the SAME annotator as the batch gate —
    this pins the parity end-to-end through a real micro-batch run."""
    from ssidentity_spark.operators.expectations import annotate_expectations
    from ssidentity_spark.streaming.corpus import expectations_stream

    rules = [(n, e, a) for n, e, a in RULES]
    src = str(tmp_path / "src")
    batch = spark.createDataFrame(
        [(1, 10, "en"), (2, 3, "en"), (3, 10, "xx"), (5, 200, "en")],
        "id long, v long, lang string",
    )
    batch.write.parquet(src)
    stream = spark.readStream.schema("id long, v long, lang string").parquet(
        src
    )
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        expectations_stream(stream, rules)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["id"], r["violated"], r["warned"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["id"], r["violated"], r["warned"])
        for r in annotate_expectations(batch, rules).collect()
    )
    assert got == want and len(got) == 4


def test_streaming_twin_rejects_fail_rules(spark):
    from ssidentity_spark.streaming.corpus import expectations_stream

    stream_like = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="foreachBatch"):
        expectations_stream(stream_like, [("r", "id > 0", "fail")])
