"""operators/packing.pack_sequences: the packing invariants the boundary
map must satisfy (the driver-gate hash row pins Spark ≡ DuckDB; these pin
the semantics themselves on controlled corpora)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.packing import pack_sequences


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_every_sequence_full_except_each_buckets_last(spark):
    texts = [" ".join(f"w{j}" for j in range(3 + (i * 7) % 40)) for i in range(60)]
    out = pack_sequences(_docs(spark, texts), seq_len=32, n_buckets=4)
    fills = (
        out.groupBy("bucket", "seq_no")
        .agg(F.sum(F.col("doc_to") - F.col("doc_from")).alias("fill"))
        .collect()
    )
    last = {}
    for r in fills:
        last[r["bucket"]] = max(last.get(r["bucket"], -1), r["seq_no"])
    for r in fills:
        if r["seq_no"] < last[r["bucket"]]:
            assert r["fill"] == 32, f"non-tail sequence not full: {r}"
        else:
            assert 0 < r["fill"] <= 32


def test_token_conservation_and_span_contiguity(spark):
    texts = ["alpha beta gamma " * (1 + i % 9) for i in range(40)]
    docs = _docs(spark, texts)
    out = pack_sequences(docs, seq_len=16, n_buckets=2)
    # per-doc: spans tile [0, n_tokens) without gaps or overlaps
    rows = sorted(
        (r["doc_id"], r["doc_from"], r["doc_to"]) for r in out.collect()
    )
    by_doc = {}
    for doc_id, a, b in rows:
        assert a < b
        by_doc.setdefault(doc_id, []).append((a, b))
    n_tok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.regexp_count("text", F.lit(r"\w+|[^\w\s]")).alias("n")
        ).collect()
    }
    for doc_id, spans in by_doc.items():
        assert spans[0][0] == 0
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert b1 == a2  # contiguous
        assert spans[-1][1] == n_tok[doc_id]
    # every tokenized doc appears
    assert set(by_doc) == {i for i in range(40) if n_tok[i] > 0}


def test_seq_offset_matches_running_fill(spark):
    texts = ["one two three four five six seven"] * 12
    out = pack_sequences(_docs(spark, texts), seq_len=10, n_buckets=1)
    rows = sorted(
        ((r["seq_no"], r["seq_offset"]), (r["doc_from"], r["doc_to"]))
        for r in out.collect()
    )
    # within a sequence, each span starts exactly where the previous ended
    pos = {}
    for (seq_no, off), (a, b) in rows:
        assert pos.get(seq_no, 0) == off
        pos[seq_no] = off + (b - a)


def test_empty_docs_excluded_and_determinism(spark):
    texts = ["", "   ", "real content here", "more real content"]
    docs = _docs(spark, texts)
    out1 = sorted(map(tuple, pack_sequences(docs, 8, 2).collect()))
    out2 = sorted(map(tuple, pack_sequences(docs, 8, 2).collect()))
    assert out1 == out2
    assert {r[2] for r in out1} == {2, 3}  # zero-token docs never packed


def test_rejects_nonpositive_seq_len(spark):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_docs(spark, ["x"]), seq_len=0)


# --- global row ids (operators/rowids.py) ---------------------------------


def test_global_ids_contiguous_and_order_correct(spark):
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_global_ids

    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("m")
    )
    out = assign_global_ids(df, ["m", "k"], n_parts=13)
    rows = [(r["row_id"], r["m"], r["k"]) for r in out.collect()]
    assert sorted(r[0] for r in rows) == list(range(5_000))  # contiguous
    by_id = sorted(rows)
    assert by_id == sorted(rows, key=lambda r: (r[1], r[2]))  # order ≡ key order
    # helper columns dropped
    assert set(out.columns) == {"k", "m", "row_id"}


def test_global_ids_partition_count_invariant(spark):
    """With a unique order key the numbering is independent of how the
    bucket boundaries fall — different parallelism and both bucketing
    strategies (deterministic ordered buckets vs sampled ranges) agree."""
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_global_ids

    df = spark.range(0, 2_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("m")
    )
    a = {(r["k"], r["row_id"]) for r in assign_global_ids(df, ["m", "k"], n_parts=3).collect()}
    b = {(r["k"], r["row_id"]) for r in assign_global_ids(df, ["m", "k"], n_parts=29).collect()}
    c = {
        (r["k"], r["row_id"])
        for r in assign_global_ids(
            df, ["m", "k"], bucket=F.substring("m", 1, 1)
        ).collect()
    }
    assert a == b == c


def test_global_ids_plan_has_no_global_single_partition_sort(spark):
    """The data-sized windows are keyed on the partition id; the only
    SinglePartition exchange operates on #partitions rows (the offsets),
    never on the data."""
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_global_ids

    df = spark.range(0, 1_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("m")
    )
    out = assign_global_ids(df, ["m", "k"], n_parts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the offsets subplan aggregates BEFORE its single-partition window,
    # so every SinglePartition exchange consumes a HashAggregate output
    for frag in plan.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate" in frag.split("Exchange")[0] or "count" in frag[:400]


def test_global_ids_requires_order_cols(spark):
    import pytest

    from ssidentity_spark.operators.rowids import assign_global_ids

    with pytest.raises(ValueError, match="order_cols"):
        assign_global_ids(spark.range(3), [])


def test_pack_nosplit_invariants(spark):
    """No-split packing: no sequence overfilled, every doc lands whole
    exactly once, reruns are identical, oversize docs error or drop per
    policy, and NFD fill beats naive arrival-order next-fit."""
    import pyspark.sql.functions as F
    import pytest

    from ssidentity_spark.operators.packing import pack_nosplit

    L = 256
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("m"),
        ((F.col("id") * 131) % 200 + 1).alias("n_tokens"),
    )
    out = pack_nosplit(df, seq_len=L, n_buckets=4)
    rows = out.collect()
    assert len(rows) == 200  # whole docs, one row each
    fills: dict[tuple, int] = {}
    for r in rows:
        key = (r["bucket"], r["seq_no"])
        assert r["seq_offset"] == fills.get(key, 0)  # contiguous layout
        fills[key] = fills.get(key, 0) + r["n_tokens"]
    assert all(v <= L for v in fills.values())
    # deterministic rerun
    again = {(r["doc_id"], r["bucket"], r["seq_no"], r["seq_offset"])
             for r in pack_nosplit(df, seq_len=L, n_buckets=4).collect()}
    assert again == {(r["doc_id"], r["bucket"], r["seq_no"], r["seq_offset"])
                     for r in rows}
    # oversize policy
    big = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("m"),
        F.lit(L + 1).alias("n_tokens"),
    )
    assert pack_nosplit(big, seq_len=L, n_buckets=1, oversize="drop").count() == 0
    with pytest.raises(Exception, match="exceeds seq_len"):
        pack_nosplit(big, seq_len=L, n_buckets=1).collect()
    # the next-fit guarantee: consecutive bins sum > L (else the second
    # bin's first doc would have fitted the first), so per-bucket fill
    # exceeds ~50% apart from the final bin
    for b in range(4):
        bucket_fills = [v for (bk, _), v in sorted(fills.items()) if bk == b]
        for f1, f2 in zip(bucket_fills, bucket_fills[1:]):
            assert f1 + f2 > L, (b, f1, f2)
