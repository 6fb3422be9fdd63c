"""Content-defined chunking (plans/dedup.py:cdc_chunks): boundary
determinism and the property that justifies CDC over fixed blocks —
an insertion only disturbs its neighborhood; downstream chunks
re-synchronize and keep their hashes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.plans.dedup import _CDC_GRAM, cdc_chunks


def _doc(spark, doc_id: int, text: str):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def _chunks(spark, text: str) -> list[tuple[int, int, str]]:
    rows = cdc_chunks(_doc(spark, 1, text)).collect()
    return sorted((r["chunk_id"], r["n_words"], r["chunk_md5"]) for r in rows)


BASE = " ".join(f"w{i * 7 % 101}x{i % 13}" for i in range(240))


def test_chunks_cover_the_document_exactly(spark):
    got = _chunks(spark, BASE)
    assert sum(n for _c, n, _m in got) == 240
    assert [c for c, _n, _m in got] == list(range(len(got)))
    # the cut probability is 1/8 → expect roughly 240/8 chunks; wide band
    assert 8 <= len(got) <= 90


def test_deterministic_across_runs(spark):
    assert _chunks(spark, BASE) == _chunks(spark, BASE)


def test_insertion_resynchronizes(spark):
    """Insert one word mid-document: every chunk strictly after the
    edited chunk's gram neighborhood must keep its hash (fixed blocks
    would shift all of them)."""
    words = BASE.split()
    edited = " ".join(words[:120] + ["INSERTED"] + words[120:])
    base_hashes = [m for _c, _n, m in _chunks(spark, BASE)]
    edit_hashes = [m for _c, _n, m in _chunks(spark, edited)]
    # suffix re-sync: compare from the end — the tail chunks are identical
    tail = 0
    while (
        tail < min(len(base_hashes), len(edit_hashes))
        and base_hashes[-1 - tail] == edit_hashes[-1 - tail]
    ):
        tail += 1
    # prefix unchanged too (the edit is far from the start)
    head = 0
    while (
        head < min(len(base_hashes), len(edit_hashes))
        and base_hashes[head] == edit_hashes[head]
    ):
        head += 1
    disturbed_base = len(base_hashes) - head - tail
    assert head > 0 and tail > 0
    # the edit may split/merge a couple of chunks around the insertion
    # point (the gram window is 3 words) but never more
    assert disturbed_base <= 3, (head, tail, len(base_hashes))


def test_shared_boilerplate_collides_across_docs(spark):
    """Two docs sharing a long middle section (at different offsets!)
    share the middle chunks — the dedup signal fixed blocks lose."""
    mid = " ".join(f"b{i * 11 % 97}y{i % 7}" for i in range(160))
    a = "alpha beta gamma " + mid + " delta"
    b = "one two three four five six seven " + mid + " eight nine"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    ch = cdc_chunks(docs).collect()
    h1 = {r["chunk_md5"] for r in ch if r["doc_id"] == 1}
    h2 = {r["chunk_md5"] for r in ch if r["doc_id"] == 2}
    shared = h1 & h2
    # most interior chunks of the 160-word shared span collide despite
    # the different prefixes (offsets differ by 4 words)
    assert len(shared) >= max(3, len(h1) // 3), (len(shared), len(h1), len(h2))


def test_short_docs_are_one_chunk(spark):
    got = _chunks(spark, "only two")
    assert len(got) == 1 and got[0][1] == 2
    assert _CDC_GRAM == 3  # boundary rule needs a full gram


def test_streaming_twin_matches_batch(spark, tmp_path):
    """cdc_chunks_stream explodes the SAME chunk-struct expression the
    batch query uses — parity pinned through a real micro-batch run."""
    from ssidentity_spark.plans.dedup import cdc_chunks
    from ssidentity_spark.streaming.corpus import cdc_chunks_stream

    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [(1, BASE), (2, "short doc here"), (3, BASE + " trailing words")],
        "doc_id long, text string",
    )
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "out")
    q = (
        cdc_chunks_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_words"], r["chunk_md5"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["doc_id"], r["chunk_id"], r["n_words"], r["chunk_md5"])
        for r in cdc_chunks(docs).collect()
    )
    assert got == want and len(got) > 10


def test_empty_and_whitespace_docs_yield_no_chunks(spark):
    """sequence(0, 0) builds one element even for empty bpos — the
    zero-word guard must suppress the phantom md5('') chunk the oracle
    (and the pre-rewrite window form) never emit (r9 review)."""
    from ssidentity_spark.plans.dedup import cdc_chunks

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one real doc here")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs).collect()
    assert {r["doc_id"] for r in rows} == {3}
