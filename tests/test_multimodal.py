"""Multimodal binary plumbing: Arrow/mapInPandas feature extraction with the
deterministic fake decoder; real codec stubs must raise (they're gated)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ssidentity_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    fake_decode,
    frame_sample_stub,
    resize_stub,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(1, b"hello world"), (2, b"\x10\x20binary\x00blob"), (3, b"")]
    return spark.createDataFrame(rows, "doc_id LONG, payload BINARY").cache()


def test_codec_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_fake_decode_deterministic():
    assert fake_decode(b"hello") == (104, 101)
    assert fake_decode(b"") == (0, 0)
    assert fake_decode(b"\xff") == (255, 0)


def test_extract_features(payloads):
    rows = {r.doc_id: r for r in extract_features(payloads).collect()}
    assert rows[1].fake_width == ord("h") and rows[1].fake_height == ord("e")
    assert rows[1].n_bytes == 11
    assert rows[2].fake_width == 0x10 and rows[2].fake_height == 0x20
    assert rows[3].n_bytes == 0 and rows[3].fake_width == 0


def test_resize_roundtrip_schema(payloads):
    out = resize_stub(payloads)
    assert out.schema == payloads.schema
    assert out.count() == payloads.count()


def test_frame_sample_shape(payloads):
    rows = {r.doc_id: r for r in frame_sample_stub(payloads).collect()}
    assert rows[2].frame_bytes == 13
    assert all(r.frame_idx == 0 for r in rows.values())


def test_binary_column_survives_shuffle(payloads):
    """Binary payloads must round-trip a shuffle + join untouched."""
    meta = payloads.select("doc_id", F.md5(F.col("payload")).alias("h"))
    joined = payloads.repartition(4, "doc_id").join(meta, "doc_id")
    for r in joined.collect():
        import hashlib

        assert hashlib.md5(bytes(r.payload)).hexdigest() == r.h
