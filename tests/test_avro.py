"""operators/avro: container codec semantics + the distributed reader."""

from __future__ import annotations

import pytest

from ssidentity_spark.operators.avro import (
    read_avro,
    read_avro_bytes,
    write_avro,
)

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
    ],
}
_SYNC = bytes(range(16))


def _rows(n):
    return [
        {
            "id": (-1) ** i * i * 1_000_003,  # exercises negative zigzag
            "name": f"nom-é-{i}",  # multi-byte utf-8
            "score": i / 7.0,
            "ok": i % 2 == 0,
            "note": None if i % 3 == 0 else f"n{i}",
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_both_codecs_multi_block(codec):
    rows = _rows(257)  # 3 blocks at block_rows=100
    blob = write_avro(rows, _SCHEMA, _SYNC, codec=codec)
    schema, out = read_avro_bytes(blob)
    assert out == rows
    assert schema["name"] == "r"


def test_deflate_actually_deflates():
    rows = [{"id": 1, "name": "a" * 50, "score": 0.0, "ok": True, "note": None}] * 200
    raw = write_avro(rows, _SCHEMA, _SYNC, codec="null")
    comp = write_avro(rows, _SCHEMA, _SYNC, codec="deflate")
    assert len(comp) < len(raw) / 5


def test_sync_marker_corruption_detected():
    blob = bytearray(write_avro(_rows(10), _SCHEMA, _SYNC))
    blob[-1] ^= 0xFF  # trailing sync byte
    with pytest.raises(ValueError, match="sync"):
        read_avro_bytes(bytes(blob))


def test_rejects_non_avro():
    with pytest.raises(ValueError):
        read_avro_bytes(b"PAR1not-avro")


def test_distributed_reader_matches_writer(spark, tmp_path):
    rows = _rows(101)
    for shard in range(3):
        blob = write_avro(rows[shard::3], _SCHEMA, _SYNC, codec="deflate")
        (tmp_path / f"p{shard}.avro").write_bytes(blob)
    df = read_avro(
        spark,
        str(tmp_path),
        "id long, name string, score double, ok boolean, note string",
    )
    got = sorted(
        (r["id"], r["name"], r["score"], r["ok"], r["note"])
        for r in df.collect()
    )
    want = sorted(
        (r["id"], r["name"], r["score"], r["ok"], r["note"]) for r in rows
    )
    assert got == want
