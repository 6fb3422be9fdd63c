"""Dependency-free Apache Avro Object Container File codec + a distributed
Spark reader.

Why: the engine's source surface (SURVEY §2 S-rows) reads parquet and raw
binary; Avro is the other ubiquitous row-oriented interchange format a
100 TB intake pipeline meets (Kafka dumps, sqoop exports). The sandbox has
no avro library, so — like the PNG/JPEG/GIF/FLAC codecs — the binary
format (public Apache Avro 1.11 spec) is implemented from scratch:
zigzag-varint primitives, records, nullable unions, and the container
framing (magic, metadata map, sync-marker-delimited blocks, null/deflate
codecs; deflate is raw DEFLATE, stdlib zlib wbits=-15).

The writer is the independent twin for tests and for the hash-gated
``src_avro_roundtrip`` query: parquet rows → Avro container (deflate) →
distributed decode → per-row md5 projection, compared against DuckDB
reading the untouched parquet — a cross-FORMAT oracle; one wrong varint
or union branch breaks the hash.

Scale shape of ``read_avro``: one task per file via ``binaryFile`` (the
parallelism unit — large datasets ship as many container files); block
decode streams inside ``mapInPandas`` (Arrow-batched output, nothing
driver-side). Splitting a single multi-GB file at sync markers is the
natural extension and is what the sync markers exist for; per-file tasks
are the right grain for the fixture sizes here.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------


def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def long(self) -> int:
        u = 0
        shift = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated bytes")
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def string(self) -> str:
        return self.raw(self.long()).decode("utf-8")

    def double(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def boolean(self) -> bool:
        return self.raw(1) != b"\x00"


def _encode_value(value, typ) -> bytes:
    if isinstance(typ, list):  # union — branch index, then value
        if value is None:
            idx = typ.index("null")
            return _zz_encode(idx)
        idx = next(i for i, t in enumerate(typ) if t != "null")
        return _zz_encode(idx) + _encode_value(value, typ[idx])
    if typ in ("long", "int"):
        return _zz_encode(int(value))
    if typ == "string":
        b = value.encode("utf-8")
        return _zz_encode(len(b)) + b
    if typ == "bytes":
        return _zz_encode(len(value)) + bytes(value)
    if typ == "double":
        return struct.pack("<d", float(value))
    if typ == "boolean":
        return b"\x01" if value else b"\x00"
    if typ == "null":
        return b""
    raise NotImplementedError(f"avro type {typ}")


def _decode_value(r: _Reader, typ):
    if isinstance(typ, list):
        return _decode_value(r, typ[r.long()])
    if typ in ("long", "int"):
        return r.long()
    if typ == "string":
        return r.string()
    if typ == "bytes":
        return r.raw(r.long())
    if typ == "double":
        return r.double()
    if typ == "boolean":
        return r.boolean()
    if typ == "null":
        return None
    raise NotImplementedError(f"avro type {typ}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def _encode_map(meta: dict[str, bytes]) -> bytes:
    out = bytearray()
    if meta:
        out += _zz_encode(len(meta))
        for k, v in meta.items():
            kb = k.encode("utf-8")
            out += _zz_encode(len(kb)) + kb
            out += _zz_encode(len(v)) + v
    out += _zz_encode(0)
    return bytes(out)


def write_avro(
    rows: list[dict],
    schema: dict,
    sync: bytes,
    codec: str = "deflate",
    block_rows: int = 100,
) -> bytes:
    """Serialize ``rows`` (dicts keyed by field name) as one Avro Object
    Container File. ``sync`` is the 16-byte block delimiter (caller picks
    it deterministically — no RNG in the engine)."""
    assert len(sync) == 16
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    out = bytearray(_MAGIC)
    out += _encode_map(
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        }
    )
    out += sync
    for at in range(0, len(rows), block_rows):
        chunk = rows[at : at + block_rows]
        body = b"".join(
            b"".join(_encode_value(row[n], t) for n, t in fields)
            for row in chunk
        )
        if codec == "deflate":
            body = zlib.compress(body, 9)[2:-4]  # raw DEFLATE per the spec
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec}")
        out += _zz_encode(len(chunk)) + _zz_encode(len(body)) + body + sync
    return bytes(out)


def read_avro_bytes(payload: bytes) -> tuple[dict, list[dict]]:
    """Decode one container file → (schema, rows). Verifies magic, codec,
    and every block's sync marker."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    r = _Reader(payload, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # negative count: byte size follows (spec allows it)
            r.long()
            n = -n
        for _ in range(n):
            k = r.string()
            meta[k] = r.raw(r.long())
    schema = json.loads(meta[b"avro.schema".decode()].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec}")
    sync = r.raw(16)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    rows: list[dict] = []
    while r.pos < len(payload):
        count = r.long()
        size = r.long()
        body = r.raw(size)
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        br = _Reader(body)
        for _ in range(count):
            rows.append({n: _decode_value(br, t) for n, t in fields})
        if br.pos != len(body):
            raise ValueError("trailing bytes in avro block")
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, rows


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------


def read_avro(spark: SparkSession, path: str, spark_schema: str) -> DataFrame:
    """Read a directory of Avro container files as a DataFrame: one
    ``binaryFile`` row per file (the task grain), block decode inside
    mapInPandas. ``spark_schema`` is the DDL of the decoded rows — kept
    explicit so the scan has a stable schema without a driver-side
    schema-inference read."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _schema, rows = read_avro_bytes(bytes(content))
                if rows:
                    yield pd.DataFrame(rows)

    return files.select("content").mapInPandas(_decode, schema=spark_schema)
