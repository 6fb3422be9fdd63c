"""Multimodal binary-column operators (BASELINE.json north star).

Real decode/resize/frame-sample requires codec libraries not present in this
container, so ``decode_image``/``decode_audio`` are stubs that raise
NotImplementedError; ``fake_decode`` is the deterministic stand-in used by
tests and the oracle-checked queries. The Spark-side plumbing — binary
schema, Arrow batching via mapInPandas, output StructType — is real and is
exactly what a production codec would plug into.

Scale: mapInPandas streams Arrow record batches per partition; payload bytes
never transit the driver, and batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch. Partition count follows the
input scan, so a 100 TB binary corpus processes with per-executor memory
bounded by (batch rows × max payload size).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum_mod", LongType()),
    ]
)


def decode_image(payload: bytes) -> Any:
    """Real image decode — requires a codec library absent from this
    container. Plug Pillow/libvips here in production."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes) -> Any:
    """Real audio decode — requires a codec library absent from this
    container. Plug soundfile/ffmpeg here in production."""
    raise NotImplementedError("audio codec not available in this environment")


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic decode stand-in: 'dimensions' from the first two bytes.

    Keeps the full Arrow/mapInPandas path testable without codecs.
    """
    w = payload[0] if len(payload) > 0 else 0
    h = payload[1] if len(payload) > 1 else 0
    return int(w), int(h)


def extract_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → typed feature rows via mapInPandas.

    Arrow-batched: each pandas batch holds a bounded slice of payloads; the
    loop below is where a real decoder (decode_image) would run.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, checks = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                w, h = fake_decode(b)
                widths.append(w)
                heights.append(h)
                sizes.append(len(b))
                checks.append(len(b) % 251)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fake_width": pd.Series(widths, dtype="int32"),
                    "fake_height": pd.Series(heights, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum_mod": pd.Series(checks, dtype="int64"),
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize pipeline shape: binary in → binary out. The transform itself is
    the identity (no codec); schema/partitioning/batching are the real
    contract."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf  # a real implementation re-encodes each payload

    return df.mapInPandas(_resize, schema=df.schema)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_pfx_hex", StringType()),
        StructField("n_frames", IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 32, stride: int = 4, pfx_bytes: int = 8
) -> DataFrame:
    """Video frame-sampling shape: one payload row in → N sampled-frame rows
    out (a flatMap, expressed through mapInPandas so the fan-out happens
    inside the Arrow batch, never on the driver).

    The payload is treated as a sequence of fixed-size ``frame_bytes``
    frames; every ``stride``-th frame is emitted with a hex prefix of its
    leading bytes (what a real pipeline would replace with a decoded
    thumbnail / phash). Trailing partial frames are dropped — the same
    convention a fixed-GOP video sampler uses. Output is scalar-typed so
    the fan-out is oracle-checkable byte-for-byte (``mm_frame_sample``)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            pfxs: list[str] = []
            totals: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, stride):
                    start = i * frame_bytes
                    ids.append(int(doc_id))
                    idxs.append(i)
                    pfxs.append(b[start : start + pfx_bytes].hex().upper())
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_pfx_hex": pd.Series(pfxs, dtype="object"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


__all__ = [
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "decode_image",
    "decode_audio",
    "fake_decode",
    "extract_features",
    "resize_stub",
    "sample_frames",
]
